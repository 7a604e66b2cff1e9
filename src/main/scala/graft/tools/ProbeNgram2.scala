package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch probe (round 6): A/B the ngram SSJoin index build — the current
  * agg+join form re-runs tokenize/shingle/hash per consumer (dfc side +
  * join side); the window form computes df with one pass over one
  * tokenization. Also A/B the checkpoint partitioning. */
object ProbeNgram2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val threshold = 0.5
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
    val grams = docs
      .withColumn("__toks", graft.ops.TextAnalysis.tokens(col("text")))
      .select(col("doc_id").as("id"), explode(
        transform(graft.ops.Dedup.shinglesFromTokens(col("__toks")), s => xxhash64(s))).as("g"))

    def finish(annotated: org.apache.spark.sql.DataFrame) = annotated
      .groupBy($"id")
      .agg(sort_array(collect_list(struct($"df", $"g"))).as("ordered"))
      .withColumn("sh", array_sort(transform($"ordered", o => o("g"))))
      .withColumn("sz", size($"sh"))
      .withColumn("prefix", transform(
        slice($"ordered", lit(1), (floor($"sz" * (1 - threshold)) + 1).cast("int")),
        o => o("g")))
      .select($"id", $"sh", $"sz", $"prefix")

    (1 to 3).foreach { i =>
      // A: current form — dfc agg + join
      val dfc = grams.groupBy($"g").agg(count(lit(1)).as("df"))
      val a = finish(grams.join(dfc, Seq("g")))
      time(s"[$i] A agg+join checkpoint")(a.localCheckpoint(true))

      // B: window df — one tokenize pass
      val b = finish(grams.withColumn("df", count(lit(1)).over(Window.partitionBy($"g"))))
      time(s"[$i] B window checkpoint")(b.localCheckpoint(true))

      // sanity: identical index
      if (i == 1) {
        val ka = a.select($"id", $"sh", $"sz", $"prefix")
        val kb = b.select($"id", $"sh", $"sz", $"prefix")
        println(s"[probe] diff=${ka.exceptAll(kb).count() + kb.exceptAll(ka).count()}")
      }
    }
    spark.stop()
  }
}
