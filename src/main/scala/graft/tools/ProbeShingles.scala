package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 6): per-phase cost of the shingle pipeline at
  * k× corpus — tokens alone vs +shingle strings vs +hashes vs +distinct.
  * Attribution for whether a fused codegen shingle-hash expression is
  * worth building. */
object ProbeShingles {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rotated(r: Int) = alpha.drop(r % 26) + alpha.take(r % 26)
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("long").as("doc_id"), lower($"text").as("text"))
    val docs = (0 until k).map { r =>
      base.select(($"doc_id" + lit(r.toLong * 1000000000L)).as("doc_id"),
        translate($"text", alpha, rotated(r)).as("text"))
    }.reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism).localCheckpoint()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val toks = graft.ops.TextAnalysis.tokens($"text")
    (1 to 3).foreach { i =>
      time(s"[$i] tokens only")(
        noop(docs.select($"doc_id", toks.as("t"))))
      time(s"[$i] + raw 3-gram strings (no distinct)")(
        noop(docs.withColumn("__t", toks).select($"doc_id",
          transform(sequence(lit(0), greatest(size($"__t") - 3, lit(0))),
            j => concat_ws(" ", slice($"__t", j + 1, lit(3)))).as("sh"))))
      time(s"[$i] + distinct (= shinglesFromTokens)")(
        noop(docs.withColumn("__t", toks).select($"doc_id",
          graft.ops.Dedup.shinglesFromTokens($"__t").as("sh"))))
      time(s"[$i] + xxhash64 per shingle (= minhash hs / ngram grams input)")(
        noop(docs.withColumn("__t", toks)
          .withColumn("sh", graft.ops.Dedup.shinglesFromTokens($"__t"))
          .select($"doc_id", transform($"sh", s => xxhash64(s)).as("hs"))))
    }
    spark.stop()
  }
}
