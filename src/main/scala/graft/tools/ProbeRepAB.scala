package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 6): alternating in-JVM A/B of the repetition
  * signal — string-bigram sort + interpreted aggregate fold vs hashed
  * bigrams + MaxRunLengthExpression — on a k×-replicated corpus; asserts
  * identical (top_gram_count, n_grams) outputs. */
object ProbeRepAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 20
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
      .select($"doc_id".cast("long").as("doc_id"), $"text")
    val docs = (0 until k).map { r =>
      base.select(($"doc_id" + lit(r.toLong * 1000000000L)).as("doc_id"),
        translate($"text", alpha, rotated(r)).as("text"))
    }.reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism).localCheckpoint()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def oldRep = {
      val sorted = col("__rep_sorted")
      val n = size(sorted)
      val idxs = when(n > 1, sequence(lit(1), n - 1))
        .otherwise(array().cast("array<int>"))
      val top = aggregate(idxs,
        named_struct(lit("best"), lit(1), lit("cur"), lit(1)),
        (acc, i) => {
          val cur2 = when(element_at(sorted, i + 1) === element_at(sorted, i),
            acc.getField("cur") + 1).otherwise(lit(1))
          named_struct(lit("best"), greatest(acc.getField("best"), cur2),
            lit("cur"), cur2)
        },
        acc => acc.getField("best"))
      docs.withColumn("__rep_toks", graft.ops.TextAnalysis.tokens(lower($"text")))
        .withColumn("__rep_sorted", array_sort(graft.ops.TextAnalysis.bigrams(col("__rep_toks"))))
        .select($"doc_id", top.cast("long").as("top_gram_count"),
          n.cast("long").as("n_grams"))
    }
    def newRep = graft.ops.TextAnalysis.repetitionCounts(docs, "doc_id", "text")

    val d = oldRep.exceptAll(newRep).count() + newRep.exceptAll(oldRep).count()
    println(s"[probe] output diff rows = $d")
    (1 to 4).foreach { i =>
      time(s"[$i] OLD repetition")(noop(oldRep))
      time(s"[$i] NEW repetition")(noop(newRep))
    }
    spark.stop()
  }
}
