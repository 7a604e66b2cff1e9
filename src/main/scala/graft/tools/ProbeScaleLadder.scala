package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-ladder probe for the dedup family: replicate the sf0.1 document
  * corpus k× with DISJOINT vocabularies (per-replica alphabet rotation via
  * `translate`, ids offset per replica), so the corpus' near-duplicate
  * structure replicates exactly k× with no cross-replica pairs — then the
  * per-operator growth factor vs the corpus factor is directly readable
  * (linear-ish = the 100 TB story holds; superlinear = a hidden quadratic
  * term). Timed with the noop sink (guide §1.4) after one warm-up.
  *
  * `runMain graft.tools.ProbeScaleLadder <sfDir> [k1 k2 ...]` (default
  * ladder 1 2 5).
  */
object ProbeScaleLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ladder = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(1, 2, 5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rotated(r: Int) = alpha.drop(r % 26) + alpha.take(r % 26)

    def corpus(k: Int): DataFrame = {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select($"doc_id".cast("long").as("doc_id"), lower($"text").as("text"))
      (0 until k).map { r =>
        base.select(($"doc_id" + lit(r.toLong * 1000000000L)).as("doc_id"),
          translate($"text", alpha, rotated(r)).as("text"))
      }.reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    ladder.foreach { k =>
      val docs = corpus(k).localCheckpoint() // input materialized untimed
      val n = docs.count()
      def bench(label: String)(build: => DataFrame): Unit = {
        noop(build) // warm-up
        val ts = (1 to 2).map(_ => time(noop(build)))
        println(f"[ladder] k=$k docs=$n $label%-12s min=${ts.min}%.2f samples=" +
          ts.map(t => f"$t%.2f").mkString(","))
      }
      bench("ngram_pairs")(
        graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5))
      bench("minhash")(
        graft.ops.Dedup.minhashNearDuplicates(docs, "doc_id", "text", threshold = 0.5))
      bench("groups")(
        graft.ops.Dedup.nearDuplicateGroups(
          graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)))
      bench("simhash")(
        graft.ops.Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 3))
    }
    spark.stop()
  }
}
