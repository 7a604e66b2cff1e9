package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the minhash dedup path
  * (scan → shingles → signature → banding → capped pairing → verify).
  * Caught two Catalyst-collapse traps in round 3: an expression referenced
  * once INSIDE a lambda body gets inlined by CollapseProject and then
  * re-evaluated per lambda iteration — see minhashSignatureFromHashes. */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
    val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text")).as("sh"))
    time("shingles")(sh.count())
    val numHashes = 64; val bands = 16; val rowsPerBand = numHashes / bands
    val banded = sh
      .withColumn("hs", transform($"sh", s => xxhash64(s)))
      .withColumn("sig", Dedup.minhashSignatureFromHashes($"hs", numHashes))
      .select($"id", posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice($"sig", b * rowsPerBand + lit(1), lit(rowsPerBand))))))
      .select($"id", concat($"pos", lit(":"), $"col").as("bucket"))
    time("banded")(banded.count())
    val pairs = Dedup.chainedBucketPairs(banded.select($"bucket", $"id"), 64, 16)
    time("pairs")(pairs.count())
    time("full")(Dedup.minhashNearDuplicates(docs, "doc_id", "text", threshold = 0.5).count())
    time("full_warm")(Dedup.minhashNearDuplicates(docs, "doc_id", "text", threshold = 0.5).count())
    spark.stop()
  }
}
