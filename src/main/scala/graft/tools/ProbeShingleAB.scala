package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 6): alternating in-JVM A/B of the shingle-hash
  * stage — string pipeline (shinglesFromTokens + xxhash64 transform) vs
  * the fused ShingleHash64Expression — on a k×-replicated corpus, noop
  * sink. Also checks the gram multisets agree. */
object ProbeShingleAB {
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
      .select($"doc_id".cast("long").as("doc_id"), lower($"text").as("text"))
    val docs = (0 until k).map { r =>
      base.select(($"doc_id" + lit(r.toLong * 1000000000L)).as("doc_id"),
        translate($"text", alpha, rotated(r)).as("text"))
    }.reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism).localCheckpoint()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val toks = graft.ops.TextAnalysis.tokens($"text")
    def oldHs = docs.withColumn("__t", toks)
      .select($"doc_id",
        transform(graft.ops.Dedup.shinglesFromTokens($"__t"), s => xxhash64(s)).as("hs"))
    def newHs = docs.withColumn("__t", toks)
      .select($"doc_id",
        graft.functions.ShingleHash64Expression.shingleHash64($"__t", 3).as("hs"))

    val d = oldHs.select($"doc_id", explode($"hs").as("g"))
      .exceptAll(newHs.select($"doc_id", explode($"hs").as("g"))).count()
    println(s"[probe] gram multiset diff = $d")

    // full minhash banding old vs new (signature + band explode)
    val numHashes = 64; val bands = 16; val rpb = numHashes / bands
    def bandedOf(hs: org.apache.spark.sql.DataFrame) = hs
      .withColumn("sig", graft.ops.Dedup.minhashSignatureFromHashes($"hs", numHashes))
      .select($"doc_id", element_at($"sig", 1).as("sk"),
        element_at($"sig", numHashes).as("sk2"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice($"sig", b * rpb + lit(1), lit(rpb))))))

    (1 to 4).foreach { i =>
      time(s"[$i] OLD hs pass")(noop(oldHs))
      time(s"[$i] NEW hs pass")(noop(newHs))
      time(s"[$i] OLD full banding")(noop(bandedOf(oldHs)))
      time(s"[$i] NEW full banding")(noop(bandedOf(newHs)))
    }
    spark.stop()
  }
}
