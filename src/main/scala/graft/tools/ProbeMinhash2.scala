package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 6): phase split of the CURRENT dedup_minhash_lsh
  * gate query — ranked-index checkpoint (signature+banding) vs pairing
  * branches vs verification vs plantedGroups. */
object ProbeMinhash2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
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
    val planted = Seq(
      (9000000010L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (9000000011L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (9000000012L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (9000000020L, "uno duo tres quattuor quinque sex septem octo novem decem undecim"),
      (9000000021L, "uno duo tres quattuor quinque sex septem octo novem decem undecim"),
      (9000000030L, "rubrum aurantium flavum viride caeruleum indicum violaceum roseum"),
      (9000000031L, "lunae martis mercurii iovis veneris saturni solis mane meridie nox"),
      (9000000032L, "septentrio meridies oriens occidens sursum deorsum laevum dextrum"),
    ).toDF("doc_id", "text")
    val numHashes = 64; val bands = 16; val rowsPerBand = numHashes / bands

    (1 to 3).foreach { i =>
      val all = spark.read.parquet(s"$sfDir/documents.parquet")
        .repartition(32).select($"doc_id", $"text").unionByName(planted)
      val sh = all
        .withColumn("__toks", graft.ops.TextAnalysis.tokens(col("text")))
        .select(col("doc_id").as("id"),
          graft.ops.Dedup.shinglesFromTokens(col("__toks")).as("sh"))
      val banded = sh
        .withColumn("hs", transform($"sh", s => xxhash64(s)))
        .withColumn("sig", graft.ops.Dedup.minhashSignatureFromHashes($"hs", numHashes))
        .select($"id", element_at($"sig", 1).as("sk"),
          element_at($"sig", numHashes).as("sk2"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice($"sig", b * rowsPerBand + lit(1), lit(rowsPerBand))))))
        .select($"id", $"sk", $"sk2", concat($"pos", lit(":"), $"col").as("bucket"))
      time(s"[$i] banded noop")(banded.write.format("noop").mode("overwrite").save())
      val pairs = time(s"[$i] chainedBucketPairs construct (ranked ckpt)")(
        graft.ops.Dedup.chainedBucketPairs(
          banded.select($"bucket", $"id", $"sk", $"sk2"), 64, 16))
      time(s"[$i] pairs count (branches+dedup)")(
        println(s"  n=${pairs.count()}"))
      val full = time(s"[$i] full gate query") {
        val p = graft.ops.Dedup.minhashNearDuplicates(all, "doc_id", "text",
            threshold = 0.5)
          .filter($"id_a" >= 9000000000L && $"id_b" >= 9000000000L)
        val edges = p
          .select(explode(array(
            struct($"id_a", $"id_b"),
            struct($"id_b".as("id_a"), $"id_a".as("id_b")))).as("e"))
          .select($"e.id_a", $"e.id_b")
        edges.groupBy($"id_a")
          .agg(min($"id_b").as("mn"))
          .select($"id_a".cast("string").as("doc_id"),
            least($"id_a", $"mn").cast("string").as("canonical_id"))
          .orderBy($"doc_id")
          .queryExecution.toRdd.count()
      }
      println(s"[probe] [$i] full rows=$full")
    }
    spark.stop()
  }
}
