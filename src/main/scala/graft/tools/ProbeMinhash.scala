package graft.tools

import graft.ops._

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
    // sk variants: banding that also carries sig[0], and pairing with the
    // cluster star enabled
    val bandedSk = sh
      .withColumn("hs", transform($"sh", s => xxhash64(s)))
      .withColumn("sig", Dedup.minhashSignatureFromHashes($"hs", numHashes))
      .select($"id", element_at($"sig", 1).as("sk"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice($"sig", b * rowsPerBand + lit(1), lit(rowsPerBand))))))
      .select($"id", $"sk", concat($"pos", lit(":"), $"col").as("bucket"))
    time("banded_sk")(bandedSk.count())
    // branch-by-branch replication of chainedBucketPairs with sk
    locally {
      import org.apache.spark.sql.expressions.Window
      val salted = bandedSk.select($"bucket", $"id", $"sk")
        .withColumn("salt", pmod(xxhash64($"id"), lit(16)))
      val w = Window.partitionBy($"bucket", $"salt")
      val ranked = salted
        .withColumn("rk", row_number().over(w.orderBy($"sk", $"id")))
        .withColumn("cnt", count(lit(1)).over(w))
        .localCheckpoint()
      time("ranked_ckpt")(ranked.count())
      def offsetPairs(df: org.apache.spark.sql.DataFrame) = {
        val lim = least(lit(64L), $"cnt" - $"rk").cast("int")
        val l = df.select($"bucket", $"salt", $"id".as("id_a"), $"rk",
            explode(when(lim >= 1, sequence(lit(1), lim))
              .otherwise(array().cast("array<int>"))).as("d"))
          .select($"bucket", $"salt", $"id_a", ($"rk" + $"d").as("rk"))
        val r = df.select($"bucket", $"salt", $"id".as("id_b"), $"rk")
        l.join(r, Seq("bucket", "salt", "rk")).select($"id_a", $"id_b")
      }
      time("withinSalt")(offsetPairs(ranked).count())
      val reps = ranked.filter($"rk" === 1)
      time("star")(ranked.filter($"rk" > 1).select($"bucket", $"salt", $"id".as("id_b"))
        .join(reps.select($"bucket", $"salt", $"id".as("id_a")), Seq("bucket", "salt"))
        .count())
      val wb = Window.partitionBy($"bucket")
      val repsRanked = reps.select($"bucket", lit(0L).as("salt"), $"id", $"sk")
        .withColumn("rk", row_number().over(wb.orderBy($"sk", $"id")))
        .withColumn("cnt", count(lit(1)).over(wb))
      time("acrossSalts")(offsetPairs(repsRanked).count())
      val clusterReps = salted.groupBy($"bucket", $"sk")
        .agg(min($"id").as("id_a"), count(lit(1)).as("n"))
        .filter($"n" >= 2)
        .select($"bucket", $"sk", $"id_a")
      val cs = salted.select($"bucket", $"sk", $"id".as("id_b"))
        .join(clusterReps, Seq("bucket", "sk"))
        .filter($"id_a" =!= $"id_b")
      println("[probe] clusterReps rows=" + clusterReps.count())
      time("clusterStar")(cs.count())
      // same star built from the CHECKPOINTED ranked frame
      val clusterReps2 = ranked.groupBy($"bucket", $"sk")
        .agg(min($"id").as("id_a"), count(lit(1)).as("n"))
        .filter($"n" >= 2)
        .select($"bucket", $"sk", $"id_a")
      val cs2 = ranked.select($"bucket", $"sk", $"id".as("id_b"))
        .join(clusterReps2, Seq("bucket", "sk"))
        .filter($"id_a" =!= $"id_b")
      time("clusterStar_ckpt")(cs2.count())
    }
    val pairsSk = Dedup.chainedBucketPairs(bandedSk.select($"bucket", $"id", $"sk"), 64, 16)
    time("pairs_sk")(pairsSk.count())
    val verified = pairsSk
      .join(sh.select($"id".as("id_a"), $"sh".as("sh_a")), Seq("id_a"))
      .join(sh.select($"id".as("id_b"), $"sh".as("sh_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect($"sh_a", $"sh_b")))
      .withColumn("jaccard", $"inter" / (size($"sh_a") + size($"sh_b") - $"inter"))
      .filter($"jaccard" >= 0.5)
    time("verified_sk")(verified.count())
    time("full")(Dedup.minhashNearDuplicates(docs, "doc_id", "text", threshold = 0.5).count())
    time("full_warm")(Dedup.minhashNearDuplicates(docs, "doc_id", "text", threshold = 0.5).count())
    spark.stop()
  }
}
