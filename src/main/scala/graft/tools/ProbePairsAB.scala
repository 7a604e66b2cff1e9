package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch probe (round 6): alternating in-JVM A/B of the candidate
  * pairing core — (A) round-5 shape: cnt whole-partition window, star as
  * rep-join, one cluster star per sk key; (B) round-6 shape: tail count on
  * the ordered window, star as projection, fused cluster star. Same
  * banded input; prints pair counts (must match) and Window-node counts of
  * the index subplan. */
object ProbePairsAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 1
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
    val numHashes = 64; val bands = 16; val rowsPerBand = numHashes / bands
    val maxBucket = 64; val salts = 16

    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def rotated(r: Int) = alpha.drop(r % 26) + alpha.take(r % 26)
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id".cast("long").as("doc_id"), lower($"text").as("text"))
    val docsK = (0 until k).map { r =>
      base.select(($"doc_id" + lit(r.toLong * 1000000000L)).as("doc_id"),
        translate($"text", alpha, rotated(r)).as("text"))
    }.reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()

    def bandedDf() = docsK
      .withColumn("__toks", graft.ops.TextAnalysis.tokens(col("text")))
      .select(col("doc_id").as("id"),
        graft.ops.Dedup.shinglesFromTokens(col("__toks")).as("sh"))
      .withColumn("hs", transform($"sh", s => xxhash64(s)))
      .withColumn("sig", graft.ops.Dedup.minhashSignatureFromHashes($"hs", numHashes))
      .select($"id", element_at($"sig", 1).as("sk"),
        element_at($"sig", numHashes).as("sk2"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice($"sig", b * rowsPerBand + lit(1), lit(rowsPerBand))))))
      .select($"id", $"sk", $"sk2", concat($"pos", lit(":"), $"col").as("bucket"))
      .select($"bucket", $"id", $"sk", $"sk2")

    // ---- variant A: round-5 shape ----------------------------------------
    def variantA(): DataFrame = {
      val bd = bandedDf()
      val skNames = Seq("sk", "sk2")
      val skCols = skNames.map(col)
      val salted = bd.select($"bucket" +: $"id" +: skCols: _*)
        .withColumn("salt", pmod(xxhash64($"id"), lit(salts)))
      val w = Window.partitionBy($"bucket", $"salt")
      val rankOrder = skCols :+ $"id"
      val ranked = salted
        .withColumn("rk", row_number().over(w.orderBy(rankOrder: _*)))
        .withColumn("cnt", count(lit(1)).over(w))
        .localCheckpoint()
      println(s"[probe] A index Window nodes: " +
        "Window".r.findAllIn(ranked.queryExecution.executedPlan.toString).size)
      def offsetPairs(df: DataFrame): DataFrame = {
        val lim = least(lit(maxBucket.toLong), $"cnt" - $"rk").cast("int")
        val l = df.select($"bucket", $"salt", $"id".as("id_a"), $"rk",
            explode(when(lim >= 1, sequence(lit(1), lim))
              .otherwise(array().cast("array<int>"))).as("d"))
          .select($"bucket", $"salt", $"id_a", ($"rk" + $"d").as("rk"))
        val r = df.select($"bucket", $"salt", $"id".as("id_b"), $"rk")
        l.join(r, Seq("bucket", "salt", "rk")).select($"id_a", $"id_b")
      }
      val withinSalt = offsetPairs(ranked)
      val reps = ranked.filter($"rk" === 1)
      val star = ranked.filter($"rk" > 1).select($"bucket", $"salt", $"id".as("id_b"))
        .join(reps.select($"bucket", $"salt", $"id".as("id_a")), Seq("bucket", "salt"))
        .select($"id_a", $"id_b")
      val wb = Window.partitionBy($"bucket")
      val repsRanked = reps.select($"bucket" +: lit(0L).as("salt") +: $"id" +: skCols: _*)
        .withColumn("rk", row_number().over(wb.orderBy(rankOrder: _*)))
        .withColumn("cnt", count(lit(1)).over(wb))
      val acrossSalts = offsetPairs(repsRanked)
      val clusterStars = skNames.map { k =>
        val clusterReps = ranked.groupBy($"bucket", col(k))
          .agg(min($"id").as("id_a"), count(lit(1)).as("n"))
          .filter($"n" >= 2)
          .select($"bucket", col(k), $"id_a")
        ranked.select($"bucket", col(k), $"id".as("id_b"))
          .join(clusterReps, Seq("bucket", k))
          .filter($"id_a" =!= $"id_b")
          .select($"id_a", $"id_b")
      }
      clusterStars.foldLeft(withinSalt.unionByName(star).unionByName(acrossSalts))(_ unionByName _)
        .select(least($"id_a", $"id_b").as("id_a"),
          greatest($"id_a", $"id_b").as("id_b"))
        .dropDuplicates("id_a", "id_b")
    }

    // ---- variant B: current code -----------------------------------------
    def variantB(): DataFrame =
      graft.ops.Dedup.chainedBucketPairs(bandedDf(), maxBucket, salts)

    (1 to 4).foreach { i =>
      val ta = time(s"[$i] A full pairs")(variantA().count())
      val tb = time(s"[$i] B full pairs")(variantB().count())
      println(s"[probe] [$i] counts A=$ta B=$tb")
    }
    spark.stop()
  }
}
