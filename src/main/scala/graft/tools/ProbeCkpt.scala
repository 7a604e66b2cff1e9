package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch probe (round 6): what does the ranked-index materialization
  * itself cost — window compute (noop) vs localCheckpoint vs
  * persist+count — on the minhash banded frame at sf0.1? */
object ProbeCkpt {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val numHashes = 64; val bands = 16; val rowsPerBand = numHashes / bands
    def ranked() = {
      val banded = spark.read.parquet(s"$sfDir/documents.parquet")
        .repartition(32)
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
      val salted = banded.select($"bucket", $"id", $"sk", $"sk2")
        .withColumn("salt", pmod(xxhash64($"id"), lit(16)))
      val wOrd = Window.partitionBy($"bucket", $"salt").orderBy($"sk", $"sk2", $"id")
      salted
        .withColumn("rk", row_number().over(wOrd))
        .withColumn("rep", first($"id").over(wOrd))
        .withColumn("tail",
          count(lit(1)).over(wOrd.rowsBetween(1, Window.unboundedFollowing)))
    }
    (1 to 3).foreach { i =>
      time(s"[$i] window noop")(
        ranked().write.format("noop").mode("overwrite").save())
      val c = time(s"[$i] localCheckpoint")(ranked().localCheckpoint())
      println(s"[probe]   ckpt parts=${c.rdd.getNumPartitions}")
      val p = time(s"[$i] persist+count") {
        val d = ranked().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d.count(); d
      }
      time(s"[$i] read ckpt (count)")(c.count())
      time(s"[$i] read persisted (count)")(p.count())
      p.unpersist()
    }
    spark.stop()
  }
}
