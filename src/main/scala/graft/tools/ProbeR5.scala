package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-5 dev probe (not part of the library surface):
  *  1. planted-ANN-oracle safety: no real corpus vector may tie cosine 1.0
  *     against the one-hot planted axes;
  *  2. watermark boundary semantics: does append mode emit a window whose
  *     END equals the final watermark exactly? (decides the
  *     events_stream_tumbling oracle's <= vs <)
  *  3. smoke the two new planted ANN gate rows at sf0.01.
  */
object ProbeR5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("probe-r5")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- 1. cosine-1.0 tie check on both sf corpora ----------------------
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val nrm = sqrt(aggregate($"v", lit(0.0), (a, x) => a + x * x))
      val r = emb.select(
        max(abs(element_at($"v", 1)) / nrm).as("m0"),
        max(abs(element_at($"v", 2)) / nrm).as("m1"),
        count(when(abs(element_at($"v", 1)) / nrm >= 1.0, 1)).as("t0"),
        count(when(abs(element_at($"v", 2)) / nrm >= 1.0, 1)).as("t1")).head()
      println(s"[probe] $sf max|cos| vs e0=${r.getDouble(0)} e1=${r.getDouble(1)} " +
        s"ties0=${r.getLong(2)} ties1=${r.getLong(3)}")
    }

    // ---- 2. boundary window emission under AvailableNow ------------------
    // events at 00:00, 00:30, and max(ts)=01:10 → watermark 01:00 ==
    // window [00:00,01:00) end exactly. Emitted or not?
    val tmp = java.nio.file.Files.createTempDirectory("probe_wm")
    val src = tmp.resolve("src"); java.nio.file.Files.createDirectory(src)
    Seq(
      (java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "a", 1.0),
      (java.sql.Timestamp.valueOf("2026-01-01 00:30:00"), "a", 1.0),
      (java.sql.Timestamp.valueOf("2026-01-01 01:10:00"), "a", 1.0),
    ).toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(src.toString)
    val schema = spark.read.parquet(src.toString).schema
    val wc = graft.streaming.EventStreams.windowedCounts(
      spark.readStream.schema(schema).parquet(src.toString),
      watermark = "10 minutes", windowLen = "1 hour")
    val out = tmp.resolve("out").toString
    wc.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", tmp.resolve("ckpt").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    val emitted = spark.read.parquet(out)
      .select(date_format($"win_start", "yyyy-MM-dd HH:mm").as("w"), $"n")
      .collect().map(_.toString).sorted
    println(s"[probe] boundary emission (wm=01:00, window end 01:00): " +
      s"${emitted.mkString(" | ")} (empty => strict <)")

    // ---- 3. smoke the planted ANN gate rows at sf0.01 ---------------------
    for (q <- Seq("embed_cosine_lsh", "embed_cosine_ivf")) {
      val rows = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .collect().map(_.toString)
      println(s"[probe] $q -> ${rows.mkString(" ")}")
    }
    spark.stop()
  }
}
