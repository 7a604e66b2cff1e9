package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 6): where does a streaming gate row's time go —
  * stream construction, the AvailableNow drain itself, or the batch
  * read-back+sort? */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 3).foreach { i =>
      val tmp = java.nio.file.Files.createTempDirectory("probe_stream")
      val srcDir = java.nio.file.Files.createDirectory(tmp.resolve("src"))
      java.nio.file.Files.createSymbolicLink(srcDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$sfDir/events.parquet").toAbsolutePath)
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val wc = time(s"[$i] construct") {
        val stream = spark.readStream.schema(schema).parquet(srcDir.toString)
        graft.streaming.EventStreams.windowedCounts(
          stream.withColumn("ts", $"ts".cast("timestamp")),
          watermark = "10 minutes", windowLen = "1 hour")
          .select($"win_start", $"event_type", $"n")
      }
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        time(s"[$i] drain (start..awaitTermination)") {
          wc.writeStream.format("parquet")
            .option("path", tmp.resolve("out").toString)
            .option("checkpointLocation", tmp.resolve("ckpt").toString)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
            .awaitTermination()
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      time(s"[$i] read-back + sort + count") {
        spark.read.parquet(tmp.resolve("out").toString)
          .select(date_format($"win_start", "yyyy-MM-dd HH").as("h"),
            $"event_type", $"n")
          .orderBy($"h", $"event_type")
          .queryExecution.toRdd.count()
      }
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    }
    spark.stop()
  }
}
