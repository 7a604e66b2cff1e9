package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.extract.Extraction

/** Incremental ingestion: new doc-table files → the SAME extraction plan →
  * append-only triple store, exactly-once per input file.
  *
  * The reference is pure batch (SURVEY.md §2.10) — its incrementality is
  * stage files on disk. This is the Spark-native upgrade: a Structured
  * Streaming file source with `Trigger.AvailableNow` drains whatever
  * arrived since the last run and stops; the stream checkpoint (file-source
  * log) is what makes re-runs incremental, complementing the batch
  * pipeline's snapshot checkpoints. Per-doc extraction is stateless, so no
  * watermark/state is needed — `foreachBatch` reuses the batch extraction
  * verbatim (one plan, two execution modes).
  */
object StreamingIngest {

  /** Drain new files under `docsDir` (parquet doc-table shape) into
    * `outDir` as appended triples. Returns the number of micro-batches
    * processed. `checkpointDir` carries the file-source log; each batch
    * writes to its OWN `batch=<id>` subdirectory with mode overwrite, so a
    * replay after a crash between write and checkpoint commit overwrites
    * the same directory instead of double-appending — idempotent retries
    * make the sink end-to-end exactly-once (a bare `append` into one
    * directory would be at-least-once). Readers see `batch` as a discovered
    * partition column — per-batch lineage for free. */
  def drainAvailable(spark: SparkSession, docsDir: String, outDir: String,
                     checkpointDir: String): Long = {
    val docs = spark.readStream
      .schema(graft.model.Doc.schema)
      .parquet(docsDir)

    var batches = 0L
    val q = docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Extraction.triples(batch).toDF()
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        batches += 1
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }

  /** Dedup-on-ingest: drain new docs, dropping exact duplicates by text
    * digest with WATERMARKED streaming state — the streaming face of
    * `Dedup.dropExactDuplicates` for a 100 TB firehose where batch dedup
    * against the full corpus per increment is impossible. State holds one
    * digest per distinct doc inside the `watermark` horizon and is evicted
    * beyond it (`dropDuplicatesWithinWatermark`), so state size is bounded
    * by arrival rate × horizon, not corpus size; duplicates farther apart
    * than the horizon are left to the batch `dedup_exact` sweep — the
    * standard streaming/batch split for dedup. Docs need an event-time
    * column (`ingest_ts`). The sink writes per-batch `batch=<id>`
    * directories with mode overwrite (idempotent on replay), so together
    * with the stream checkpoint the drain is end-to-end exactly-once per
    * input file — see [[drainAvailable]]. */
  def drainDeduped(spark: SparkSession, docsDir: String, outDir: String,
                   checkpointDir: String, watermark: String = "1 hour"): Long = {
    import org.apache.spark.sql.functions._
    val docs = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(
        graft.model.Doc.schema.fields :+
          org.apache.spark.sql.types.StructField("ingest_ts",
            org.apache.spark.sql.types.TimestampType)))
      .parquet(docsDir)

    val deduped = docs
      .withColumn("digest", md5(to_json(col("spans"))))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("digest")

    var batches = 0L
    val q = deduped.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.drop("digest", "ingest_ts")
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        batches += 1
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }
}
