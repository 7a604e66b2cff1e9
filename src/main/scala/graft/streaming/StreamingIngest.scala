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
    * processed. `checkpointDir` carries the exactly-once file log. */
  def drainAvailable(spark: SparkSession, docsDir: String, outDir: String,
                     checkpointDir: String): Long = {
    val docs = spark.readStream
      .schema(graft.model.Doc.schema)
      .parquet(docsDir)

    var batches = 0L
    val q = docs.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Extraction.triples(batch).toDF()
          .write.mode("append").parquet(outDir)
        batches += 1
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }
}
