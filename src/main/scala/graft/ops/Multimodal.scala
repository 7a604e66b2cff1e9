package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decode/feature-extract as batched
  * per-partition transforms.
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): `decodeStub` produces a deterministic fake decode from the
  * bytes. Everything around it — the schema, the partition-batched
  * execution shape (one buffer reuse per batch, the Scala analogue of a
  * pandas-UDF `mapInPandas` loop), the feature-vector output contract — is
  * real and tested, so a real decoder drops in by replacing ONE function.
  */
object Multimodal {

  /** Typed media row: payload + metadata; `media_type` ∈ image|audio|video. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte],
                            width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Int, checksum: Long,
                                 features: Array[Float])

  /** Build a media table from the documents table: payload = UTF-8 bytes
    * of the text (a deterministic stand-in for real blobs), metadata
    * derived from doc_id. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        pmod(col("doc_id"), lit(3)).cast("int") + 1).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(16)).cast("int") * 64 + 256).as("width"),
      (pmod(col("doc_id"), lit(9)).cast("int") * 64 + 256).as("height"),
      when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(0).as("sample_rate"))

  /** Media references from the interleaved doc table (the input_hint span
    * shape): one row per span whose `media_ref` is set, ordinal preserved.
    * This is the bridge from the KG input (`spans[].media_ref`, e.g. the
    * propaganda-magazine links the reference ingests as URL cells,
    * mapping.py photograph/magazine columns) into the media pipeline:
    * join the result against a blob table on `media_ref` and feed
    * [[extractFeatures]]. Pure explode+filter — narrow, no shuffle. */
  def mediaRefs(docTable: DataFrame): DataFrame =
    docTable
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("span_seq", "span")))
      .filter(col("span.media_ref").isNotNull)
      .select(col("doc_id"), col("span.kind").as("kind"),
        col("span.media_ref").as("media_ref"),
        col("span.offset").as("offset"), col("span_seq"))

  /** ??? -> deterministic fake decode: a real implementation would hand
    * `payload` to an image/audio codec here. The fake derives an 8-dim
    * feature vector from byte statistics so downstream similarity tests
    * have real numbers to chew on. */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      acc(i % 8) += (payload(i) & 0xFF)
      i += 1
    }
    acc.map(v => (v % 1000) / 1000.0f)
  }

  /** Batched feature extraction: mapPartitions so a real decoder can
    * amortize model/codec initialization once per partition (the batch
    * shape a pandas UDF would get). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition init happens HERE in a real decoder
        batch.map { case (id, mt, payload) =>
          var checksum = 1125899906842597L
          var i = 0
          while (i < payload.length) { checksum = 31 * checksum + payload(i); i += 1 }
          MediaFeatures(id, mt, payload.length, checksum, decodeStub(payload))
        }
      }
  }

  /** Frame sampling for video rows: emit `n` evenly spaced frame offsets
    * (the Spark-side plumbing of a frame sampler; offsets are byte
    * positions in the stub). */
  def sampleFrames(media: DataFrame, n: Int = 4): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(n - 1)),
          i => (i * length(col("payload")) / n).cast("long"))).as("frame_offset"))
}
