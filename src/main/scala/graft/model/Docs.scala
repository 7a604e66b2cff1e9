package graft.model

import org.apache.spark.sql.types._

/** One extracted value span inside a document.
  *
  * This is the driver-specified input shape (BASELINE.json `input_hint`):
  * `doc_id: string, spans: array<struct<kind,text,media_ref,offset>>`.
  *
  * Mapping from the reference's model: one CSV row = one document
  * (reference: src/csv_to_rdf.py:362 `prisoner_<nro>`), each mapped cell
  * value = one span where `kind` is the source column key, `text` the raw
  * (multi-value-split, stripped) cell value, `media_ref` the URL for media
  * link columns, and `offset` the multi-value index the reference derives
  * by enumeration (src/csv_to_rdf.py:219).
  *
  * Per-row invariant (north rule): span-sequence equality
  * `(kind, text, media_ref, offset)` is preserved end-to-end — ordinal
  * position is load-bearing in output identity (order = offset*10,
  * reification ids keep offset; src/csv_to_rdf.py:259,265,273-276).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class Doc(doc_id: String, spans: Seq[Span])

object Doc {
  val spanType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = true),
    StructField("offset", IntegerType, nullable = false),
  ))
  val schema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("spans", ArrayType(spanType, containsNull = false), nullable = false),
  ))
}
