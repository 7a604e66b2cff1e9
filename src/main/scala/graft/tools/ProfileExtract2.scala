package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.extract.{FieldSpecs, SpanProcessor, SpanResult}

object ProfileExtract2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    val docs = graft.extract.SynthDocs.fromDocuments(spark, sfDir).persist()
    docs.count()

    val withName = docs.withColumn("original_name",
      coalesce(element_at(filter($"spans", s => s("kind") === lit(FieldSpecs.NameKind)), 1)("text"), lit("")))
    t("withName")(withName.count())

    val spans = withName.select($"doc_id", $"original_name", explode($"spans").as("s"))
    t("spans")(spans.count())

    val processUdf = udf {
      (docLocal: String, kind: String, text: String, offset: Int, originalName: String) =>
        if (kind == FieldSpecs.NameKind) SpanProcessor.processName(docLocal, text)
        else FieldSpecs.byKind.get(kind) match {
          case Some(spec) => SpanProcessor.process(spec, docLocal, text, offset, originalName)
          case None       => SpanResult(Nil, Nil)
        }
    }
    val proc = spans.withColumn("r", processUdf($"doc_id", $"s.kind", $"s.text", $"s.offset", $"original_name"))
    t("udf_pass")(proc.count())
    t("udf_pass2")(proc.count())

    val tr = proc.select($"doc_id", explode($"r.triples").as("t"))
    t("explode_triples")(tr.count())
    t("distinct")(tr.select($"t.subj", $"t.pred", $"t.objValue").distinct().count())

    // pure scala baseline: run the processor over collected spans
    val local = spans.collect()
    val t0 = System.nanoTime()
    var n = 0L
    local.foreach { r =>
      val s = r.getStruct(2)
      val res =
        if (s.getString(0) == FieldSpecs.NameKind) SpanProcessor.processName(r.getString(0), s.getString(1))
        else FieldSpecs.byKind.get(s.getString(0)) match {
          case Some(spec) => SpanProcessor.process(spec, r.getString(0), s.getString(1), s.getInt(3), r.getString(1))
          case None => SpanResult(Nil, Nil)
        }
      n += res.triples.size
    }
    println(f"[prof] pure_scala rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
