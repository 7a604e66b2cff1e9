package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage profile of the extraction plan. */
object ProfileExtract {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    val docs = graft.extract.SynthDocs.fromDocuments(spark, sfDir)
    t("docs")(docs.count())
    t("docs_again")(docs.count())
    val spans = docs.select($"doc_id", explode($"spans").as("s"))
    t("explode")(spans.count())
    val cached = docs.persist()
    t("docs_cached")(cached.count())
    t("triples_on_cached")(graft.extract.Extraction.triples(cached).count())
    cached.unpersist()
    t("triples_full")(graft.extract.Extraction.triples(docs).count())
    spark.stop()
  }
}
