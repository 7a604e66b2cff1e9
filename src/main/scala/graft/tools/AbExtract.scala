package graft.tools

import org.apache.spark.sql.SparkSession

import graft.extract.{Extraction, SynthDocs}

/** A/B: UDF+explode extraction vs doc-level typed flatMap. */
object AbExtract {
  def main(args: Array[String]): Unit = {
    val replicate = if (args.nonEmpty) args(0).toInt else 100
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = SynthDocs.fromDocuments(spark, "/root/testdata/sf0.1", replicate)
    val a = Extraction.triples(docs)
    val b = Extraction.triplesTyped(docs)
    def t(f: => Long): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    a.count(); b.count() // warm both
    val ta = (1 to 3).map(_ => t(a.count())).sorted.apply(1)
    val tb = (1 to 3).map(_ => t(b.count())).sorted.apply(1)
    println(f"[ab] udf_explode=$ta%.2f typed_flatmap=$tb%.2f (rows a=${a.count()}, b=${b.count()})")
    spark.stop()
  }
}
