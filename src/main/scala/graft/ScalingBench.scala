package graft

import org.apache.spark.sql.SparkSession

import graft.extract.{Extraction, SynthDocs}

/** One scaling-bench measurement at one parallelism level, in its own JVM:
  * `runMain graft.ScalingBench <cores> <sfDir> <replicate>` →
  * prints `[scaling] cores=<c> docs=<n> median_sec=<s>`.
  *
  * Protocol (BASELINE.md): identical deterministic input at every level,
  * one discarded warm-up run, median of 3 timed runs, shuffle partitions
  * scaled with cores. Run in a fresh JVM per level so JIT/GC state cannot
  * leak between the N and 4N measurements.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val replicate = if (args.length > 2) args(2).toInt else 20

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // construct the Dataset once: analysis happens once, the timed runs
    // measure execution (optimize+execute per action), mirroring a
    // production job where the plan is fixed
    val ds = Extraction.triples(SynthDocs.fromDocuments(spark, sfDir, replicate))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count() * replicate
    ds.count() // discarded warm-up
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      ds.count()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[scaling] cores=$cores docs=$docs median_sec=${times(1)}%.2f")
    spark.stop()
  }
}
