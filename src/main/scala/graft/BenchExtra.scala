package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1). NOT the driver bench —
  * `Bench.scala` is frozen; this main exists so per-query work can be timed
  * and its plan captured without touching the graded harness.
  *
  * Methodology mirrors Bench exactly: same session config, same
  * full-materialization action (`queryExecution.toRdd.count()` — count()
  * would let Catalyst prune the computation), one untimed warm-up then
  * best-of-3. Extras:
  *   - `SPARK_GRAFT_EXPLAIN_DIR` + `SPARK_GRAFT_EXPLAIN_SUFFIX`: dump each
  *     query's `.explain("formatted")` to `<dir>/<name><suffix>.txt`;
  *   - jobs are labelled with the query name for UI readability (guide §1.5);
  *   - queries may be named as args; default = all declared queries.
  */
object BenchExtra {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val explainDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    val explainSuffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runFully(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try {
        explainDir.foreach { dir =>
          val p = java.nio.file.Paths.get(dir, s"$name$explainSuffix.txt")
          java.nio.file.Files.createDirectories(p.getParent)
          val txt = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
        }
        spark.sparkContext.setJobDescription(name)
        runFully(fn(spark, sfDir)) // warm-up (plan + IO cache + codegen)
        val samples = (1 to 3).map(_ => time { runFully(fn(spark, sfDir)) })
        println(f"[bx] $name%-28s min=${samples.min}%.3f samples=" +
          samples.map(s => f"$s%.3f").mkString(","))
      } catch { case e: Throwable =>
        println(s"[bx] $name FAILED: ${e.getMessage}")
      }
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
