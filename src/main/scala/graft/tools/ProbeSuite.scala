package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: ONE honest (`toRdd.count()`) timed run of every SparkEntry
  * query — a fast pre-flight for [[graft.Bench]], catching any query whose
  * full materialization is pathologically slower than its pruned `count()`
  * plan (the round-4 repetitionCounts hang was invisible to `count()`).
  * `runMain graft.tools.ProbeSuite [sfDir] [queryName...]`. */
object ProbeSuite {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        val t0 = System.nanoTime()
        val rows =
          try fn(spark, sfDir).queryExecution.toRdd.count()
          catch { case e: Throwable =>
            System.err.println(s"[probe] $name FAILED: ${e.getMessage}"); -1L }
        println(f"[probe] $name rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
