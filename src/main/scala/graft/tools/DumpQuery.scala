package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump ONE SparkEntry query's result to parquet —
  * `runMain graft.tools.DumpQuery <name> <sfDir> <outDir>` — so a single
  * oracle can be developed/diffed against DuckDB without a full Verify
  * pass. */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    spark.stop()
  }
}
