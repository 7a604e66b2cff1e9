package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected queries — the plan-quality
  * audit loop (PushedFilters reach the scan? dims broadcast? shuffles only
  * where semantics demand?). */
object ExplainQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("s2_filter_project", "j1_broadcast_dims", "j15_anti_join",
        "w1_topk_per_group", "dedup_exact", "embed_cosine_topk")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
