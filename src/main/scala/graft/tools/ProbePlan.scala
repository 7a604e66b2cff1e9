package graft.tools

import graft.ops._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does the chained-pairing plan reuse the banded/window
  * exchange across its three branches, or recompute the sketch per
  * consumer? Prints the executed plan's Exchange/ReusedExchange counts. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pairs = Similarity.nearDuplicatePairsLsh(emb, threshold = 0.3, bits = 8)
    pairs.count()
    val plan = pairs.queryExecution.executedPlan.toString
    def cnt(k: String) = k.r.findAllIn(plan).size
    println(s"[plan] Exchange=${cnt("Exchange hashpartitioning")} " +
      s"ReusedExchange=${cnt("ReusedExchange")} Scans=${cnt("Scan parquet")} " +
      s"BatchEvalPython_or_udf=${cnt("(?i)pythonudf|ScalaUDF")}")
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Scan parquet") || l.contains("Window"))
      .take(40).mkString("\n"))
    spark.stop()
  }
}
