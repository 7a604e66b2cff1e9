package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does a localCheckpoint preserve hash partitioning, so the
  * CC loop's per-iteration join can skip re-shuffling the edge set?
  * Prints whether the join over a pre-partitioned checkpointed frame
  * plans an Exchange on the checkpointed side. */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val edges = (1L to 100000L).map(i => (i, i % 1000)).toDF("src", "dst")
    val symPlain = edges.localCheckpoint()
    val symPart = edges.repartition($"dst").localCheckpoint()
    val labels = (0L to 999L).map(i => (i, i)).toDF("dst2", "comp")

    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.count()
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    }
    val jPlain = symPlain.join(labels, $"dst" === $"dst2")
    val jPart = symPart.join(labels, $"dst" === $"dst2")
    println(s"[cc-probe] plain-checkpoint exchanges=${exchanges(jPlain)} " +
      s"pre-partitioned exchanges=${exchanges(jPart)}")
    spark.stop()
  }
}
