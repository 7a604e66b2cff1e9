package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 6): phase split of dedup_groups under the CC
  * small-graph fast path — pairs plan vs symPre materialization vs
  * union-find vs final sort. */
object ProbeCc3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
    (1 to 3).foreach { i =>
      // full gate query (pairs NOT pre-checkpointed — the real plan)
      time(s"[$i] full dedup_groups") {
        val pairs = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
        graft.ops.Dedup.nearDuplicateGroups(pairs).orderBy($"doc_id")
          .queryExecution.toRdd.count()
      }
      // phase split
      val pairs = time(s"[$i] pairs plan alone (noop count)") {
        val p = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
        p.queryExecution.toRdd.count()
        p
      }
      val edges = pairs.select(col("id_a").cast("string").as("src"),
        col("id_b").cast("string").as("dst"))
      val symPre = time(s"[$i] symPre materialize") {
        edges
          .select(explode(array(
            struct($"src", $"dst"),
            struct($"dst".as("src"), $"src".as("dst")))).as("e"))
          .select($"e.src", $"e.dst")
          .filter($"src" =!= $"dst")
          .distinct()
          .localCheckpoint()
      }
      println(s"[probe] [$i] parts=${symPre.rdd.getNumPartitions}")
      val labels = time(s"[$i] union-find + materialize") {
        symPre.as[(String, String)]
          .mapPartitions(graft.canon.ConnectedComponents.unionFindComponents)
          .toDF("node", "comp").localCheckpoint()
      }
      time(s"[$i] final select+orderBy") {
        labels.select($"node".as("doc_id"), $"comp".as("canonical_id"))
          .orderBy($"doc_id").queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
