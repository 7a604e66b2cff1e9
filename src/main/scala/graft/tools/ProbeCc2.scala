package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: phase timing of ConnectedComponents on the dedup_groups
  * gate graph (ngramJaccardPairs at sf0.1) — where do CC's seconds go? */
object ProbeCc2 {
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
    (1 to 2).foreach { i =>
      val pairs = time(s"[$i] pairs build+checkpoint")(
        graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
          .select(col("id_a").cast("string").as("src"),
            col("id_b").cast("string").as("dst"))
          .localCheckpoint())
      println(s"[probe] [$i] n_pairs=${pairs.count()}")

      // replicate components() with phase timing
      val symPre = time(s"[$i] symPre checkpoint")(
        pairs.select($"src", $"dst")
          .unionByName(pairs.select($"dst".as("src"), $"src".as("dst")))
          .filter($"src" =!= $"dst")
          .distinct()
          .localCheckpoint())
      val cnt = time(s"[$i] count")(symPre.count())
      val edgeParts = math.min(spark.sparkContext.defaultParallelism.toLong,
        math.max(1L, cnt / 2000000L)).toInt
      println(s"[probe] [$i] edges=$cnt parts=$edgeParts")
      val sym = time(s"[$i] repartition+checkpoint")(
        symPre.repartition(edgeParts, $"dst").localCheckpoint())
      var labels = time(s"[$i] labels init")(
        sym.select($"src".as("node")).distinct()
          .withColumn("comp", $"node").localCheckpoint())
      val changedAcc = spark.sparkContext.longAccumulator("cc_changed")
      val trackChange = udf { (changed: Boolean) =>
        if (changed) changedAcc.add(1L); changed
      }
      var iter = 0
      var converged = false
      while (iter < 50 && !converged) {
        time(s"[$i] iteration $iter") {
          val compType = labels.schema("comp").dataType.sql
          val neighborLabels = sym
            .join(labels.withColumnRenamed("node", "dst2"), $"dst" === $"dst2")
            .select($"src".as("node"), $"comp", lit(null).cast(compType).as("oldc"))
          val propagated = labels.select($"node", $"comp", $"comp".as("oldc"))
            .unionByName(neighborLabels)
            .groupBy($"node").agg(min($"comp").as("comp"), min($"oldc").as("oldc"))
          val parent = propagated.select($"node".as("comp"), $"comp".as("pcomp"))
          val changedBefore = changedAcc.value
          val updated = propagated
            .join(parent, Seq("comp"), "left")
            .select($"node", least($"comp", coalesce($"pcomp", $"comp")).as("comp"), $"oldc")
            .select($"node", $"comp", trackChange(!($"comp" <=> $"oldc")).as("_chg"))
            .localCheckpoint()
          labels = updated.drop("_chg")
          converged = changedAcc.value == changedBefore
          iter += 1
        }
      }
      println(s"[probe] [$i] iterations=$iter")
    }
    spark.stop()
  }
}
