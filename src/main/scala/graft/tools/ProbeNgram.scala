package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: where does ngramJaccardPairs' time go after the perDoc
  * index checkpoint? Times (a) the index materialization alone, (b) the
  * full pair query. */
object ProbeNgram {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32)
    val threshold = 0.5
    (1 to 3).foreach { i =>
      // phase a: grams
      val grams = docs
        .withColumn("__toks", graft.ops.TextAnalysis.tokens(col("text")))
        .select(col("doc_id").as("id"), explode(
          transform(graft.ops.Dedup.shinglesFromTokens(col("__toks")), s => xxhash64(s))).as("g"))
      val dfc = grams.groupBy($"g").agg(count(lit(1)).as("df"))
      val perDocPlan = grams.join(dfc, Seq("g"))
        .groupBy($"id")
        .agg(sort_array(collect_list(struct($"df", $"g"))).as("ordered"))
        .withColumn("sh", transform($"ordered", o => o("g")))
        .withColumn("sz", size($"sh"))
        .withColumn("prefix", transform(
          slice($"ordered", lit(1), (floor($"sz" * (1 - threshold)) + 1).cast("int")),
          o => o("g")))
        .select($"id", $"sh", $"sz", $"prefix")
      time(s"[$i] perDoc noop")(perDocPlan.write.format("noop").mode("overwrite").save())
      val perDoc = time(s"[$i] perDoc localCheckpoint")(perDocPlan.localCheckpoint())
      val inverted = perDoc.select($"id", $"sz", explode($"prefix").as("g"))
      val rawPairs = inverted.as("a").join(inverted.as("b"),
          $"a.g" === $"b.g" && $"a.id" < $"b.id" &&
            $"b.sz" >= $"a.sz" * threshold && $"a.sz" >= $"b.sz" * threshold)
        .select($"a.id".as("id_a"), $"b.id".as("id_b"))
      val nRaw = time(s"[$i] raw candidate join count")(rawPairs.count())
      println(s"[probe] [$i] raw candidates = $nRaw")
      val pairs = rawPairs.dropDuplicates("id_a", "id_b")
      val nDedup = time(s"[$i] deduped candidates count")(pairs.count())
      println(s"[probe] [$i] deduped candidates = $nDedup")
      time(s"[$i] verification joins + jaccard")(
        pairs
          .join(perDoc.select($"id".as("id_a"), $"sh".as("sh_a")), Seq("id_a"))
          .join(perDoc.select($"id".as("id_b"), $"sh".as("sh_b")), Seq("id_b"))
          .withColumn("inter", size(array_intersect($"sh_a", $"sh_b")))
          .withColumn("jaccard",
            $"inter" / (size($"sh_a") + size($"sh_b") - $"inter"))
          .filter($"jaccard" >= threshold)
          .select($"id_a", $"id_b", $"jaccard").queryExecution.toRdd.count())
      time(s"[$i] full ngramJaccardPairs (current code)")(
        graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
          .orderBy($"id_a", $"id_b").queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
