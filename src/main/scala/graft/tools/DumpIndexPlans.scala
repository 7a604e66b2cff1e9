package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dump the formatted plans of the dedup paths' CHECKPOINTED index
  * subtrees — these materialize eagerly at query construction, so the
  * gate queries' explain output starts at `Scan ExistingRDD` and never
  * shows them. Written to plans/r06 so the round's plan claims (window
  * df, fused shingle hashing, one ordered WindowExec) are verifiable. */
object DumpIndexPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/root/repo/plans/r06"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = java.nio.file.Paths.get(outDir, s"$name.txt")
      java.nio.file.Files.write(p,
        df.queryExecution.explainString(FormattedMode).getBytes("UTF-8"))
      println(s"[dump] $name -> $p")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
    val threshold = 0.5

    // ngram SSJoin index (perDoc) — the plan ngramJaccardPairs checkpoints
    val grams = docs
      .withColumn("__toks", graft.ops.TextAnalysis.tokens(col("text")))
      .select(col("doc_id").as("id"), explode(
        graft.functions.ShingleHash64Expression.shingleHash64(col("__toks"), 3)).as("g"))
    val dfw = Window.partitionBy($"g")
    val perDoc = grams.withColumn("df", count(lit(1)).over(dfw))
      .groupBy($"id")
      .agg(sort_array(collect_list(struct($"df", $"g"))).as("ordered"))
      .withColumn("sh", array_sort(transform($"ordered", o => o("g"))))
      .withColumn("sz", size($"sh"))
      .withColumn("prefix", transform(
        slice($"ordered", lit(1), (floor($"sz" * (1 - threshold)) + 1).cast("int")),
        o => o("g")))
      .select($"id", $"sh", $"sz", $"prefix")
    dump("dedup_ngram_index_subplan_after", perDoc)

    // minhash ranked candidate index — the plan chainedBucketPairs checkpoints
    val numHashes = 64; val bands = 16; val rpb = numHashes / bands
    val banded = docs
      .withColumn("__toks", graft.ops.TextAnalysis.tokens(col("text")))
      .select(col("doc_id").as("id"),
        graft.functions.ShingleHash64Expression.shingleHash64(col("__toks"), 3).as("hs"))
      .withColumn("sig", graft.ops.Dedup.minhashSignatureFromHashes($"hs", numHashes))
      .select($"id", element_at($"sig", 1).as("sk"),
        element_at($"sig", numHashes).as("sk2"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice($"sig", b * rpb + lit(1), lit(rpb))))))
      .select($"id", $"sk", $"sk2", concat($"pos", lit(":"), $"col").as("bucket"))
    val salted = banded.select($"bucket", $"id", $"sk", $"sk2")
      .withColumn("salt", pmod(xxhash64($"id"), lit(16)))
    val wOrd = Window.partitionBy($"bucket", $"salt").orderBy($"sk", $"sk2", $"id")
    val ranked = salted
      .withColumn("rk", row_number().over(wOrd))
      .withColumn("rep", first($"id").over(wOrd))
      .withColumn("tail",
        count(lit(1)).over(wOrd.rowsBetween(1, Window.unboundedFollowing)))
    dump("dedup_minhash_index_subplan_after", ranked)
    spark.stop()
  }
}
