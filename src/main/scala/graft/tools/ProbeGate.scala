package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Dev probe: isolates the cost of the planted-fixture gate-row wrappers
  * (union + planted filter + CC) from the underlying operators. */
object ProbeGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gate] $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }

    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32).select($"doc_id", $"text")
    val planted = Seq(
      (9000000010L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (9000000011L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ).toDF("doc_id", "text")
    val all = corpus.unionByName(planted)

    time("warmup")(corpus.count())
    time("minhash_corpus")(Dedup.minhashNearDuplicates(corpus, "doc_id", "text", threshold = 0.5).count())
    time("minhash_all")(Dedup.minhashNearDuplicates(all, "doc_id", "text", threshold = 0.5).count())
    val filtered = Dedup.minhashNearDuplicates(all, "doc_id", "text", threshold = 0.5)
      .filter($"id_a" >= 9000000000L && $"id_b" >= 9000000000L)
    time("minhash_filtered")(filtered.count())
    time("minhash_cc")(Dedup.nearDuplicateGroups(filtered).count())
    time("fp_corpus")(TextAnalysis.fingerprints(corpus, "text").count())
    time("fp_all")(TextAnalysis.fingerprints(all, "text").count())
    val fpsEval = TextAnalysis.fingerprints(all, "text")
    time("fp_eval")(fpsEval.agg(max(size($"fingerprint"))).collect())
    time("fp_eval2")(fpsEval.agg(max(size($"fingerprint"))).collect())
    val fps = fpsEval.withColumn("fph", xxhash64($"fingerprint"))
    time("fph_eval")(fps.agg(max($"fph")).collect())
    val plantedFp = fps.filter($"doc_id" >= 9000000000L)
      .select($"doc_id".as("id_a"), $"fingerprint".as("fp"), $"fph")
    time("planted_ckpt")(plantedFp.localCheckpoint().count())
    val pck = plantedFp.localCheckpoint()
    time("fp_join")(fps.join(broadcast(pck), Seq("fph"))
      .filter($"fp" === $"fingerprint" && $"id_a" < $"doc_id").count())
    time("simhash_corpus")(Dedup.simhashNearDuplicates(corpus, "doc_id", "text", maxHamming = 3).count())
    time("simhash_all")(Dedup.simhashNearDuplicates(all, "doc_id", "text", maxHamming = 3).count())
    spark.stop()
  }
}
