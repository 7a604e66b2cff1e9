package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 6): alternating in-JVM A/B of the brute-force
  * cosine top-k scoring pass — zip_with+aggregate reference tree vs the
  * native DotProductExpression — on the sf0.1 embedding corpus × 8
  * queries. Also asserts identical results (raw bits ride the rank). */
object ProbeDotAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def dotRef(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    def cosRef(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      dotRef(a, b) / (sqrt(dotRef(a, a)) * sqrt(dotRef(b, b)))

    val k = if (args.length > 1) args(1).toInt else 1
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val emb = (0 until k).map(r => base.select(($"vec_id" + lit(r * 1000000L)).as("vec_id"), $"embedding"))
      .reduce(_ unionByName _).repartition(32).localCheckpoint()
    val q = broadcast(base
      .filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qv")))
    def scored(useRef: Boolean) = {
      val c = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("cv"))
      val j = c.crossJoin(q).filter($"neighbor_id" =!= $"query_id")
      val cos = if (useRef)
        cosRef($"qv".cast("array<double>"), $"cv".cast("array<double>"))
      else
        graft.ops.Similarity.cosine($"qv".cast("array<double>"), $"cv".cast("array<double>"))
      j.withColumn("cos", cos)
    }
    // identical scores, raw bits
    val diff = scored(true).select($"query_id", $"neighbor_id", $"cos")
      .exceptAll(scored(false).select($"query_id", $"neighbor_id", $"cos")).count()
    println(s"[probe] score diff rows = $diff")
    (1 to 4).foreach { i =>
      time(s"[$i] REF  scoring pass")(scored(true).queryExecution.toRdd.count())
      time(s"[$i] FAST scoring pass")(scored(false).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
