package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k with `zip_with`/`aggregate`
  * expressions (codegen'd, no UDF). Scale path: random-hyperplane LSH
  * bucketing so candidate generation is a bucket equi-join instead of a
  * cross join — at 10^12 rows the cross join is impossible, the bucket
  * join shuffles each side once on the sketch key.
  */
object Similarity {

  /** dot(a,b) via zip_with + aggregate — pure expressions. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k neighbours of `queries` within `corpus`.
    * Queries are expected small → broadcast; corpus streams once. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(q)
      .filter($"neighbor_id" =!= $"query_id")
      .withColumn("cos", cosine($"qv".cast("array<double>"), $"cv".cast("array<double>")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", $"rank", $"cos")
  }

  /** Deterministic pseudo-random hyperplanes: components are a pure hash
    * of (table, bit, dim) mapped to [-1, 1] — no RNG state, so executors
    * need no broadcast and re-runs/resumes are bit-reproducible. The
    * matrix is materialized driver-side into a LITERAL so the sketch is a
    * dozen zip_with/aggregate nodes instead of thousands of per-component
    * hash expressions (the expression-tree form fell out of codegen and
    * cost ~80s on 2000 rows). */
  private def planeMatrix(table: Int, bits: Int, dims: Int): Seq[Seq[Double]] =
    (0 until bits).map { b =>
      (0 until dims).map { d =>
        val h = scala.util.hashing.MurmurHash3.productHash(("plane", table, b, d))
        h.toDouble / Int.MaxValue
      }
    }

  /** Sign sketch for one LSH table: `bits` hyperplane signs packed into a
    * Long. */
  def signSketch(vec: Column, table: Int, bits: Int, dims: Int): Column = {
    val planes = typedlit(planeMatrix(table, bits, dims))
    aggregate(
      transform(sequence(lit(0), lit(bits - 1)), p =>
        when(aggregate(zip_with(vec, element_at(planes, p + 1), (v, c) => v * c),
          lit(0.0d), (acc, x) => acc + x) > 0, lit(1L)).otherwise(lit(0L))),
      lit(0L), (acc, bit) => acc * 2 + bit)
  }

  /** LSH-bucketed approximate cosine top-k: candidates must share at least
    * one of `tables` independent sign sketches; then exact cosine + top-k.
    * Recall grows with `tables`; each table is an equi-join on a Long. */
  def cosineTopKLsh(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    bits: Int = 12, tables: Int = 4, dims: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    def sketched(df: DataFrame, id: String, vec: String): DataFrame = {
      val v = col(vec).cast("array<double>")
      val sketches = array((0 until tables).map(t =>
        concat(lit(t), lit(":"), signSketch(v, t, bits, dims))): _*)
      df.select(col(id), col(vec), explode(sketches).as("bucket"))
    }

    val qs = sketched(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), $"bucket")
    val cs = sketched(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), $"bucket")

    val cand = cs.join(broadcast(qs), Seq("bucket"))
      .filter($"neighbor_id" =!= $"query_id")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", cosine($"qv".cast("array<double>"), $"cv".cast("array<double>")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    cand.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"neighbor_id", $"rank", $"cos")
  }
}
