package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.SortedIntersectCountExpression.sortedIntersectCount

/** Equivalence pin for the sorted-merge intersection count: under its
  * contract (ascending-sorted, distinct-element long arrays) it must
  * equal `size(array_intersect(a, b))` exactly — including empty arrays,
  * disjoint sets, identical sets, and random overlaps. */
class SortedIntersectSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("sorted intersect count ≡ size(array_intersect) on sorted distinct arrays") {
    val rnd = new scala.util.Random(42)
    val cases = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L, 3L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(Long.MinValue, -1L, 0L, Long.MaxValue), Seq(-1L, Long.MaxValue)),
    ) ++ (1 to 20).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(50).toLong)
        .distinct.sorted
      (arr(), arr())
    }
    val df = cases.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select($"i",
        sortedIntersectCount($"a", $"b").as("merged"),
        size(array_intersect($"a", $"b")).as("builtin"))
    df.collect().foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"mismatch on case ${r.getInt(0)}")
    }
  }

  test("null array yields null, like the builtin") {
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(sortedIntersectCount($"a", $"b").as("merged"))
    assert(df.collect().head.isNullAt(0))
  }
}
