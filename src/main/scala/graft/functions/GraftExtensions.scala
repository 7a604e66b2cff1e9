package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's scalar functions — the
  * `SparkSessionExtensions` path the driver's spark-submit contract
  * expects for custom expressions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * // or on an existing session:
  * GraftFunctions.register(spark)
  * spark.sql("SELECT jaro_winkler('kapteeni', 'kapteni')")
  * }}}
  *
  * `jaro_winkler` resolves to the native codegen
  * [[JaroWinklerExpression]] (no ScalaUDF boundary); the UDF-backed
  * helpers (`graft_slugify`) register through the classic udf registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.jaroWinklerDescriptor)
    ext.injectFunction(GraftFunctions.simhash64Descriptor)
  }
}

object GraftFunctions {

  private[functions] val jaroWinklerDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinklerExpression].getName, "jaro_winkler"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"jaro_winkler expects 2 arguments, got ${children.size}")
      JaroWinklerExpression(children.head, children(1))
    })

  private[functions] val simhash64Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[Simhash64Expression].getName, "simhash64"),
    (children: Seq[Expression]) => {
      require(children.size == 1,
        s"simhash64 expects 1 argument (array<bigint>), got ${children.size}")
      Simhash64Expression(children.head)
    })

  /** Register everything on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    Seq(jaroWinklerDescriptor, simhash64Descriptor).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    spark.udf.register("graft_slugify", Converters.slugify _)
  }
}
