package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorExpressions._

/** SparkSessionExtensions wiring: makes the engine's native expressions
  * available to ANY session created with
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * For an already-running session, `VectorFunctions.register(spark)`
  * installs the same functions into the temp registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((new FunctionIdentifier("cosine_f32"),
      new ExpressionInfo(classOf[CosineSimilarityF32].getName, "cosine_f32"),
      (es: Seq[Expression]) => CosineSimilarityF32(es(0), es(1))))
    e.injectFunction((new FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProductF32].getName, "dot_f32"),
      (es: Seq[Expression]) => DotProductF32(es(0), es(1))))
    e.injectFunction((new FunctionIdentifier("l2_norm_f32"),
      new ExpressionInfo(classOf[L2NormF32].getName, "l2_norm_f32"),
      (es: Seq[Expression]) => L2NormF32(es.head)))
  }
}
