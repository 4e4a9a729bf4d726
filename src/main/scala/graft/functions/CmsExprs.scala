package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch frequency probe over a 64-bit key column — the
  * executor half of the sketch-gated exact aggregation pattern
  * ([[graft.ops.Frequency.heavyHitters]]): the driver folds the corpus
  * into a [[org.apache.spark.util.sketch.CountMinSketch]] (built by the
  * codegen'd `count_min_sketch` aggregate, fixed-size grid, no domain
  * shuffle) and this expression ships the finished grid to executors as a
  * task-serialized reference so every row can be gated on its estimated
  * frequency map-side.
  *
  * Guarantee inherited from the sketch: `estimate ≥ true count` always —
  * a frequency gate `estimate ≥ t` can admit false candidates (later
  * discarded by an exact count) but can never drop a true heavy hitter.
  */
case class CmsEstimate(child: Expression, sketch: CountMinSketch)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cms_estimate requires a bigint key, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    sketch.estimateCount(java.lang.Long.valueOf(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCmsSketch", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.estimateCount(java.lang.Long.valueOf($a));")
  }

  override protected def withNewChildInternal(c: Expression): CmsEstimate =
    copy(child = c)
  override def prettyName: String = "cms_estimate"
}

object CmsFunctions {
  def estimate(key: Column, sketch: CountMinSketch): Column =
    GraftSqlBridge.column(CmsEstimate(GraftSqlBridge.expression(key), sketch))
}
