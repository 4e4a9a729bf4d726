package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over a 64-bit key column — the executor
  * half of the build-once/probe-everywhere runtime-filter pattern
  * ([[graft.ops.Dedup.incrementalExactBloom]]): the driver builds a
  * [[org.apache.spark.util.sketch.BloomFilter]] from the corpus key set
  * (`df.stat.bloomFilter`, a tree-aggregated distributed build), and this
  * expression ships it to executors as a task-serialized reference object
  * — the same mechanism Spark's own `BloomFilterMightContain` runtime
  * filter uses, but available to library code.
  *
  * Guarantees follow the sketch: NO false negatives (a key that was put
  * always probes true), bounded false-positive rate (the `fpp` the filter
  * was built with). Callers that need exactness must verify positives —
  * [[graft.ops.Dedup.incrementalExactBloom]] does, with an equi-join on
  * the full content hash.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint key, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.mightContainLong($a);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

object BloomFunctions {
  def mightContain(key: Column, filter: BloomFilter): Column =
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(key), filter))
}
