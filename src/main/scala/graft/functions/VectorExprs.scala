package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions.{sqrt => fsqrt}
import org.apache.spark.sql.types._

/** Codegen'd dot product of two numeric array columns (float or double
  * elements), accumulating in double.
  *
  * The built-in route — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is a
  * pair of interpreted higher-order functions: per element it allocates and
  * evaluates lambda expression trees, which measures ~100× slower than this
  * tight generated loop and breaks whole-stage codegen for the surrounding
  * plan. Null elements read as 0 (embeddings are dense by contract).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression) = e.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, dt: DataType) = dt match {
      case FloatType => s"(double)$arr.getFloat(i)"
      case _ => s"$arr.getDouble(i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double s = 0.0;
         |for (int i = 0; i < n; i++) {
         |  s += ${get(a, elemType(left))} * ${get(b, elemType(right))};
         |}
         |${ev.value} = s;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot = copy(l, r)
  override def prettyName: String = "vec_dot"
}

/** Column-API surface for the vector kernels. */
object VectorFunctions {
  def vec_dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(VecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def vec_norm(a: Column): Column = fsqrt(vec_dot(a, a))

  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
}
