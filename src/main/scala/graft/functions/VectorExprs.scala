package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions.{sqrt => fsqrt}
import org.apache.spark.sql.types._

/** Codegen'd dot product of two numeric array columns (any numeric
  * element type — tinyint through double), accumulating in double.
  *
  * The built-in route — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is a
  * pair of interpreted higher-order functions: per element it allocates and
  * evaluates lambda expression trees, which measures ~100× slower than this
  * tight generated loop and breaks whole-stage codegen for the surrounding
  * plan. Null elements read as 0 (embeddings are dense by contract).
  * Integer element types serve the quantized-ANN path
  * ([[graft.ops.Similarity.quantizedTopK]]): int8 products are exact in
  * double, so the accumulated sum is the exact integer dot.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression) = e.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires arrays of numeric elements, got ${left.dataType} / ${right.dataType}")
  }

  private def read(x: ArrayData, dt: DataType, i: Int): Double = dt match {
    case ByteType => x.getByte(i).toDouble
    case ShortType => x.getShort(i).toDouble
    case IntegerType => x.getInt(i).toDouble
    case LongType => x.getLong(i).toDouble
    case FloatType => x.getFloat(i).toDouble
    case _ => x.getDouble(i)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lt, rt) = (elemType(left), elemType(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      s += read(x, lt, i) * read(y, rt, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // every local must be freshName'd: several VecDot instances routinely
    // land in ONE generated method (vec_cosine alone inlines three), and a
    // fixed name is a Janino "Redefinition of local variable" compile error
    // — which silently drops the WHOLE stage to interpreted execution
    val n = ctx.freshName("vdN")
    val acc = ctx.freshName("vdS")
    val i = ctx.freshName("vdI")
    def get(arr: String, dt: DataType) = dt match {
      case ByteType => s"(double)$arr.getByte($i)"
      case ShortType => s"(double)$arr.getShort($i)"
      case IntegerType => s"(double)$arr.getInt($i)"
      case LongType => s"(double)$arr.getLong($i)"
      case FloatType => s"(double)$arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, elemType(left))} * ${get(b, elemType(right))};
         |}
         |${ev.value} = $acc;
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
