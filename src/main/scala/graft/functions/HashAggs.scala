package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/** Deterministic universal-hash parameters for MinHash permutation `p`
  * over the 31-bit Mersenne-prime domain.
  */
object MinHashParams {
  val P: Long = 2147483647L // 2^31 - 1

  def perm(p: Int): (Long, Long) = {
    // splitmix-style scramble of the permutation index; a must be non-zero
    val x = (p.toLong + 1) * 0x9e3779b97f4a7c15L
    val a = math.abs(x % (P - 1)) + 1
    val b = math.abs((x >> 17) % P)
    (a, b)
  }
}

/** MinHash signature aggregate: input is a 31-bit element hash (long); the
  * buffer tracks `min((a_p·h + b_p) mod P)` for all `numPerm` permutations
  * in one `long[]`.
  *
  * The declarative alternative — `numPerm` separate `min(pmod(...))`
  * aggregate columns — blows the generated-code size budget at 64+
  * permutations, dropping the whole stage to interpreted evaluation
  * (measured ~75 µs/row). This buffer updates in a tight JVM loop and keeps
  * one aggregation buffer per group.
  */
case class MinHashAgg(
    child: Expression,
    numPerm: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  @transient private lazy val params: Array[(Long, Long)] =
    Array.tabulate(numPerm)(MinHashParams.perm)

  override def createAggregationBuffer(): Array[Long] = Array.fill(numPerm)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var p = 0
      while (p < numPerm) {
        val (a, b) = params(p)
        val x = (a * h + b) % MinHashParams.P
        if (x < buf(p)) buf(p) = x
        p += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numPerm) { if (b2(p) < b1(p)) b1(p) = b2(p); p += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(v => if (v == Long.MaxValue) null else java.lang.Long.valueOf(v)))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerm)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerm)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MinHashAgg = copy(child = c)
  override def prettyName: String = "minhash_agg"
}

/** 63-bit SimHash aggregate (bit 63 unused so the signature stays a
  * positive long under ANSI): input is a per-token 64-bit hash; the buffer
  * holds 63 vote counters (+1 when the bit is set, −1 otherwise); the
  * signature sets bit i iff votes(i) > 0. Replaces 63 `sum(when(...))`
  * aggregate columns for the same code-size reason as [[MinHashAgg]].
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  private val Bits = 63

  override def createAggregationBuffer(): Array[Int] = new Array[Int](Bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < Bits) {
        if (((h >>> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < Bits) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < Bits) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
    java.lang.Long.valueOf(sig)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * Bits)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(Bits)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SimHashAgg = copy(child = c)
  override def prettyName: String = "simhash_agg"
}

object HashAggFunctions {
  /** `minhash_agg(h31, numPerm)` → array<long> signature. */
  def minhash_agg(h: Column, numPerm: Int): Column =
    GraftSqlBridge.column(
      MinHashAgg(GraftSqlBridge.expression(h), numPerm).toAggregateExpression())

  /** `simhash_agg(h64)` → 63-bit signature long. */
  def simhash_agg(h: Column): Column =
    GraftSqlBridge.column(SimHashAgg(GraftSqlBridge.expression(h)).toAggregateExpression())
}
