package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Position-weighted checksum fingerprint:
  * `Σ codepoint(c_i) · ((i mod 64) + 1)` over 1-based codepoint positions.
  *
  * Semantically identical to
  * `aggregate(sequence(1, length(t)), 0L, (acc,i) -> acc + ascii(substr(t,i,1))·((i%64)+1))`
  * but that route interprets a lambda and allocates a 1-char string per
  * character (~35 ms/doc measured); this is one generated loop.
  */
case class PositionalFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fingerprint requires string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    var pos = 1
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc += cp.toLong * ((pos % 64) + 1)
      i += Character.charCount(cp)
      pos += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName every local — two instances in one generated method with
    // fixed names are a Janino redefinition error → interpreted fallback
    val s = ctx.freshName("fpS")
    val acc = ctx.freshName("fpAcc")
    val pos = ctx.freshName("fpPos")
    val i = ctx.freshName("fpI")
    val cp = ctx.freshName("fpCp")
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |java.lang.String $s = $a.toString();
         |long $acc = 0L;
         |int $pos = 1;
         |for (int $i = 0; $i < $s.length(); $pos++) {
         |  int $cp = $s.codePointAt($i);
         |  $acc += (long) $cp * (($pos % 64) + 1);
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): PositionalFingerprint = copy(c)
  override def prettyName: String = "positional_fingerprint"
}

/** Unicode NFC normalization (java.text.Normalizer, Form.NFC) — the
  * canonical-composition pass a corpus needs before content hashing:
  * visually identical strings ("café" precomposed U+00E9 vs decomposed
  * "e"+U+0301) otherwise hash apart and survive exact dedup as distinct
  * documents. Spark has no built-in for this; a one-call codegen'd
  * expression keeps it inside whole-stage codegen (DuckDB oracle twin:
  * `nfc_normalize`).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($a.toString(), java.text.Normalizer.Form.NFC));
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
  override def prettyName: String = "nfc_normalize"
}

object TextFunctions {
  def fingerprint(text: Column): Column =
    GraftSqlBridge.column(PositionalFingerprint(GraftSqlBridge.expression(text)))

  def nfc(text: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(text)))
}
