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

object PositionalFingerprint {
  /** Driver-side replica of the kernel loop — for hashing CONSTANTS
    * (e.g. a pinned classifier vocabulary) into the same bucket space
    * executor-side expressions use. Keep in lockstep with
    * `nullSafeEval`/`doGenCode` above.
    */
  def of(s: String): Long = {
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

/** Language-ID scoring kernel shared by interpreted eval and generated
  * code. Constants come from [[graft.ops.TextStats.LangTrigramProfiles]] /
  * [[graft.ops.TextStats.ScriptRanges]] — the SAME tables that generate the
  * DuckDB oracle SQL ([[graft.ops.TextStats.langIdSql]]), so the engines
  * cannot drift. Semantics are bit-for-bit the round-5 expression form:
  *
  *   - empty text → `unknown`;
  *   - first [[graft.ops.TextStats.ScriptRanges]] range (in declaration
  *     order) with ANY codepoint in the text wins (one codepoint pass
  *     sets a bitmask — equivalent to the 7 ordered `rlike` probes);
  *   - else per Latin profile `H_l = 3 · Σ_t nonOverlapCount(lower(x), t)`
  *     — identical to `Σ_t length(x) − length(replace(x, t, ''))`, since
  *     every trigram is exactly 3 chars (unit-pinned) and both
  *     `UTF8String.replace` and `String.indexOf` match non-overlapping
  *     left-to-right;
  *   - first profile with the max H wins (strict `>` keeps the first =
  *     alphabetical tie-break), `unknown` when `H < 0.02 · length(text)`.
  *
  * Lowercasing goes through `UTF8String.toLowerCase` — the exact kernel
  * Spark's `lower()` used in the previous formulation.
  *
  * Why a kernel and not the flat `greatest`-encoded column expression: at
  * 7 profiles × 40 trigrams the single generated method crossed janino's
  * 64 KB limit, and under production defaults Spark silently dropped the
  * WHOLE projection to interpreted execution. One static call site keeps
  * the generated method tiny no matter how deep the profiles grow, and
  * replaces 280 per-row `replace` string allocations with allocation-free
  * `indexOf` scans.
  */
object LangIdKernel {
  private val scriptLangs: Array[UTF8String] =
    graft.ops.TextStats.ScriptRanges.map(r => UTF8String.fromString(r._1)).toArray
  private val scriptLo: Array[Int] = graft.ops.TextStats.ScriptRanges.map(_._2).toArray
  private val scriptHi: Array[Int] = graft.ops.TextStats.ScriptRanges.map(_._3).toArray
  private val langs: Array[UTF8String] =
    graft.ops.TextStats.LangTrigramProfiles.map(p => UTF8String.fromString(p._1)).toArray
  private val trigrams: Array[Array[String]] =
    graft.ops.TextStats.LangTrigramProfiles.map(_._2.toArray).toArray
  private val unknown = UTF8String.fromString("unknown")

  def classify(text: UTF8String): UTF8String = {
    val nChars = text.numChars()
    if (nChars == 0) return unknown
    val s = text.toString
    var mask = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      var r = 0
      while (r < scriptLo.length) {
        if (cp >= scriptLo(r) && cp <= scriptHi(r)) mask |= 1 << r
        r += 1
      }
      i += Character.charCount(cp)
    }
    if (mask != 0) return scriptLangs(Integer.numberOfTrailingZeros(mask))
    val x = text.toLowerCase.toString
    var best = 0
    var bestH = -1L
    var l = 0
    while (l < trigrams.length) {
      val ts = trigrams(l)
      var h = 0L
      var t = 0
      while (t < ts.length) {
        val tri = ts(t)
        var pos = x.indexOf(tri)
        while (pos >= 0) {
          h += 3
          pos = x.indexOf(tri, pos + tri.length)
        }
        t += 1
      }
      if (h > bestH) { bestH = h; best = l }
      l += 1
    }
    if (bestH.toDouble < 0.02 * nChars.toDouble) unknown else langs(best)
  }
}

/** Codegen'd trigram language ID — one static kernel call per row (see
  * [[LangIdKernel]]). Null in → null out; the Column wrapper coalesces to
  * `unknown` to match the oracle's NULL arm.
  */
case class TrigramLangId(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lang_id requires string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    LangIdKernel.classify(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.LangIdKernel.classify($a);")

  override protected def withNewChildInternal(c: Expression): TrigramLangId = copy(c)
  override def prettyName: String = "lang_id"
}

object TextFunctions {
  def fingerprint(text: Column): Column =
    GraftSqlBridge.column(PositionalFingerprint(GraftSqlBridge.expression(text)))

  def nfc(text: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(text)))

  def langId(text: Column): Column =
    GraftSqlBridge.column(TrigramLangId(GraftSqlBridge.expression(text)))
}
