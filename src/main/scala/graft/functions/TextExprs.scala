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

/** Precompiled BPE merge machine for [[BpeTokenCountExpr]] — the exact
  * semantics of the bracketed-string `replace` fold
  * ([[graft.ops.TextStats.bpeTokenCountFold]], the cross-engine reference
  * form) re-expressed over interned int symbols:
  *
  *   - input scrub: U+001F / U+0001 dropped (the fold's `translate`);
  *   - words: runs between Java-`\s` separators (space, TAB, LF, VT, FF,
  *     CR), empties skipped (the fold's `split("\\s+")` + empty filter);
  *   - per word, each merge rule in rank order fuses adjacent (a, b)
  *     symbol pairs greedily left-to-right, scanning resuming AFTER a
  *     fused pair — `UTF8String.replace`'s non-overlapping forward scan;
  *   - count = surviving symbols summed over words.
  *
  * Symbols are interned once at construction (merge operands + outputs to
  * small ints; other code points to negative ids that can never collide
  * with an operand), so the per-word encode loop is
  * O(rules × word length) int compares with zero allocation — vs the
  * fold's 32 full string rebuilds per word (~25× wall on the documents
  * fixture). [[graft.EngineProps]] pins kernel ≡ fold on adversarial
  * random text; the x58 probe value-checks it against DuckDB's replay of
  * the fold arithmetic.
  */
final class BpeKernel(merges: Seq[(String, String)]) extends Serializable {
  private val dict = new java.util.HashMap[String, Integer]()
  merges.foreach { case (a, b) =>
    Seq(a, b, a + b).foreach(s => if (!dict.containsKey(s)) dict.put(s, dict.size))
  }
  private val ruleA = merges.map(r => dict.get(r._1).intValue).toArray
  private val ruleB = merges.map(r => dict.get(r._2).intValue).toArray
  private val ruleAB = merges.map(r => dict.get(r._1 + r._2).intValue).toArray
  private val nRules = ruleA.length
  // single-code-point operand lookup: ASCII array + map spillover
  private val asciiId = Array.fill(128)(-1)
  private val wideId = new java.util.HashMap[Integer, Integer]()
  dict.forEach { (k, id) =>
    if (k.codePointCount(0, k.length) == 1) {
      val cp = k.codePointAt(0)
      if (cp < 128) asciiId(cp) = id.intValue else wideId.put(cp, id)
    }
  }

  private def symId(cp: Int): Int =
    if (cp < 128) { val id = asciiId(cp); if (id >= 0) id else -(cp + 2) }
    else { val id = wideId.get(cp); if (id != null) id.intValue else -(cp + 2) }

  /** Engine-portable token id per interned symbol: a single-code-point
    * symbol is its code point; a merged symbol is `0x110000 + r` where
    * `r` is the FIRST merge rank whose output concatenation equals it
    * (0x110000 = one past the Unicode range, so the two id spaces can
    * never collide). A multi-char OPERAND no rule outputs can never
    * appear in an encoded stream (symbols start as single chars and only
    * rules create longer ones — such a rule is DEAD and never fires;
    * the pinned public table contains a few, e.g. 'al' in "al"->"l"),
    * so its slot is never read. It maps to an out-of-band SENTINEL
    * (Long.MinValue — outside both id spaces) rather than clamping to
    * rank 0's id: if the never-read argument were ever violated the
    * sentinel surfaces as an impossible token id instead of silently
    * COLLIDING with a real one.
    */
  private[functions] val PortableSentinel: Long = Long.MinValue
  private val portable: Array[Long] = {
    val arr = new Array[Long](dict.size)
    dict.forEach { (k, id) =>
      arr(id.intValue) =
        if (k.codePointCount(0, k.length) == 1) k.codePointAt(0).toLong
        else {
          val producer = merges.indexWhere(r => r._1 + r._2 == k)
          if (producer >= 0) 0x110000L + producer else PortableSentinel
        }
    }
    arr
  }

  private def portableOf(id: Int): Long =
    if (id >= 0) portable(id) else (-id - 2).toLong

  /** Apply the rules to `syms[0, n0)` in place; returns surviving count. */
  private def encode(syms: Array[Int], n0: Int): Int = {
    var len = n0
    var r = 0
    while (r < nRules && len > 1) {
      val a = ruleA(r); val b = ruleB(r); val ab = ruleAB(r)
      var rd = 0; var wr = 0
      while (rd < len) {
        if (rd + 1 < len && syms(rd) == a && syms(rd + 1) == b) {
          syms(wr) = ab; rd += 2
        } else { syms(wr) = syms(rd); rd += 1 }
        wr += 1
      }
      len = wr
      r += 1
    }
    len
  }

  def count(input: UTF8String): Long = {
    val s = input.toString
    val n = s.length
    var total = 0L
    var syms = new Array[Int](32)
    var len = 0
    var i = 0
    while (i <= n) {
      var cp = -1
      var step = 1
      if (i < n) { cp = s.codePointAt(i); step = Character.charCount(cp) }
      val sep = i == n || cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (sep) {
        if (len > 0) { total += encode(syms, len); len = 0 }
      } else if (cp != 0x1F && cp != 0x01) {
        if (len == syms.length) syms = java.util.Arrays.copyOf(syms, len * 2)
        syms(len) = symId(cp)
        len += 1
      }
      i += step
    }
    total
  }

  /** Word-level encode emitting the surviving symbols' portable ids in
    * stream order — the tokenize twin of [[count]] (identical scan and
    * merge loop; `tokenIds(t).length == count(t)` always).
    */
  def tokenIds(input: UTF8String): Array[Long] = {
    val s = input.toString
    val n = s.length
    val out = Array.newBuilder[Long]
    var syms = new Array[Int](32)
    var len = 0
    var i = 0
    while (i <= n) {
      var cp = -1
      var step = 1
      if (i < n) { cp = s.codePointAt(i); step = Character.charCount(cp) }
      val sep = i == n || cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (sep) {
        if (len > 0) {
          val m = encode(syms, len)
          var t = 0
          while (t < m) { out += portableOf(syms(t)); t += 1 }
          len = 0
        }
      } else if (cp != 0x1F && cp != 0x01) {
        if (len == syms.length) syms = java.util.Arrays.copyOf(syms, len * 2)
        syms(len) = symId(cp)
        len += 1
      }
      i += step
    }
    out.result()
  }
}

/** `bpe_count(text)` — word-level BPE symbol count under a fixed merge
  * table; the codegen'd kernel form of the portable fold (see
  * [[BpeKernel]]). Null in → null out (callers coalesce to 0).
  */
case class BpeTokenCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val kernel = new BpeKernel(merges)

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_count requires string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    kernel.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeKernel", kernel, classOf[BpeKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.count($a);")
  }

  override protected def withNewChildInternal(c: Expression): BpeTokenCountExpr =
    copy(child = c)
  override def prettyName: String = "bpe_count"
}

/** `bpe_tokenize(text)` — word-level BPE token-id sequence under a fixed
  * merge table: the SAME kernel scan as `bpe_count`, emitting each
  * surviving symbol's engine-portable id (code point for single-char
  * symbols, 0x110000 + first producing merge rank for merged ones) in
  * stream order. Null in → null out.
  */
case class BpeTokenizeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val kernel = new BpeKernel(merges)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_tokenize requires string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      kernel.tokenIds(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeKernel", kernel, classOf[BpeKernel].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($ref.tokenIds($a));")
  }

  override protected def withNewChildInternal(c: Expression): BpeTokenizeExpr =
    copy(child = c)
  override def prettyName: String = "bpe_tokenize"
}

/** Deflate kernel for [[CompressionRatio]] — compressed-size ÷ raw-size
  * over the UTF-8 bytes, raw-deflate (no zlib header) at default level.
  * Only the LENGTH of the output is kept: the 256-byte buffer is drained
  * and discarded, so per-row allocation is one Deflater + one scratch
  * buffer regardless of document size. Deterministic for a given JVM
  * (the probe gates INVARIANTS — bounds and arm ordering — not exact
  * values: deflate output is not specified bit-exactly across zlib
  * implementations, so there is deliberately no DuckDB value twin).
  */
object DeflateKernel {
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](256)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    n.toDouble / bytes.length
  }
}

/** Mojibake-repair kernel for [[MojibakeRepair]] — the ftfy-lite pass
  * every web-curation stack runs: text that was UTF-8 on the wire but got
  * DECODED AS Latin-1 somewhere upstream reads "Ã©" for "é", "â€™" for
  * "’". The repair inverts the mistake: re-encode the chars as Latin-1
  * bytes and decode those bytes as UTF-8 — applied up to two rounds
  * (double-encoding happens), and ONLY when it is safe:
  *
  *   - every char must round-trip to Latin-1 (code point ≤ 0xFF) — else
  *     the text cannot be a Latin-1 misdecode at all;
  *   - the byte stream must decode as STRICTLY VALID UTF-8 (malformed →
  *     abort, return the input — never corrupt);
  *   - the result must SHRINK (a genuine repair merges multi-byte
  *     sequences; equality means pure-ASCII, nothing to do).
  *
  * Clean text is a fixpoint: ASCII fails the shrink test, real UTF-8
  * text with code points > 0xFF fails the Latin-1 round-trip, so repair
  * is idempotent and safe to run unconditionally.
  */
object MojibakeKernel {
  // NOTE: a fresh CharsetDecoder per call — CharsetDecoder is stateful and
  // NOT thread-safe, and this kernel runs on every executor thread
  private def repairOnce(s: String): Option[String] = {
    var i = 0
    val bytes = new Array[Byte](s.length)
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xFF) return None // not representable as Latin-1 bytes
      bytes(i) = c.toByte
      i += 1
    }
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out.length < s.length) Some(out) else None
    } catch {
      case _: java.nio.charset.CharacterCodingException => None
    }
  }

  def repair(u: UTF8String): UTF8String = {
    val s0 = u.toString
    repairOnce(s0) match {
      case None => u
      case Some(s1) => repairOnce(s1) match {
        case None => UTF8String.fromString(s1)
        case Some(s2) => UTF8String.fromString(s2) // double-encoded, two rounds max
      }
    }
  }
}

/** Encoding repair of a text column (see [[MojibakeKernel]]) — one
  * generated call per row; a UDF would break whole-stage codegen.
  */
case class MojibakeRepair(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"repair_encoding requires string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    MojibakeKernel.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MojibakeKernel.repair($a);")

  override protected def withNewChildInternal(c: Expression): MojibakeRepair = copy(c)
  override def prettyName: String = "repair_encoding"
}

/** Compression ratio of a text column — the cheap entropy proxy curation
  * stacks use beside the n-gram repetition rules: templated/boilerplate
  * text deflates far below natural prose, and high-entropy noise sits
  * above it. One generated call per row into [[DeflateKernel]]; a Scala
  * UDF here would break whole-stage codegen for the surrounding plan.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"compression_ratio requires string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    DeflateKernel.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeflateKernel.ratio($a);")

  override protected def withNewChildInternal(c: Expression): CompressionRatio = copy(c)
  override def prettyName: String = "compression_ratio"
}

/** Whitespace tokenization kernel for [[WhitespaceTokens]] /
  * [[WordShingles]] — the engine's hottest scalar path (every shingle,
  * MinHash, BM25, stat and packing operator tokenizes first). Byte-exact
  * twin of `filter(split(text, "\\s+"), _ != "")`: Java `\s` is the six
  * ASCII bytes 0x09-0x0D and 0x20, and multi-byte UTF-8 sequences never
  * contain bytes < 0x80, so a raw byte scan splits on EXACTLY the
  * separators the regex does — with no regex machinery, no UTF-16 decode
  * of the document, and no per-token String round-trip (measured ~3× on
  * the tokenize-bound scans at sf0.1; EngineProps pins kernel ≡ regex on
  * adversarial text). Token bytes are COPIED out (never sliced as views)
  * because the input may live in a reused row/column buffer.
  */
object WsTokenKernel {
  import org.apache.spark.unsafe.Platform

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  private def slice(base: AnyRef, off: Long, start: Int, len: Int): UTF8String = {
    val arr = new Array[Byte](len)
    Platform.copyMemory(base, off + start, arr, Platform.BYTE_ARRAY_OFFSET, len)
    UTF8String.fromBytes(arr)
  }

  /** Non-empty tokens between `\s+` runs. */
  def tokens(input: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val nb = input.numBytes
    val base = input.getBaseObject
    val off = input.getBaseOffset
    val out = new java.util.ArrayList[Object](16)
    var i = 0
    var start = -1
    while (i < nb) {
      if (isWs(Platform.getByte(base, off + i))) {
        if (start >= 0) { out.add(slice(base, off, start, i - start)); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) out.add(slice(base, off, start, nb - start))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Distinct space-joined word `n`-grams in first-occurrence order — the
    * kernel form of
    * `array_distinct(transform(sequence(1, T-n+1), i -> concat_ws(" ", slice(toks, i, n))))`
    * over the [[tokens]] array (empty when the document has fewer than `n`
    * tokens). One byte scan finds token spans, each shingle is assembled
    * with a single byte copy per gram, and the HOF chain's per-position
    * array slice + lambda evaluation disappears.
    */
  def shingles(input: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val nb = input.numBytes
    val base = input.getBaseObject
    val off = input.getBaseOffset
    var starts = new Array[Int](16)
    var lens = new Array[Int](16)
    var t = 0
    var i = 0
    var start = -1
    def push(s: Int, e: Int): Unit = {
      if (t == starts.length) {
        starts = java.util.Arrays.copyOf(starts, t * 2)
        lens = java.util.Arrays.copyOf(lens, t * 2)
      }
      starts(t) = s; lens(t) = e - s; t += 1
    }
    while (i < nb) {
      if (isWs(Platform.getByte(base, off + i))) {
        if (start >= 0) { push(start, i); start = -1 }
      } else if (start < 0) start = i
      i += 1
    }
    if (start >= 0) push(start, nb)
    if (t < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Object](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var p = 0
    while (p <= t - n) {
      var bytes = n - 1 // single-space joints
      var j = 0
      while (j < n) { bytes += lens(p + j); j += 1 }
      val arr = new Array[Byte](bytes)
      var w = 0
      j = 0
      while (j < n) {
        if (j > 0) { arr(w) = ' '; w += 1 }
        Platform.copyMemory(base, off + starts(p + j), arr,
          Platform.BYTE_ARRAY_OFFSET + w, lens(p + j))
        w += lens(p + j)
        j += 1
      }
      seen.add(UTF8String.fromBytes(arr))
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray(new Array[Object](seen.size)))
  }
}

/** `ws_tokens(text)` — whitespace tokens, empties dropped; the codegen'd
  * kernel form of `filter(split(text, "\\s+"), _ != "")` (see
  * [[WsTokenKernel]]). Null in → null out, matching the regex form.
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = true)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ws_tokens requires string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    WsTokenKernel.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WsTokenKernel.tokens($a);")

  override protected def withNewChildInternal(c: Expression): WhitespaceTokens = copy(c)
  override def prettyName: String = "ws_tokens"
}

/** `ws_shingles(text, n)` — distinct space-joined word n-grams in
  * first-occurrence order (see [[WsTokenKernel.shingles]]); empty array
  * for short documents AND for null text, matching the HOF form's
  * `when(size(toks) >= n, …).otherwise(array())` null semantics.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ws_shingles requires string input, got ${child.dataType}")

  private val Empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Object](0))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Empty else WsTokenKernel.shingles(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} = ${c.isNull} ?
          new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0]) :
          graft.functions.WsTokenKernel.shingles(${c.value}, $n);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  override def prettyName: String = "ws_shingles"
}

object TextFunctions {
  def fingerprint(text: Column): Column =
    GraftSqlBridge.column(PositionalFingerprint(GraftSqlBridge.expression(text)))

  def compressionRatio(text: Column): Column =
    GraftSqlBridge.column(CompressionRatio(GraftSqlBridge.expression(text)))

  def repairEncoding(text: Column): Column =
    GraftSqlBridge.column(MojibakeRepair(GraftSqlBridge.expression(text)))

  def nfc(text: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(text)))

  def langId(text: Column): Column =
    GraftSqlBridge.column(TrigramLangId(GraftSqlBridge.expression(text)))

  def bpeCount(text: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeTokenCountExpr(GraftSqlBridge.expression(text), merges))

  def bpeTokenize(text: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeTokenizeExpr(GraftSqlBridge.expression(text), merges))

  def wsTokens(text: Column): Column =
    GraftSqlBridge.column(WhitespaceTokens(GraftSqlBridge.expression(text)))

  def wsShingles(text: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text), n))
}
