package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Canonical.round4

/** Within-document repetition statistics and the quality gate built on
  * them — the "repetitious text" filters of the Gopher / MassiveText
  * pipeline (Rae et al. '21, table A1), the standard pre-training pass
  * that evicts boilerplate, scraped navigation, and generation loops.
  *
  * Two families:
  *   - LINE stats ([[withLineStats]]): pure per-row array expressions
  *     (split → distinct → length sums), shuffle-free and embarrassingly
  *     parallel — the 100-TB shape.
  *   - N-GRAM stats ([[topNgramCharFrac]], [[dupNgramCharFrac]]): one
  *     explode + one keyed aggregate per n, keyed by document id — same
  *     single-shuffle budget as [[TextStats.tfidfTopTerms]]. A per-row
  *     formulation would be quadratic in document length (each gram
  *     recounted against every other), so the shuffle is the right trade.
  *
  * Character-fraction conventions (documented because published
  * implementations differ in the overlap fine print):
  *   - `dup_line_char_frac`: characters in occurrences AFTER the first of
  *     each repeated line, over total line characters — i.e.
  *     `1 − Σ_distinct len / Σ_all len`.
  *   - `top_ngram_char_frac`: occurrences × length (with joining spaces)
  *     of the most frequent n-gram, over `length(text)`.
  *   - `dup_ngram_char_frac`: Σ occurrences × length over every n-gram
  *     appearing ≥ 2 times, over `length(text)`. Overlapping occurrences
  *     are each counted (the Dolma-style approximation of Gopher's
  *     covered-character definition; exact interval coverage needs a
  *     per-row merge pass that can't stay declarative) — so the raw
  *     char MASS can exceed the text length on pathologically repetitive
  *     input (`a a a a`: three overlapping copies of `a a`), and both
  *     n-gram fractions are therefore CAPPED at 1.0 to keep the
  *     fraction contract (gate decisions are unaffected: every
  *     published threshold is ≪ 1).
  * All fractions are [[round4]]-canonicalized so DuckDB replays them
  * bit-for-bit.
  */
object Repetition {

  /** All word n-grams of a text column WITH multiplicity (unlike
    * [[Dedup.shingles]], which is the distinct set) — repetition counting
    * needs every occurrence.
    */
  def ngrams(text: Column, n: Int): Column =
    ngramsFromToks(graft.functions.TextFunctions.wsTokens(text), n)

  /** [[ngrams]] from a prebuilt token array — lets a caller that needs
    * several gram widths tokenize ONCE and share the array. The array is
    * let-bound ([[graft.Canonical.bindOnce]]) so the slice lambda reads a
    * variable — an expression-tree `toks` would re-evaluate per n-gram
    * position in the interpreted HOF (O(len²) per row).
    */
  private def ngramsFromToks(toksE: Column, n: Int): Column =
    graft.Canonical.bindOnce(toksE) { toks =>
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }

  /** Append `dup_line_frac` and `dup_line_char_frac` computed over the
    * `sep`-separated segments of `textCol` (default newline; pass `" "`
    * to measure token-level repetition of single-line text). Documents
    * with no segments get 0.0 for both.
    */
  def withLineStats(docs: DataFrame, textCol: String, sep: String = "\n"): DataFrame = {
    val lines = filter(split(col(textCol), sep), l => l =!= lit(""))
    val distinctLines = array_distinct(lines)
    def charSum(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, x) => acc + length(x).cast("long"))
    val n = size(lines)
    val total = charSum(lines)
    docs
      .withColumn("dup_line_frac", round4(
        when(n === 0, lit(0.0)).otherwise(
          (n - size(distinctLines)).cast("double") / n.cast("double"))))
      .withColumn("dup_line_char_frac", round4(
        when(total === 0L, lit(0.0)).otherwise(
          (total - charSum(distinctLines)).cast("double") / total.cast("double"))))
  }

  /** (id, top_ngram_char_frac): character share of the single most
    * frequent word n-gram. Ties break deterministically toward the longer
    * gram, then the lexicographically larger gram (a `max(struct(...))`
    * — one partial-aggregating shuffle, no window sort). Documents with
    * no n-gram (shorter than n tokens) score 0.0.
    */
  def topNgramCharFrac(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val counts = docs
      .select(col(idCol).as("id"), explode(ngrams(col(textCol), n)).as("gram"))
      .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("cnt"))
    val top = counts
      .groupBy(col("id"))
      .agg(max(struct(col("cnt"), length(col("gram")).as("glen"), col("gram"))).as("top"))
      .select(col("id"),
        (col("top.cnt") * col("top.glen").cast("long")).as("__top_chars"))
    docs.select(col(idCol).as("id"), length(col(textCol)).cast("long").as("__len"))
      .join(top, Seq("id"), "left")
      .select(col("id").as(idCol), round4(
        when(col("__len").isNull || col("__len") === 0L || col("__top_chars").isNull, lit(0.0))
          .otherwise(least(lit(1.0),
            col("__top_chars").cast("double") / col("__len").cast("double"))))
        .as(s"top_${n}gram_char_frac"))
  }

  /** (id, dup_ngram_char_frac): character share of all occurrences of
    * word n-grams appearing at least twice. Same single-shuffle plan as
    * [[topNgramCharFrac]].
    */
  def dupNgramCharFrac(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val dupChars = docs
      .select(col(idCol).as("id"), explode(ngrams(col(textCol), n)).as("gram"))
      .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2L)
      .groupBy(col("id"))
      .agg(sum(col("cnt") * length(col("gram")).cast("long")).as("__dup_chars"))
    docs.select(col(idCol).as("id"), length(col(textCol)).cast("long").as("__len"))
      .join(dupChars, Seq("id"), "left")
      .select(col("id").as(idCol), round4(
        when(col("__len").isNull || col("__len") === 0L || col("__dup_chars").isNull, lit(0.0))
          .otherwise(least(lit(1.0),
            col("__dup_chars").cast("double") / col("__len").cast("double"))))
        .as(s"dup_${n}gram_char_frac"))
  }

  /** The fused n-gram half of the Gopher gate: per-id
    * `(__top_chars, __dup_chars)` — the top-2-gram and dup-5-gram
    * character masses — from ONE tokenize + ONE explode + the usual two
    * keyed aggregates, where the per-width formulation
    * ([[topNgramCharFrac]] + [[dupNgramCharFrac]]) pays two explodes,
    * four shuffles and two join-backs. Both widths ride the same
    * tagged explode: `(n, gram)` structs, counted per (id, n, gram),
    * then conditionally aggregated per id. Documents with no grams at
    * either width simply have no rows here (left-join and null→0.0 at
    * the consumer, exactly like the per-width originals).
    */
  private[ops] def ngramCharAgg(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.functions.TextFunctions.wsTokens(col(textCol))
    docs
      .select(col(idCol).as("id"),
        explode(concat(
          transform(ngramsFromToks(toks, 2), g => struct(lit(2).as("n"), g.as("gram"))),
          transform(ngramsFromToks(toks, 5), g => struct(lit(5).as("n"), g.as("gram"))))).as("ng"))
      .groupBy(col("id"), col("ng.n").as("n"), col("ng.gram").as("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"))
      .agg(
        // top-2-gram election: same (cnt, len, gram) max-struct tiebreak
        // as topNgramCharFrac
        max(when(col("n") === 2,
          struct(col("cnt"), length(col("gram")).as("glen"), col("gram")))).as("__top"),
        sum(when(col("n") === 5 && col("cnt") >= 2L,
          col("cnt") * length(col("gram")).cast("long"))).as("__dup_chars"))
      .select(col("id"),
        (col("__top.cnt") * col("__top.glen").cast("long")).as("__top_chars"),
        col("__dup_chars"))
  }

  /** Gopher-style repetition gate: line stats + top-2-gram + dup-5-gram
    * fractions, with a `keep` verdict under the published-shaped
    * thresholds (Rae et al. '21 use 0.30 / 0.20 for the line family,
    * 0.20 for top-2-grams, 0.15 at 5-grams). Returns the id, the four
    * fractions, and `keep` — compose with an anti/semi join (or
    * `filter(col("keep"))` + join back) to apply. The two n-gram
    * families share one explode ([[ngramCharAgg]]); values are
    * identical to the per-width operators, which remain for callers
    * needing a single width.
    */
  /** The FUSED Gopher repetition gate: per-row line fractions appended in
    * place (no join), both n-gram families on ONE tagged explode, the
    * verdict applied in one id-keyed left join — returns `docs`' rows
    * that pass, original columns preserved. Values are identical to
    * [[gopherStats]]' keep flag row for row (CurationSpec pins it); this
    * is the single definition the composed pipeline ([[Curate]]) and the
    * stage-timing diagnostic both call, so the thresholds and the plan
    * shape can never drift apart between them.
    */
  def fusedGopherFiltered(docs: DataFrame, idCol: String, textCol: String,
      lineSep: String = "\n",
      maxDupLineFrac: Double = 0.30, maxDupLineCharFrac: Double = 0.20,
      maxTop2GramCharFrac: Double = 0.20, maxDup5GramCharFrac: Double = 0.15): DataFrame = {
    val docCols = docs.columns.map(col)
    withLineStats(docs, textCol, lineSep)
      .withColumn("__len", length(col(textCol)).cast("long"))
      .join(ngramCharAgg(docs, idCol, textCol).withColumnRenamed("id", "__ngid"),
        col(idCol) === col("__ngid"), "left")
      .filter(
        col("dup_line_frac") <= maxDupLineFrac &&
          col("dup_line_char_frac") <= maxDupLineCharFrac &&
          round4(when(col("__len") === 0L || col("__top_chars").isNull, lit(0.0))
            .otherwise(col("__top_chars").cast("double") / col("__len").cast("double")))
            <= maxTop2GramCharFrac &&
          round4(when(col("__len") === 0L || col("__dup_chars").isNull, lit(0.0))
            .otherwise(col("__dup_chars").cast("double") / col("__len").cast("double")))
            <= maxDup5GramCharFrac)
      .select(docCols: _*)
  }

  def gopherStats(docs: DataFrame, idCol: String, textCol: String,
      lineSep: String = "\n",
      maxDupLineFrac: Double = 0.30, maxDupLineCharFrac: Double = 0.20,
      maxTop2GramCharFrac: Double = 0.20, maxDup5GramCharFrac: Double = 0.15): DataFrame = {
    val lineStats = withLineStats(docs, textCol, lineSep)
      .select(col(idCol), col("dup_line_frac"), col("dup_line_char_frac"),
        length(col(textCol)).cast("long").as("__len"))
    lineStats
      .join(ngramCharAgg(docs, idCol, textCol).withColumnRenamed("id", "__ngid"),
        col(idCol) === col("__ngid"), "left")
      .select(col(idCol), col("dup_line_frac"), col("dup_line_char_frac"),
        round4(when(col("__len").isNull || col("__len") === 0L || col("__top_chars").isNull,
            lit(0.0))
          .otherwise(least(lit(1.0),
            col("__top_chars").cast("double") / col("__len").cast("double"))))
          .as("top_2gram_char_frac"),
        round4(when(col("__len").isNull || col("__len") === 0L || col("__dup_chars").isNull,
            lit(0.0))
          .otherwise(least(lit(1.0),
            col("__dup_chars").cast("double") / col("__len").cast("double"))))
          .as("dup_5gram_char_frac"))
      .withColumn("keep",
        col("dup_line_frac") <= maxDupLineFrac &&
          col("dup_line_char_frac") <= maxDupLineCharFrac &&
          col("top_2gram_char_frac") <= maxTop2GramCharFrac &&
          col("dup_5gram_char_frac") <= maxDup5GramCharFrac)
  }

  /** The stop words of Gopher's "must contain at least two" rule
    * (Rae et al. '21 table A1).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The NON-repetition half of Gopher's table-A1 quality filters —
    * document-shape rules published alongside the repetition gate
    * ([[gopherStats]]): word-count bounds, mean-word-length bounds,
    * symbol-to-word ratio (`#` and ellipsis), bullet-start and
    * ellipsis-end line fractions, alphabetic-word fraction, and the
    * ≥2-distinct-stop-words rule. Appends the stat columns plus
    * `quality_keep`.
    *
    * 100-TB shape: one shuffle-free projection — token and line arrays
    * live and die inside the row ([[graft.Canonical.bindOnce]]-bound so
    * every rule reads the SAME evaluated array; the struct stages
    * through a real column so derived fractions don't re-run the HOFs).
    * Fractions are [[round4]]-canonicalized; thresholds are the
    * published defaults.
    */
  def gopherQualityStats(docs: DataFrame, idCol: String, textCol: String = "text",
      minWords: Long = 50L, maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9, maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8, minStopwordHits: Long = 2L,
      stopwords: Seq[String] = GopherStopwords): DataFrame = {
    val text = col(textCol)
    val tokStats = graft.Canonical.bindOnce(TextStats.tokens(text)) { tk =>
      struct(
        size(tk).cast("long").as("n"),
        aggregate(tk, lit(0L), (a, w) => a + length(w).cast("long")).as("chars"),
        size(filter(tk, t => t.rlike("[A-Za-z]"))).cast("long").as("alpha"),
        size(array_intersect(array_distinct(transform(tk, t => lower(t))),
          array(stopwords.map(lit): _*))).cast("long").as("stops"))
    }
    val lineStats = graft.Canonical.bindOnce(
        filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")) { ln =>
      struct(
        size(ln).cast("long").as("n"),
        size(filter(ln, l =>
          l.startsWith("•") || l.startsWith("-") || l.startsWith("*")))
          .cast("long").as("bullet"),
        size(filter(ln, l => l.endsWith("...") || l.endsWith("…")))
          .cast("long").as("ellip"))
    }
    // '#' chars + non-overlapping "..." runs + '…' chars, counted by
    // length deltas (replace is non-overlapping left-to-right in both
    // engines)
    val symbols =
      (length(text) - length(replace(text, lit("#"), lit("")))) +
        (length(text) - length(replace(text, lit("..."), lit("")))) / 3 +
        (length(text) - length(replace(text, lit("…"), lit(""))))
    def frac(num: Column, den: Column): Column =
      round4(when(den > 0L, num.cast("double") / den.cast("double")).otherwise(lit(0.0)))
    // stageOnce, not withColumn (round 15): CollapseProject inlines a
    // withColumn's tree into EVERY downstream reference, and the HOF
    // structs are excluded from subexpression elimination — the eight
    // derived fractions would re-run the tokenize/HOF trees (and any
    // upstream text-producing chain, e.g. HTML extraction) per reference
    graft.Canonical.stageOnce(docs, Seq(
        "__gq_t" -> tokStats,
        "__gq_l" -> lineStats,
        "__gq_sym" -> symbols.cast("long")))
      .withColumn("n_words", col("__gq_t.n"))
      .withColumn("mean_word_len", frac(col("__gq_t.chars"), col("__gq_t.n")))
      .withColumn("symbol_word_ratio", frac(col("__gq_sym"), col("__gq_t.n")))
      .withColumn("bullet_line_frac", frac(col("__gq_l.bullet"), col("__gq_l.n")))
      .withColumn("ellipsis_line_frac", frac(col("__gq_l.ellip"), col("__gq_l.n")))
      .withColumn("alpha_word_frac", frac(col("__gq_t.alpha"), col("__gq_t.n")))
      .withColumn("stopword_hits", col("__gq_t.stops"))
      .withColumn("quality_keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen &&
          col("symbol_word_ratio") <= maxSymbolWordRatio &&
          col("bullet_line_frac") <= maxBulletLineFrac &&
          col("ellipsis_line_frac") <= maxEllipsisLineFrac &&
          col("alpha_word_frac") >= minAlphaWordFrac &&
          col("stopword_hits") >= minStopwordHits)
      .drop("__gq_t", "__gq_l", "__gq_sym")
  }
}
