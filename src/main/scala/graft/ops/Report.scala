package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level reporting — the "dataset card" numbers every corpus
  * release publishes (docs / token / byte counts and mean quality per
  * source and language, plus rolled-up totals).
  *
  * One pass over the corpus computes every per-document stat
  * ([[TextStats.withStats]] + the BPE counter — all codegen'd
  * projections), then ONE `rollup` aggregate produces the
  * (source, language), (source), and grand-total grains together —
  * partial aggregation handles the fan-in, so the full report costs a
  * single small shuffle keyed on (source, lang) regardless of corpus
  * size.
  *
  * Quality is reported as an EXACT integer sum of 1e-4 units
  * (`floor(q·10⁴ + 0.5)` per doc, summed as BIGINT) rather than a
  * floating mean: a mean of double quality scores is reduction-order
  * sensitive in the last ulp, and a last-ulp difference at a rounding
  * boundary would break cross-engine replay — the same centi-unit
  * discipline as the LM perplexity and DSIR tables. Readers derive the
  * mean as `quality_sum_1e4 / (n_docs · 10⁴)`.
  */
object Report {

  /** Per-(source, pred_lang) dataset card with rollup totals: null group
    * columns mark the rolled-up grains exactly as SQL `ROLLUP` does.
    */
  def datasetCard(docs: DataFrame, textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val s = TextStats.withStats(docs, textCol)
      .withColumn("__bpe", TextStats.bpeTokenCount(col(textCol)))
      .withColumn("__q1e4",
        floor(col("quality_score") * 10000 + 0.5).cast("long"))
    s.rollup(col(sourceCol), col("pred_lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_ws_tokens"),
        sum(col("__bpe")).as("n_bpe_tokens"),
        sum(col("n_chars_calc")).as("n_chars"),
        sum(col("__q1e4")).as("quality_sum_1e4"))
  }

  /** PII release report: per-source URL/email/phone detection totals (+
    * the rollup grand total) from [[TextStats.piiStats]]' order-pinned
    * counts — the numbers a dataset release checklist wants before the
    * expensive NER pass is scheduled, exact integers so the whole card
    * value-oracles. One id-equi-join (counts back to source) + one
    * rollup aggregate; the scan-heavy regexp work stays in the codegen'd
    * piiStats projection.
    *
    * `is_total` is the SQL `GROUPING(source)` indicator (ADVICE r12):
    * without it, when the source column itself contains NULLs the
    * NULL-source group row and the rollup grand-total row both emit NULL
    * source and are indistinguishable — and any ordering on source alone
    * becomes nondeterministic across engines.
    */
  def piiCard(docs: DataFrame, idCol: String, textCol: String = "text",
      sourceCol: String = "source"): DataFrame =
    TextStats.piiStats(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(sourceCol)), Seq(idCol))
      .rollup(col(sourceCol))
      .agg(
        grouping(col(sourceCol)).cast("long").as("is_total"),
        count(lit(1)).as("n_docs"),
        sum(col("n_urls")).as("n_urls"),
        sum(col("n_emails")).as("n_emails"),
        sum(col("n_phones")).as("n_phones"))
}
