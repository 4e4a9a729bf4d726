package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the pretraining-pipeline pass that removes
  * training documents overlapping an evaluation set, so downstream eval
  * numbers measure generalization rather than memorization (the n-gram
  * collision method published in the GPT-3 appendix and its successors).
  *
  * Semantics: a corpus document is contaminated when it shares at least
  * `minHits` DISTINCT word n-gram shingles with any single benchmark
  * document. Shingles are distinct per document ([[Dedup.shingles]]), so
  * `hits` counts shared VOCABULARY, not repeated occurrences — a document
  * that repeats one benchmark phrase 100 times scores 1, not 100.
  *
  * Plan shape at 100 TB: both sides explode to (id, shingle) and meet in
  * ONE equi-join keyed on the shingle. The benchmark side is an eval
  * suite — thousands of documents, millions of shingles — so AQE
  * broadcasts it at runtime and the corpus side never shuffles (scan →
  * broadcast join → partial agg). No manual `broadcast()` hint: a
  * deliberately large "benchmark" (e.g. decontaminating against another
  * corpus split) must degrade to a hash join, not OOM the driver — the
  * same hazard [[Scd.merge]] was cured of.
  */
object Decontaminate {

  /** (corpus_id, bench_id, hits): every corpus×benchmark document pair
    * sharing ≥ `minHits` distinct word `n`-gram shingles.
    */
  def overlaps(corpus: DataFrame, idCol: String, text: Column,
      bench: DataFrame, benchIdCol: String, benchText: Column,
      n: Int, minHits: Long = 1L): DataFrame = {
    require(minHits >= 1, s"minHits must be >= 1, got $minHits")
    val c = corpus.select(col(idCol).as("corpus_id"),
      explode(Dedup.shingles(text, n)).as("shingle"))
    val b = bench.select(col(benchIdCol).as("bench_id"),
      explode(Dedup.shingles(benchText, n)).as("shingle"))
    c.join(b, Seq("shingle"))
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }

  /** The corpus with contaminated documents removed (anti-join on the
    * flagged id set). Column layout of `corpus` is preserved.
    */
  def clean(corpus: DataFrame, idCol: String, text: Column,
      bench: DataFrame, benchIdCol: String, benchText: Column,
      n: Int, minHits: Long = 1L): DataFrame = {
    val flagged = overlaps(corpus, idCol, text, bench, benchIdCol, benchText, n, minHits)
      .select(col("corpus_id").as(idCol)).distinct()
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
