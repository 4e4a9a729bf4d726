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
  * suite — thousands of documents, millions of shingles — so it
  * broadcasts and the corpus side never shuffles (scan → broadcast join
  * → partial agg).
  *
  * The broadcast SIDE is decided by evidence, not size estimates: the
  * corpus routinely arrives through checkpoint/anti-join subtrees (the
  * [[Curate.run]] composition) whose Catalyst estimates collapse below
  * the broadcast threshold, and the static planner then broadcast-builds
  * the CORPUS side — backwards locally, a driver OOM at 100 TB. So
  * [[overlaps]] probes the bench shingle side with a BOUNDED count
  * (`limit(cap+1).count()` — never scans past the cap, and never touches
  * the corpus): provably-small bench → explicit `broadcast(bench)`;
  * over the cap (decontaminating against another corpus split) → both
  * sides are hinted to a shuffled merge join, so neither unbounded side
  * ever builds an in-memory hash relation — the degradation
  * [[Scd.merge]] was cured of, now guaranteed in BOTH directions.
  */
object Decontaminate {

  /** Max bench shingle rows that still broadcast (~a few hundred MB of
    * short strings — the comfortable hashed-relation band).
    */
  val BenchBroadcastCap: Long = 5000000L

  /** (corpus_id, bench_id, hits): every corpus×benchmark document pair
    * sharing ≥ `minHits` distinct word `n`-gram shingles.
    */
  def overlaps(corpus: DataFrame, idCol: String, text: Column,
      bench: DataFrame, benchIdCol: String, benchText: Column,
      n: Int, minHits: Long = 1L,
      benchBroadcastCap: Long = BenchBroadcastCap): DataFrame = {
    require(minHits >= 1, s"minHits must be >= 1, got $minHits")
    val c = corpus.select(col(idCol).as("corpus_id"),
      explode(Dedup.shingles(text, n)).as("shingle"))
    val b = bench.select(col(benchIdCol).as("bench_id"),
      explode(Dedup.shingles(benchText, n)).as("shingle"))
    // bounded probe of the bench side only (see object scaladoc): decides
    // broadcast-vs-merge from evidence instead of subtree size estimates
    // clamp: a caller-supplied cap near Long.MaxValue must not overflow
    // the limit() Int (negative limit throws; a tiny one misclassifies)
    val probeLimit = math.min(benchBroadcastCap + 1, Int.MaxValue.toLong).toInt
    val benchIsSmall =
      b.limit(probeLimit).count() <= benchBroadcastCap
    val joined =
      if (benchIsSmall) c.join(broadcast(b), Seq("shingle"))
      else c.hint("merge").join(b.hint("merge"), Seq("shingle"))
    joined
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
