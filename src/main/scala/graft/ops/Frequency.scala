package graft.ops

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Approximate term-frequency estimation via a count-min sketch — the
  * mergeable-sketch sibling of the HLL distinct count (x16 probe).
  *
  * Why a sketch when `groupBy(term).count()` is exact: at 100 TB the term
  * domain itself is the problem — an exact count shuffles every distinct
  * term once per occurrence-partition, and a trillion-term vocabulary
  * (n-grams, URLs, user agents) makes that shuffle THE job. The sketch
  * side-steps it: each partition folds its terms into a fixed
  * `depth × width` counter grid (codegen'd builtin aggregate, map-side
  * partial merge), the grids tree-reduce by elementwise sum, and the
  * driver receives ONE ~100 KB blob regardless of corpus size. No shuffle
  * of the domain ever happens.
  *
  * Guarantees (standard CMS, seed-deterministic): `estimate ≥ true` always,
  * and `estimate ≤ true + eps·N` with probability ≥ `confidence` per query
  * (N = total items folded in).
  *
  * Sketches with identical (eps, confidence, seed) are mergeable —
  * [[merged]] — so per-day sketches union incrementally the same way
  * [[Dedup.incrementalDedup]] avoids corpus rescans.
  */
object Frequency {

  /** Fold `term` of every row into a count-min sketch. One partial-agg
    * pass over the data; the only driver transfer is the sketch blob.
    */
  def sketch(items: DataFrame, term: Column,
      eps: Double = 1e-3, confidence: Double = 0.99, seed: Int = 7): CountMinSketch = {
    val bytes = items
      .agg(count_min_sketch(term, lit(eps), lit(confidence), lit(seed)).as("__sk"))
      .head.getAs[Array[Byte]]("__sk")
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Merge same-shaped sketches (eps/confidence/seed must match) — the
    * incremental-ingest path: fold each day once, merge the blobs. The
    * inputs are NOT mutated (`mergeInPlace` folds into a serialized COPY
    * of the first sketch), so re-merging the same day list after
    * appending a new day never double-counts.
    */
  def merged(sketches: Seq[CountMinSketch]): CountMinSketch = {
    require(sketches.nonEmpty, "need >=1 sketch")
    val out = new java.io.ByteArrayOutputStream()
    sketches.head.writeTo(out)
    val acc = CountMinSketch.readFrom(new ByteArrayInputStream(out.toByteArray))
    sketches.tail.foreach(acc.mergeInPlace)
    acc
  }

  /** Frequency estimates for a small vocabulary (driver-side contract:
    * `vocab` is the query set, not the corpus domain) without touching
    * the corpus again.
    */
  def estimates(spark: SparkSession, cms: CountMinSketch, vocab: Seq[String]): DataFrame = {
    import spark.implicits._
    vocab.map(t => (t, cms.estimateCount(t))).toDF("term", "est_n")
  }

  /** EXACT heavy hitters above a support threshold, without ever
    * shuffling the term domain — the sketch-gated exact aggregation
    * pattern (the CMS sibling of [[Dedup.incrementalExactBloom]]'s
    * Bloom gate):
    *
    *   1. fold `xxhash64(term)` keys into a count-min sketch (one pass,
    *      fixed-size grid, no shuffle);
    *   2. gate every occurrence map-side on `estimate ≥ minFreq`
    *      ([[graft.functions.CmsEstimate]], codegen'd). The sketch only
    *      over-counts, so NO true heavy hitter is dropped — exactly the
    *      Bloom no-false-negative guarantee, in frequency form;
    *   3. exact `groupBy(term).count` over the SURVIVORS — the shuffle
    *      carries partial counts of candidate terms only, not the
    *      trillion-term tail — and a final exact `≥ minFreq` filter
    *      discards the sketch's false candidates (collisions included).
    *
    * Output (term, n) is EXACT: step 3's count never sees a dropped
    * occurrence of a candidate term, and the final filter applies to
    * true counts. Two scans of the input, zero full-domain shuffles.
    */
  def heavyHitters(items: DataFrame, term: Column, minFreq: Long,
      eps: Double = 1e-3, confidence: Double = 0.99, seed: Int = 7): DataFrame = {
    require(minFreq > 0, s"minFreq must be positive, got $minFreq")
    val keyed = items.select(term.as("term"), xxhash64(term).as("__k"))
    val cms = sketch(keyed, col("__k"), eps, confidence, seed)
    keyed
      .filter(graft.functions.CmsFunctions.estimate(col("__k"), cms) >= minFreq)
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minFreq)
  }
}
