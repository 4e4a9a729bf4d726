package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact distributed quantiles WITHOUT a global sort — the dataset-card
  * statistic (exact median / p99 of document lengths, token counts,
  * quality scores) that a naive `ORDER BY` computes with a full-corpus
  * range-shuffle sort, the single most expensive plan shape at 100 TB.
  *
  * Algorithm: iterative histogram refinement (the classic distributed
  * k-th-smallest search). Per round, the candidate range `[lo, hi]` is
  * split into ≤ `buckets` fixed-width cells; one range-filtered scan
  * aggregates `(count, min, max)` per cell with MAP-SIDE combine (the
  * shuffled state is ≤ `buckets` rows per mapper, never data rows); the
  * driver walks the ≤ `buckets`-row result to find the cell containing
  * the target rank and recurses into that cell's ACTUAL `[min, max]`.
  * Each round shrinks the range width by the bucket factor, so for
  * 64-bit values and the default 2¹⁶ buckets the search terminates in at
  * most ⌈64/16⌉ = 4 rounds — 4 ever-cheaper scans (the range filter is
  * pushed down to the parquet scan) versus one full sort, no executor
  * ever holds more than its input slice, and the driver never holds more
  * than `buckets` rows.
  *
  * Rank convention: `rank` is the 1-indexed position in the ascending
  * multiset (k-th smallest, ties included). [[exactQuantiles]] maps
  * `q → max(1, ⌈q·n⌉)` with exact `BigDecimal` arithmetic — binary
  * float `q·n` can land an exact integer boundary on either side
  * (0.1 · 500 = 49.999… in doubles), and a rank off by one is a WRONG
  * exact quantile, not an approximation error.
  *
  * Contract: the value column must be integral (castable to long
  * losslessly — lengths, counts, centi-scaled scores). Doubles would
  * need the raw-bits ordering trick and are out of scope here; scale
  * fixed-point scores into longs instead (the repo-wide centi/round4
  * convention).
  */
object Quantiles {

  /** Value of the `rank`-th smallest (1-indexed) element of `valueCol`.
    * One shared scan bounds the global range, then ≤ 4 refinement rounds.
    */
  def exactRankValues(df: DataFrame, valueCol: String, ranks: Seq[Long],
      buckets: Int = 65536): Seq[(Long, Long)] = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val v = df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    val bounds = v.agg(count(lit(1)).as("n"), min(col("__v")).as("lo"),
      max(col("__v")).as("hi")).head()
    val n = bounds.getLong(0)
    require(ranks.forall(r => r >= 1 && r <= n),
      s"ranks must be within [1, $n], got ${ranks.filterNot(r => r >= 1 && r <= n)}")
    ranks.map(r => r -> searchRank(v, r, bounds.getLong(1), bounds.getLong(2), buckets))
  }

  /** (q, rank, value) rows for each requested quantile, rank =
    * `max(1, ⌈q·n⌉)` in exact decimal arithmetic. Returns a LOCAL frame
    * (the result is ≤ |qs| rows — a dataset-card scalar set, not data).
    */
  def exactQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
      buckets: Int = 65536): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    val v = df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
    // one shared scan for count AND range — no separate count pass
    val bounds = v.agg(count(lit(1)).as("n"), min(col("__v")).as("lo"),
      max(col("__v")).as("hi")).head()
    val n = bounds.getLong(0)
    if (n == 0) return Seq.empty[(Double, Long, Long)].toDF("q", "rank", "value")
    val ranks = qs.map { q =>
      // valueOf, NOT the Double constructor: BigDecimal(0.01) is the exact
      // binary expansion 0.010000…0002, whose ceil crosses integer
      // boundaries that the decimal literal 0.01 does not
      q -> (BigDecimal.valueOf(q) * BigDecimal(n))
        .setScale(0, BigDecimal.RoundingMode.CEILING).toLong.max(1L)
    }
    val byRank = ranks.map(_._2).distinct
      .map(r => r -> searchRank(v, r, bounds.getLong(1), bounds.getLong(2), buckets))
      .toMap
    ranks.map { case (q, r) => (q, r, byRank(r)) }
      .toDF("q", "rank", "value")
  }

  /** One rank search: `remaining` is the rank within the current range. */
  private def searchRank(v: DataFrame, rank: Long, lo0: Long, hi0: Long,
      buckets: Int): Long = {
    var (lo, hi, remaining) = (lo0, hi0, rank)
    var guard = 0
    while (lo < hi) {
      guard += 1
      // 64/log2(buckets) rounds suffice by the range argument; 80 is a
      // pure defect backstop, not a tuning knob
      require(guard <= 80, s"quantile refinement failed to converge on [$lo, $hi]")
      // cell width as BigInt: hi - lo overflows Long when the range spans
      // most of the 64-bit domain
      val width = BigInt(hi) - BigInt(lo) + 1
      val step = ((width + buckets - 1) / buckets).max(BigInt(1)).toLong
      // (v - lo) in decimal: same overflow hazard as the width
      val cell = floor((col("__v").cast("decimal(21,0)") - lit(lo)) / lit(step))
        .cast("long")
      val hist = v.filter(col("__v").between(lo, hi))
        .groupBy(cell.as("__c"))
        .agg(count(lit(1)).as("__n"), min(col("__v")).as("__lo"),
          max(col("__v")).as("__hi"))
        .collect() // ≤ buckets rows
        .sortBy(_.getLong(0)) // cell order restored driver-side, no sort stage
      var acc = 0L
      var found: Option[Row] = None
      val it = hist.iterator
      while (found.isEmpty && it.hasNext) {
        val row = it.next()
        val cnt = row.getLong(1)
        if (acc + cnt >= remaining) found = Some(row) else acc += cnt
      }
      val cellRow = found.getOrElse(
        throw new IllegalStateException(s"rank $remaining exceeds rows in [$lo, $hi]"))
      remaining -= acc
      lo = cellRow.getLong(2)
      hi = cellRow.getLong(3)
    }
    lo
  }
}
