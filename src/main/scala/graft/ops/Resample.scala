package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: aggregate events into fixed calendar buckets
  * per key and FILL THE GAPS — a bucket with no events still appears,
  * with zero counts (and optionally last-observation-carried-forward
  * values). Dashboards, anomaly detectors, and feature pipelines all
  * assume a dense time axis; a bare `groupBy(window(...))` silently drops
  * empty buckets.
  *
  * Plan shape: one keyed aggregate (bucket counts), one tiny per-key
  * min/max aggregate that explodes into the calendar spine (`sequence`
  * with an interval step — spine size is (span/bucket) rows per key, not
  * data-sized), and one left join spine←buckets. Everything is keyed by
  * (key, bucket): hash-partitionable, AQE-able, no driver state.
  */
object Resample {

  /** Per-(key, bucket) event count and value sum over a dense per-key
    * calendar spine from the key's first to last bucket; empty buckets
    * carry `n_events = 0`, `total_value = 0.0`.
    *
    * @param unit a `date_trunc` unit that is also a valid interval step:
    *             "hour", "day", "week", "month".
    */
  def gapFilled(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      unit: String = "hour"): DataFrame = {
    require(Seq("hour", "day", "week", "month").contains(unit.toLowerCase),
      s"unit must be hour/day/week/month, got $unit")
    val bucketed = events
      .filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__v"))
    val spine = bucketed
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"), expr(s"interval 1 $unit"))).as("bucket"))
    spine
      .join(bucketed, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        coalesce(col("__v"), lit(0.0)).as("total_value"))
  }

  /** Last-observation-carried-forward: fill null `cols` with the most
    * recent non-null value per key in `tsCol` order (one shuffle on the
    * key, one window pass for all columns).
    *
    * @param tieCols deterministic order among rows sharing a timestamp
    *                (e.g. an event id) — without it, which value carries
    *                forward across a same-`tsCol` run is partition-order
    *                luck and fills differ run to run.
    */
  def locf(df: DataFrame, keyCol: String, tsCol: String, cols: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy((col(tsCol) +: tieCols.map(col)).map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
