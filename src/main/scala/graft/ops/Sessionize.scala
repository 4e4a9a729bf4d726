package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization over an event log (north-star extension, SURVEY §7.6).
  *
  * Two equivalent formulations:
  *   - [[bySessionWindow]]: Spark's native `session_window` grouping —
  *     the idiomatic engine API (also works under Structured Streaming
  *     with a watermark).
  *   - [[byGaps]]: gaps-and-islands with `lag` + running sum — identical
  *     results, expressible in ANSI SQL, used for oracle verification.
  *
  * Both shuffle once on the id column; windows evaluate within partitions.
  */
object Sessionize {

  /** Native session windows: one row per (id, session) with bounds + stats. */
  def bySessionWindow(events: DataFrame, idCol: String, tsCol: String, gap: String,
      valueCol: Option[String] = None): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end")
    ) ++ valueCol.map(v => round(sum(col(v)), 4).as("total_value")).toSeq
    events
      .groupBy(col(idCol), session_window(col(tsCol), gap))
      .agg(aggs.head, aggs.tail: _*)
      .drop("session_window")
  }

  /** Gaps-and-islands: a new session starts when the gap to the previous
    * event is ≥ `gapSeconds` (same closed/open bounds as `session_window`,
    * whose window is `[start, last_event + gap)`). Returns per-session rows
    * with a deterministic per-id session index.
    */
  def byGaps(events: DataFrame, idCol: String, tsCol: String, gapSeconds: Long,
      valueCol: Option[String] = None): DataFrame = {
    val byTs = Window.partitionBy(col(idCol)).orderBy(col(tsCol))
    val flagged = events
      .withColumn("__prev", lag(col(tsCol), 1).over(byTs))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          // cast-to-double keeps sub-second precision (unix_timestamp truncates)
          col(tsCol).cast("double") - col("__prev").cast("double") >= gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("__new_session")).over(byTs.rowsBetween(Window.unboundedPreceding, 0)))
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end")
    ) ++ valueCol.map(v => round(sum(col(v)), 4).as("total_value")).toSeq
    flagged.groupBy(col(idCol), col("session_idx")).agg(aggs.head, aggs.tail: _*)
  }
}
