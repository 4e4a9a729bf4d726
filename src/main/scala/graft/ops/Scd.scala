package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: versioned dimension rows with
  * `valid_from` / `valid_to` / `is_current`, built from a change history
  * and maintained incrementally from change batches.
  *
  * The reference's dimensions are type-1 snapshots (each run overwrites —
  * `etl/main.py` rebuilds DimClient/DimLocation from the day's flat frame),
  * which loses history. At warehouse scale the standard upgrade is SCD2,
  * and a 100-TB store can't rebuild from raw history every day — hence
  * [[merge]], which touches only the keys present in the change batch.
  *
  * Plan shape ([[fromHistory]]): ONE hash shuffle on the business key,
  * then two window passes over the same partitioning (change-compression
  * `lag`, then `lead` for `valid_to`) — Catalyst reuses the single
  * exchange for both sorts. No global sort, no driver state.
  */
object Scd {

  /** Build the SCD2 dimension from a full change history.
    *
    * Consecutive records (per key, ordered by `tsCol` then `tieCols`)
    * whose payload is unchanged are compressed away — a re-stated value
    * opens no new version. Each surviving record becomes a version row:
    * `valid_from` = its timestamp, `valid_to` = the next version's
    * `valid_from` (null for the open version), `is_current` = open.
    *
    * Payload equality is null-safe (`<=>` on a packed struct), so a
    * null→null payload is "unchanged" and null→value opens a version.
    *
    * @param tieCols deterministic order among equal timestamps (e.g. an
    *                event id); required when `tsCol` can repeat per key.
    */
  def fromHistory(
      history: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && payloadCols.nonEmpty, "need >=1 key and >=1 payload column")
    val reserved = Seq("valid_from", "valid_to", "is_current")
    require(reserved.intersect(keyCols ++ payloadCols).isEmpty,
      s"$reserved are produced by SCD2 and cannot also be inputs")
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val payload = struct(payloadCols.map(col): _*)
    history
      .withColumn("__prev", lag(payload, 1).over(w))
      // first row per key: lag is null; a struct is itself never null, so
      // the null-safe compare is false and the row survives
      .filter(!(payload <=> col("__prev")))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ payloadCols ++ reserved).map(col): _*)
  }

  /** Apply an append-only change batch to an existing SCD2 dimension
    * without rebuilding untouched keys.
    *
    * Keys absent from the batch pass through UNREAD beyond an anti-join
    * against the changed-key set; only the affected keys' version rows
    * re-enter [[fromHistory]] together with their new changes. With a
    * daily batch of k keys over a dimension of K >> k keys, the
    * recompute is O(k·versions), not O(K).
    *
    * The changed-key joins carry NO broadcast hint: a daily batch is
    * small and AQE broadcasts it at runtime anyway, while a backfill /
    * replay batch whose key set approaches the whole dimension must NOT
    * be forced through the driver (an unconditional hint overrides the
    * size threshold and can OOM the driver). AQE picks per-run.
    *
    * Contract: the batch is APPEND-ONLY — every change timestamp is later
    * than the affected key's newest `valid_from`. (A late-arriving change
    * can land before a version that change-compression removed, which an
    * incremental rebuild cannot see; replay [[fromHistory]] over raw
    * history to backfill late data.) Timestamps should be unique per key
    * within `dim ∪ batch`: version rows carry no tie-break column, so if
    * a dim built with `tieCols` holds several versions at one timestamp,
    * the rebuild re-orders those versions by PAYLOAD VALUE (deterministic,
    * but not necessarily the original tie order).
    */
  def merge(
      dim: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val changedKeys = changes.select(keyCols.map(col): _*).distinct()
    val untouched = dim.join(changedKeys, keyCols, "left_anti")
    val affectedHist = dim
      .join(changedKeys, keyCols, "left_semi")
      .select((keyCols ++ payloadCols).map(col) :+ col("valid_from").as(tsCol): _*)
      .unionByName(changes.select((keyCols ++ payloadCols :+ tsCol).map(col): _*))
    // payload columns as tie-break: equal-ts versions (possible when the
    // dim was built with tieCols) re-order deterministically instead of
    // by partition luck
    untouched.unionByName(
      fromHistory(affectedHist, keyCols, tsCol, payloadCols, tieCols = payloadCols))
  }

  /** Late-data repair: apply an OUT-OF-ORDER batch by rebuilding only the
    * touched keys from retained raw history — the backfill path [[merge]]
    * explicitly cannot cover.
    *
    * A late record may land inside a span change-compression collapsed
    * (history A@10, A@30 compresses to one version; a late B@20 must
    * split it into A[10,20) B[20,30) A[30,∞)) — the needed A@30 row no
    * longer exists in the dim, so no dim-only computation can be correct.
    * The repair replays [[fromHistory]] over `rawHistory ∪ lateBatch`
    * RESTRICTED to the late keys (one semi-join); untouched keys pass
    * through unread. Cost is O(k · history-per-key) for k late keys, not
    * O(K) — the raw event log is the warehouse's retained source of
    * truth, read selectively.
    *
    * Property (tested): `repairLate(dim, raw, late) ≡ fromHistory(raw ∪
    * late)` for any dim built from `raw` with the same key/ts/tie spec.
    */
  def repairLate(
      dim: DataFrame,
      rawHistory: DataFrame,
      lateBatch: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payloadCols: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    val lateKeys = lateBatch.select(keyCols.map(col): _*).distinct()
    val untouched = dim.join(lateKeys, keyCols, "left_anti")
    val cols = (keyCols ++ Seq(tsCol) ++ payloadCols ++ tieCols).distinct.map(col)
    val affected = rawHistory.join(lateKeys, keyCols, "left_semi").select(cols: _*)
      .unionByName(lateBatch.select(cols: _*))
    untouched.unionByName(fromHistory(affected, keyCols, tsCol, payloadCols, tieCols))
  }
}
