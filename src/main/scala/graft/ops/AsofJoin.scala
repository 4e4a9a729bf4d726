package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal point) join — an operator Spark lacks natively.
  *
  * `backward(left, right, …)` attaches, to every left row, the payload of
  * the latest right row whose timestamp is `<=` the left row's timestamp,
  * within the same key partition (the classic "state as of event time"
  * lookup: last quote before a trade, last click before a purchase).
  *
  * Implementation is the union+window formulation, NOT a join:
  * both sides are unioned, sorted per key by (ts, side) inside a single
  * window, and each left row picks up `last(payload, ignoreNulls)` from the
  * right rows that precede it. Cost model at 100 TB: ONE hash shuffle of
  * |L|+|R| rows on the key columns and a per-partition sort — no N×M
  * candidate pairs, no broadcast requirement, no range explosion. This is
  * the plan a hand-written MergeAsofJoinExec would produce, expressed with
  * stock operators so AQE/codegen still apply.
  *
  * Tie semantics: a right row at exactly left.ts IS visible (`<=`), because
  * right rows sort before left rows at equal timestamps. If multiple right
  * rows share (key, ts), the one picked among them is the last in the
  * (deterministic) sort by payload — ties are broken by the payload columns
  * themselves so replays are stable.
  *
  * Row-level semantics: the payload columns are packed into ONE struct
  * (null on the probe side) and `last/first(ignoreNulls)` is applied to the
  * struct, so all payload columns always come from the SAME matched right
  * row — a null payload value in the matched row stays null rather than
  * falling back to a stale non-null value from an older row.
  */
object AsofJoin {

  /** @param on       equi key columns present on both sides
    * @param leftTs   left timestamp/ordering column
    * @param rightTs  right timestamp/ordering column
    * @param payload  right columns to carry (must not collide with left's)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asof join needs >=1 payload column")
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload ${payload.intersect(leftCols)} collides with left columns")

    val l = left
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__asof_side", lit(1))
    val r = right.select(
      (on.map(col) :+ col(rightTs).as("__asof_ts")) ++ payload.map(col): _*)
      .withColumn("__asof_side", lit(0))

    // union the shapes; each side is null on the other's exclusive columns
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // right rows (side 0) sort before left rows at equal ts => `<=` semantics;
    // payload cols as final sort keys => deterministic among right-side ties
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy((Seq(col("__asof_ts").asc, col("__asof_side").asc) ++
        payload.map(c => col(c).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // pack once, pick once: struct is null on left rows, so ignoreNulls
    // skips them and every payload column comes from the same right row
    val packed = unioned.withColumn("__asof_p",
      last(when(col("__asof_side") === 0, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))

    packed
      .filter(col("__asof_side") === 1)
      .select((leftCols.map(col) ++
        payload.map(p => col("__asof_p").getField(p).as(p))): _*)
  }

  /** Forward variant: earliest right row with `right.ts >= left.ts`.
    * Same single-shuffle plan, window reversed.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asof join needs >=1 payload column")
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload ${payload.intersect(leftCols)} collides with left columns")

    val l = left
      .withColumn("__asof_ts", col(leftTs))
      .withColumn("__asof_side", lit(0))
    val r = right.select(
      (on.map(col) :+ col(rightTs).as("__asof_ts")) ++ payload.map(col): _*)
      .withColumn("__asof_side", lit(1))

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy((Seq(col("__asof_ts").asc, col("__asof_side").asc) ++
        payload.map(c => col(c).asc)): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val packed = unioned.withColumn("__asof_p",
      first(when(col("__asof_side") === 1, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))

    packed
      .filter(col("__asof_side") === 0)
      .select((leftCols.map(col) ++
        payload.map(p => col("__asof_p").getField(p).as(p))): _*)
  }
}
