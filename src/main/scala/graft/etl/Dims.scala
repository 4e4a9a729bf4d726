package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension builders (reference `etl/main.py:166-211`).
  *
  * Each builder is a pure `DataFrame => DataFrame` so Catalyst sees one
  * declarative plan end-to-end. All dims are bounded-cardinality by
  * construction (codes, agencies, dates) — they stay broadcastable even when
  * the event table is 100 TB.
  */
object Dims {

  /** Deterministic keyed dedup: `row_number() over (partition by keys order
    * by tiebreak) = 1`. The reference's `dropDuplicates(keys)` keeps an
    * *arbitrary* row per key (SURVEY §2.12/A6) which is untestable; this
    * variant pins the choice. `parityDedup=true` restores raw
    * `dropDuplicates`.
    */
  def dedupByKey(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column], parity: Boolean): DataFrame =
    if (parity) df.dropDuplicates(keys)
    else {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }

  /** DimClient (`etl/main.py:166-172`): natural key `brand_code_alpha + "_" +
    * sign_code` via null-skipping `concat_ws` (the pre-filter rejects null
    * parts on the dim side — the probe side of the join is NOT protected,
    * preserved bug-for-bug, SURVEY §2.12.7).
    */
  def client(flat: DataFrame, mode: SurrogateKeys.Mode, parityDedup: Boolean = false): DataFrame = {
    val projected = flat
      .select(
        concat_ws("_", col("brand_code_alpha"), col("sign_code")).as("client_key"),
        col("brand_code_alpha"),
        col("sign_code")
      )
      .filter(col("brand_code_alpha").isNotNull && col("sign_code").isNotNull)
    dedupByKey(projected, Seq("client_key"), Seq(col("brand_code_alpha"), col("sign_code")), parityDedup)
      .withColumn("client_id", SurrogateKeys.key(mode, col("client_key")))
  }

  /** DimLocation (`etl/main.py:175-189`): union of collection/delivery-tagged
    * projections, whole-row distinct (deterministic — all columns are keys).
    */
  def location(flat: DataFrame, mode: SurrogateKeys.Mode): DataFrame = {
    val collectionLoc = flat.select(
      col("collection_codeAgence").as("codeAgence"),
      col("collection_pays").as("pays"),
      lit("collection").as("location_type")
    ).dropDuplicates()
    val deliveryLoc = flat.select(
      col("delivery_codeAgence").as("codeAgence"),
      col("delivery_pays").as("pays"),
      lit("delivery").as("location_type")
    ).dropDuplicates()
    collectionLoc.union(deliveryLoc)
      .dropDuplicates()
      .withColumn("location_id",
        SurrogateKeys.key(mode, col("codeAgence"), col("pays"), col("location_type")))
  }

  /** DimState (`etl/main.py:192-198`): whole-row distinct over the 4 state
    * fields; `state_date` intentionally stays a raw string (join key,
    * SURVEY §2.12.4).
    */
  def state(flat: DataFrame, mode: SurrogateKeys.Mode): DataFrame =
    flat.select(col("state_code"), col("state_date"), col("state_nature"), col("state_subcode"))
      .dropDuplicates()
      .withColumn("state_id",
        SurrogateKeys.key(mode, col("state_code"), col("state_date"), col("state_nature"), col("state_subcode")))

  /** DimDate (`etl/main.py:201-211`): calendar attributes of `to_date(
    * event_date)`; `weekday` keeps Spark `dayofweek` semantics (1=Sunday).
    * A null `event_date` yields one all-null row (SURVEY §2.12.5).
    */
  def date(flat: DataFrame, mode: SurrogateKeys.Mode): DataFrame =
    flat.select(col("event_date"))
      .withColumn("date", to_date(col("event_date")))
      .select(
        col("date"),
        year(col("date")).as("year"),
        month(col("date")).as("month"),
        dayofmonth(col("date")).as("day"),
        quarter(col("date")).as("quarter"),
        dayofweek(col("date")).as("weekday")
      )
      .dropDuplicates()
      .withColumn("date_id", SurrogateKeys.key(mode, col("date")))
}
