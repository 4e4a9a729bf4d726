package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DimShipping + FactShippingEvent builders (reference `etl/main.py:214-264`).
  *
  * All joins are left outer equi-joins with null-rejecting `===` (the
  * reference's `=`; a null key never matches, even against an all-null dim
  * row — preserved deliberately, SURVEY §2.3/J2-J4). Dims are explicitly
  * `broadcast()`-hinted: they are bounded-cardinality, so at 100 TB the fact
  * spine streams through four broadcast hash joins with zero shuffles.
  */
object FactBuilder {

  /** J1-J4 + the keyed dedup that defines shipment grain
    * (`etl/main.py:214-245`).
    */
  def dimShipping(
      flat: DataFrame,
      dimClient: DataFrame,
      dimLocation: DataFrame,
      dimState: DataFrame,
      parityDedup: Boolean = false
  ): DataFrame = {
    val joined = flat.as("d")
      .join(
        broadcast(dimClient).as("c"),
        concat_ws("_", col("d.brand_code_alpha"), col("d.sign_code")) === col("c.client_key"),
        "left")
      .join(
        broadcast(dimLocation).as("loc_col"),
        col("d.collection_codeAgence") === col("loc_col.codeAgence") &&
          col("d.collection_pays") === col("loc_col.pays") &&
          col("loc_col.location_type") === lit("collection"),
        "left")
      .join(
        broadcast(dimLocation).as("loc_del"),
        col("d.delivery_codeAgence") === col("loc_del.codeAgence") &&
          col("d.delivery_pays") === col("loc_del.pays") &&
          col("loc_del.location_type") === lit("delivery"),
        "left")
      // DimState grain is ~one row per shipment-state-change (SURVEY
      // §2.12.4) — it scales with the data, so no broadcast hint: let the
      // planner/AQE pick (broadcast at small SF, shuffled hash at 100 TB).
      .join(
        dimState.as("st"),
        col("d.state_code") === col("st.state_code") &&
          col("d.state_date") === col("st.state_date") &&
          col("d.state_nature") === col("st.state_nature") &&
          col("d.state_subcode") === col("st.state_subcode"),
        "left")

    val selected = joined.select(
      col("d.shipping_id").as("shipping_id"),
      col("c.client_id").as("client_id"),
      col("loc_col.location_id").as("collection_location_id"),
      col("loc_del.location_id").as("delivery_location_id"),
      col("st.state_id").as("state_id"),
      col("d.sav_folder").as("sav_folder"),
      col("d.is_replaced").as("is_replaced"),
      col("d.parcel_number").as("parcel_number"),
      col("d.parcel_sequence").as("parcel_sequence")
    )

    Dims.dedupByKey(
      selected,
      Seq("shipping_id"),
      selected.columns.filterNot(_ == "shipping_id").map(c => col(c).asc_nulls_first).toSeq,
      parityDedup
    ).where(col("shipping_id").isNotNull)
  }

  /** J5-J6 + the fact projection (`etl/main.py:248-264`). `event_id` is
    * `uuid()` in parity mode; deterministic mode content-addresses the row.
    */
  def fact(
      flat: DataFrame,
      dimShipping: DataFrame,
      dimDate: DataFrame,
      mode: SurrogateKeys.Mode
  ): DataFrame = {
    val eventId = mode match {
      case SurrogateKeys.UuidParity => expr("uuid()")
      case SurrogateKeys.Deterministic =>
        SurrogateKeys.key(
          SurrogateKeys.Deterministic,
          col("d.event_code"), col("d.event_sub_code"),
          date_format(col("d.event_date"), Schemas.TsFmt),
          date_format(col("d.entry_date"), Schemas.TsFmt),
          col("d.event_nature"), col("d.shipping_id"))
    }
    // DimShipping has one row per shipment — it scales with the fact, so
    // this is a genuine co-partitioned shuffle join at 100 TB (both sides
    // hash on shipping_id); only the bounded DimDate gets a broadcast hint.
    flat.as("d")
      .join(dimShipping.as("s"), col("d.shipping_id") === col("s.shipping_id"), "left")
      .join(broadcast(dimDate).as("dt"), to_date(col("d.event_date")) === col("dt.date"), "left")
      .select(
        eventId.as("event_id"),
        col("d.event_code").as("event_code"),
        col("d.event_sub_code").as("event_sub_code"),
        col("d.event_date").as("event_date"),
        col("d.entry_date").as("entry_date"),
        col("d.event_nature").as("event_nature"),
        col("s.shipping_id").as("shipping_id"),
        col("dt.date_id").as("date_id")
      )
  }
}
