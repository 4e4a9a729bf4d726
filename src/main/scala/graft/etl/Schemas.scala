package graft.etl

import org.apache.spark.sql.types._

/** Centralized schemas for the parcel-event pipeline.
  *
  * The event payload tree mirrors the JSON schema the reference declares at
  * `etl/main.py:86-125` (names, nesting and types are load-bearing:
  * `from_json` drops unknown fields and nulls missing ones; `state.date`
  * stays a *string* because it participates in the DimState join key,
  * `etl/main.py:230`).
  */
object Schemas {

  private def f(name: String, dt: DataType) = StructField(name, dt, nullable = true)

  val roundSchema: StructType = StructType(Seq(
    f("codeAgence", IntegerType),
    f("pays", StringType)
  ))

  val collectionSchema: StructType = StructType(Seq(
    f("prestation_code", StringType),
    f("round", roundSchema)
  ))

  val stateSchema: StructType = StructType(Seq(
    f("code", StringType),
    f("date", StringType), // intentionally string, never cast (join key)
    f("nature", StringType),
    f("sousCode", StringType)
  ))

  val shippingSchema: StructType = StructType(Seq(
    f("sign_code", StringType),
    f("brand_code_alpha", StringType),
    f("collection", collectionSchema),
    f("paid", StringType),
    f("sav_folder", BooleanType),
    f("is_replaced", BooleanType),
    f("state", stateSchema),
    f("canceled_state", StringType),
    f("shipping_id", StringType),
    f("delivery", collectionSchema),
    f("parcel_number", IntegerType),
    f("shipping_number", IntegerType),
    f("options", StringType),
    f("parcel_sequence", IntegerType)
  ))

  /** Root payload schema (reference `event_schema`, `etl/main.py:86-125`). */
  val eventSchema: StructType = StructType(Seq(
    f("event_code", StringType),
    f("event_date", TimestampType),
    f("entry_date", TimestampType),
    f("event_nature", StringType),
    f("event_sub_code", StringType),
    f("shipping", shippingSchema)
  ))

  /** JSON options used for both `from_json` and `to_json` so that timestamps
    * round-trip at full microsecond precision (the default format truncates
    * to milliseconds).
    */
  val jsonOptions: Map[String, String] = Map(
    "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS"
  )

  /** Canonical timestamp text form (6-digit µs, zero-padded) — matches
    * DuckDB `strftime(ts, '%Y-%m-%d %H:%M:%S.%f')` so content-addressed
    * keys and probe outputs agree across engines (a raw CAST trims trailing
    * zeros differently).
    */
  val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** Flat event table produced by [[Flatten.flatten]] — 21 leaves of the
    * payload tree, aliased exactly as the reference does
    * (`etl/main.py:134-161`).
    */
  val flatColumns: Seq[(String, String)] = Seq(
    "event_json.event_code" -> "event_code",
    "event_json.event_sub_code" -> "event_sub_code",
    "event_json.event_date" -> "event_date",
    "event_json.entry_date" -> "entry_date",
    "event_json.event_nature" -> "event_nature",
    "event_json.shipping.shipping_id" -> "shipping_id",
    "event_json.shipping.sign_code" -> "sign_code",
    "event_json.shipping.brand_code_alpha" -> "brand_code_alpha",
    "event_json.shipping.collection.round.codeAgence" -> "collection_codeAgence",
    "event_json.shipping.collection.round.pays" -> "collection_pays",
    "event_json.shipping.delivery.round.codeAgence" -> "delivery_codeAgence",
    "event_json.shipping.delivery.round.pays" -> "delivery_pays",
    "event_json.shipping.sav_folder" -> "sav_folder",
    "event_json.shipping.is_replaced" -> "is_replaced",
    "event_json.shipping.parcel_number" -> "parcel_number",
    "event_json.shipping.parcel_sequence" -> "parcel_sequence",
    "event_json.shipping.shipping_number" -> "shipping_number",
    "event_json.shipping.state.code" -> "state_code",
    "event_json.shipping.state.date" -> "state_date",
    "event_json.shipping.state.nature" -> "state_nature",
    "event_json.shipping.state.sousCode" -> "state_subcode"
  )
}

/** One row of the flattened event table (typed boundary for callers). */
case class FlatEvent(
    event_code: Option[String],
    event_sub_code: Option[String],
    event_date: Option[java.sql.Timestamp],
    entry_date: Option[java.sql.Timestamp],
    event_nature: Option[String],
    shipping_id: Option[String],
    sign_code: Option[String],
    brand_code_alpha: Option[String],
    collection_codeAgence: Option[Int],
    collection_pays: Option[String],
    delivery_codeAgence: Option[Int],
    delivery_pays: Option[String],
    sav_folder: Option[Boolean],
    is_replaced: Option[Boolean],
    parcel_number: Option[Int],
    parcel_sequence: Option[Int],
    shipping_number: Option[Int],
    state_code: Option[String],
    state_date: Option[String],
    state_nature: Option[String],
    state_subcode: Option[String]
)

/** The 4 headline KPIs (reference `notebooks/report.ipynb:197-202`). */
case class KpiResult(
    avg_delivery_days: Option[Double],
    avg_lifecycle_days: Option[Double],
    avg_pickup_days: Option[Double],
    total_packages: Long
)

/** One data-quality check outcome (reference `etl/main.py:21-65`). */
case class DqCheck(
    check_point: String,
    check_name: String,
    status: String,
    details: String,
    timestamp: String
)
