package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.KpiResult

/** The reference's headline analytics (notebook `report.ipynb:173-202`):
  * filter → CASE-label → per-shipment conditional-agg pivot → day durations
  * → global KPIs. Expressed generically over (id, code, subCode, ts) so the
  * same operators run on the parcel warehouse and on the `events` testdata.
  *
  * Semantics preserved exactly (SURVEY §2.12.2-3): `when` without
  * `otherwise` yields null labels; `min(when)` picks the EARLIEST qualifying
  * event and ignores later re-deliveries; `avg` silently skips null
  * durations while `countDistinct` counts every id with ≥1 labeled event —
  * so the averages and the count run over different effective populations.
  * `completeOnly=true` opts into the documented-but-unenforced "complete
  * timing data" population.
  */
object Kpi {

  /** Label rules: (condition, label). First match wins; no match → null
    * (reference `when(...).when(...)` with no `otherwise`).
    */
  def label(df: DataFrame, rules: Seq[(Column, String)], out: String = "event_type"): DataFrame = {
    val labeled = rules.tail.foldLeft(when(rules.head._1, lit(rules.head._2))) {
      case (acc, (cond, lbl)) => acc.when(cond, lit(lbl))
    }
    df.withColumn(out, labeled)
  }

  /** Reference label rules (`report.ipynb:174-179`). */
  def parcelRules: Seq[(Column, String)] = Seq(
    (col("event_code") === "PEC" && col("event_sub_code").isin("REL", "APM"), "SENT"),
    (col("event_code") === "TRN" && col("event_sub_code").isin("REL", "APM"), "DELIVERED_TO_POINT"),
    (col("event_code") === "LIV", "PICKED_UP")
  )

  /** Per-id conditional-agg pivot (`report.ipynb:182-186`): earliest
    * qualifying timestamp per label. One hash-partition shuffle on `idCol`;
    * map-side partial aggregation makes this scale linearly.
    */
  def pivotEarliest(
      labeled: DataFrame,
      idCol: String,
      labelCol: String,
      tsCol: String,
      labels: Seq[(String, String)] // (label value, output column)
  ): DataFrame =
    labeled.groupBy(col(idCol)).agg(
      labels.head match { case (l, out) => min(when(col(labelCol) === l, col(tsCol))).as(out) },
      labels.tail.map { case (l, out) => min(when(col(labelCol) === l, col(tsCol))).as(out) }: _*
    )

  /** The idiomatic Spark equivalent of [[pivotEarliest]]:
    * `groupBy(id).pivot(label, values).agg(min(ts))`. With an explicit
    * value list the pivot is a single pass (no extra distinct-values job)
    * and produces the same result as the reference's hand-rolled
    * `min(when(...))` — equality is pinned by a test.
    */
  def pivotIdiomatic(
      labeled: DataFrame,
      idCol: String,
      labelCol: String,
      tsCol: String,
      labels: Seq[(String, String)]
  ): DataFrame = {
    val pivoted = labeled.groupBy(col(idCol))
      .pivot(labelCol, labels.map(_._1))
      .agg(min(col(tsCol)))
    labels.foldLeft(pivoted) { case (df, (value, out)) => df.withColumnRenamed(value, out) }
  }

  /** Day durations (`report.ipynb:189-195`): whole-calendar-day `datediff`,
    * null-propagating, negatives allowed (dirty data is not guarded).
    */
  def withDurations(pivoted: DataFrame): DataFrame =
    pivoted
      .withColumn("delivery_duration", datediff(col("delivered_time"), col("sent_time")))
      .withColumn("lifecycle_duration", datediff(col("picked_time"), col("sent_time")))
      .withColumn("pickup_duration", datediff(col("picked_time"), col("delivered_time")))

  /** Global KPIs (`report.ipynb:197-202`). `countDistinct` is exact, as in
    * the reference; at 100 TB prefer [[kpisApprox]] (HLL++) — the pivot
    * already guarantees ≤1 row per id, so the distinct is over unique keys
    * and `count` would be equivalent, but the reference's operator is kept.
    */
  def kpis(durations: DataFrame, idCol: String = "shipping_id", completeOnly: Boolean = false): DataFrame = {
    val base =
      if (completeOnly)
        durations.filter(
          col("sent_time").isNotNull && col("delivered_time").isNotNull && col("picked_time").isNotNull)
      else durations
    base.agg(
      avg(col("delivery_duration")).as("avg_delivery_days"),
      avg(col("lifecycle_duration")).as("avg_lifecycle_days"),
      avg(col("pickup_duration")).as("avg_pickup_days"),
      countDistinct(col(idCol)).as("total_packages")
    )
  }

  /** Scale variant: HLL++ distinct (documented alternative, SURVEY A3). */
  def kpisApprox(durations: DataFrame, idCol: String = "shipping_id"): DataFrame =
    durations.agg(
      avg(col("delivery_duration")).as("avg_delivery_days"),
      avg(col("lifecycle_duration")).as("avg_lifecycle_days"),
      avg(col("pickup_duration")).as("avg_pickup_days"),
      approx_count_distinct(col(idCol)).as("total_packages")
    )

  /** Full headline pipeline on a flat/fact-shaped frame with the parcel
    * vocabulary (`report.ipynb:173-202`), typed result.
    */
  def headline(spark: SparkSession, events: DataFrame): Dataset[KpiResult] = {
    import spark.implicits._
    val filtered = events.filter(col("event_code").isin("PEC", "TRN", "LIV"))
    val labeled = label(filtered, parcelRules)
    val pivoted = pivotEarliest(labeled, "shipping_id", "event_type", "event_date",
      Seq("SENT" -> "sent_time", "DELIVERED_TO_POINT" -> "delivered_time", "PICKED_UP" -> "picked_time"))
    kpis(withDurations(pivoted)).as[KpiResult]
  }

  /** Date bounds (`report.ipynb:215-219`). */
  def dateBounds(fact: DataFrame): DataFrame =
    fact.select(
      min(col("entry_date")).as("min_entry"),
      max(col("entry_date")).as("max_entry"),
      min(col("event_date")).as("min_event"),
      max(col("event_date")).as("max_event")
    )

  /** Star-join enrichment (`report.ipynb:81-86`): USING-style left joins
    * (Seq form dedups the key column), bounded dims broadcast.
    */
  def enrich(
      fact: DataFrame,
      dimShipping: DataFrame,
      dimClient: DataFrame,
      dimDate: DataFrame,
      dimLocation: DataFrame
  ): DataFrame =
    fact
      .join(dimShipping, Seq("shipping_id"), "left")
      .join(broadcast(dimClient), Seq("client_id"), "left")
      .join(broadcast(dimDate.withColumnRenamed("date", "event_date_dim")), Seq("date_id"), "left")
      .join(broadcast(dimLocation.withColumnRenamed("location_id", "collection_location_id")),
        Seq("collection_location_id"), "left")
      .withColumnRenamed("pays", "collection_country")
      .withColumnRenamed("codeAgence", "collection_agency")
}
