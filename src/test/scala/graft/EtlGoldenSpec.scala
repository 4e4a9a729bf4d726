package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.etl._
import graft.analytics.Kpi

/** End-to-end golden test: miniature reference-shaped CSV → full ETL →
  * warehouse parquet → KPIs, with hand-computed expectations (SURVEY §5.2.3).
  */
class EtlGoldenSpec extends SparkSpec {
  import spark.implicits._

  private def j(code: String, sub: String, eventDate: String, entryDate: String,
      ship: String, brand: String, sign: String): String = {
    def q(s: String) = if (s == null) "null" else s""""$s""""
    s"""{"event_code": ${q(code)}, "event_sub_code": ${q(sub)},
       | "event_date": ${q(eventDate)}, "entry_date": ${q(entryDate)}, "event_nature": "NAT",
       | "shipping": {"shipping_id": ${q(ship)}, "brand_code_alpha": ${q(brand)},
       |   "sign_code": ${q(sign)},
       |   "collection": {"prestation_code": "P", "round": {"codeAgence": 7, "pays": "FR"}},
       |   "delivery": {"round": {"codeAgence": 8, "pays": "BE"}},
       |   "sav_folder": true, "is_replaced": false,
       |   "state": {"code": "ST", "date": "2024-01-01", "nature": "N", "sousCode": "SC"},
       |   "parcel_number": 1, "shipping_number": 2, "parcel_sequence": 0}}""".stripMargin
  }

  private lazy val warehouseDir = {
    val base = Files.createTempDirectory(Paths.get(graft.TmpDir.root), "golden").toString
    val rows = Seq(
      // SH1 complete: sent d1, delivered d3, picked d6 (+ a LATER duplicate
      // delivery on d4 that min(when) must ignore)
      j("PEC", "REL", "2024-01-01 10:00:00.000000", "2024-01-01 09:00:00.000000", "SH1", "B1", "S1"),
      j("TRN", "APM", "2024-01-03 10:00:00.000000", "2024-01-03 09:00:00.000000", "SH1", "B1", "S1"),
      j("TRN", "APM", "2024-01-04 10:00:00.000000", "2024-01-04 09:00:00.000000", "SH1", "B1", "S1"),
      j("LIV", null, "2024-01-06 10:00:00.000000", "2024-01-06 09:00:00.000000", "SH1", "B1", "S1"),
      // SH2 incomplete: sent d1, picked d4 (no delivery)
      j("PEC", "APM", "2024-01-01 08:00:00.000000", "2024-01-01 07:00:00.000000", "SH2", "B1", "S1"),
      j("LIV", null, "2024-01-04 08:00:00.000000", "2024-01-04 07:00:00.000000", "SH2", "B1", "S1"),
      // SH3: TRN with sub-code outside (REL, APM) → label null, but still
      // counted in total_packages (§2.12.2 population split)
      j("TRN", "XXX", "2024-01-02 08:00:00.000000", "2024-01-02 07:00:00.000000", "SH3", null, "S1"),
      // null shipping_id with a LIV event → null pivot group, excluded from countDistinct
      j("LIV", null, "2024-01-05 08:00:00.000000", "2024-01-05 07:00:00.000000", null, "B2", "S2"),
      // null event_date → DimDate null row, J6 never matches (§2.12.5)
      j("ANN", null, null, "2024-01-05 07:00:00.000000", "SH9", "B2", "S2")
    ).map(_.replace("\n", " ")) :+ "{this is not json" // malformed → PERMISSIVE null struct

    val csvDir = s"$base/input"
    spark.createDataset(rows).toDF("event")
      .withColumn("row_id", monotonically_increasing_id().cast("string"))
      .withColumn("ingest_file", lit("golden.csv"))
      .coalesce(1)
      .write.options(Map("header" -> "true", "quote" -> "\"", "escape" -> "\"")).csv(csvDir)

    val cfg = EtlJob.Config(csvDir, s"$base/warehouse",
      dqReportPath = Some(s"$base/dq_report"),
      clock = () => "2026-01-01 00:00:00")
    EtlJob.run(spark, cfg)
    s"$base/warehouse"
  }

  test("star schema lands in parquet with expected grain") {
    val fact = spark.read.parquet(s"$warehouseDir/FactShippingEvent")
    val dimShipping = spark.read.parquet(s"$warehouseDir/DimShipping")
    val dimClient = spark.read.parquet(s"$warehouseDir/DimClient")
    assert(fact.count() == 10, "one fact row per source row incl. malformed")
    assert(dimShipping.count() == 4, "SH1, SH2, SH3, SH9 (null shipping_id dropped)")
    assert(dimShipping.select("shipping_id").distinct().count() == 4)
    assert(dimClient.count() == 2, "B1_S1 and B2_S2; (null,S1) and malformed rows filtered by the null guard")
  }

  test("referential integrity: deterministic keys close the FK loop (§2.12.1)") {
    val fact = spark.read.parquet(s"$warehouseDir/FactShippingEvent")
    val dimDate = spark.read.parquet(s"$warehouseDir/DimDate")
    val dangling = fact.filter($"date_id".isNotNull).as("f")
      .join(dimDate.as("d"), $"f.date_id" === $"d.date_id", "left_anti")
    assert(dangling.count() == 0, "every non-null fact.date_id resolves")
    // null event_date row: date_id stays null (J6 = is null-sensitive)
    assert(fact.filter($"event_date".isNull && $"date_id".isNotNull).count() == 0)
  }

  test("headline KPIs match hand computation (incl. §2.12.2 population split)") {
    val fact = spark.read.parquet(s"$warehouseDir/FactShippingEvent")
    val kpi = Kpi.headline(spark, fact).collect().head
    assert(kpi.avg_delivery_days.contains(2.0), "only SH1 has delivery: d3-d1=2 (later re-delivery ignored)")
    assert(kpi.avg_lifecycle_days.contains(4.0), "(SH1: 5, SH2: 3) avg 4")
    assert(kpi.avg_pickup_days.contains(3.0), "only SH1: d6-d3=3")
    assert(kpi.total_packages == 3, "SH1, SH2, SH3 — null shipping_id excluded, SH3 counted despite no labels")
  }

  test("completeOnly flag restricts every KPI to fully-timed shipments") {
    val fact = spark.read.parquet(s"$warehouseDir/FactShippingEvent")
    val filtered = fact.filter($"event_code".isin("PEC", "TRN", "LIV"))
    val labeled = Kpi.label(filtered, Kpi.parcelRules)
    val pivoted = Kpi.pivotEarliest(labeled, "shipping_id", "event_type", "event_date",
      Seq("SENT" -> "sent_time", "DELIVERED_TO_POINT" -> "delivered_time", "PICKED_UP" -> "picked_time"))
    val row = Kpi.kpis(Kpi.withDurations(pivoted), completeOnly = true).collect().head
    assert(row.getDouble(0) == 2.0 && row.getDouble(1) == 5.0 && row.getDouble(2) == 3.0)
    assert(row.getLong(3) == 1, "only SH1 is complete")
  }

  test("pivot yields at most one row per shipping_id (property)") {
    val fact = spark.read.parquet(s"$warehouseDir/FactShippingEvent")
    val labeled = Kpi.label(fact.filter($"event_code".isin("PEC", "TRN", "LIV")), Kpi.parcelRules)
    val pivoted = Kpi.pivotEarliest(labeled, "shipping_id", "event_type", "event_date",
      Seq("SENT" -> "sent_time", "DELIVERED_TO_POINT" -> "delivered_time", "PICKED_UP" -> "picked_time"))
    assert(pivoted.groupBy("shipping_id").count().filter($"count" > 1).count() == 0)
  }

  test("DQ report: single-pass checks with PASS/FAIL statuses and audit CSV") {
    val df = Seq((Some(1), Some("a")), (None, Some("b"))).toDF("k", "v")
    val checks = DqRunner.run(df, "T", () => "2026-01-01 00:00:00")
    assert(checks.map(_.check_name) ==
      Seq("Non-empty dataframe", "No nulls in column 'k'", "No nulls in column 'v'"))
    assert(checks.map(_.status) == Seq("PASS", "FAIL", "PASS"))
    assert(checks(1).details == "Null count: 1")
    // audit trail CSV was written by the golden run
    val report = spark.read.option("header", "true").csv(warehouseDir.replace("/warehouse", "/dq_report"))
    assert(report.count() == 8 * 4, "8 checkpoints x (1 non-empty + 3 null checks)")
  }

  test("re-run into the same warehouse: first run's frames stay live; release() sweeps its stage") {
    val base = Files.createTempDirectory(Paths.get(graft.TmpDir.root), "rerunwh").toString
    val csvDir = warehouseDir.replace("/warehouse", "/input")
    val cfg = EtlJob.Config(csvDir, s"$base/warehouse", clock = () => "2026-01-01 00:00:00")
    val first = EtlJob.run(spark, cfg)
    val factBefore = first.fact.count()
    // second run targets the SAME warehouse; a fixed stage path would
    // overwrite the files the first run's lazy frames still read from
    val second = EtlJob.run(spark, cfg)
    assert(first.stagePath.isDefined && second.stagePath.isDefined &&
      first.stagePath != second.stagePath, "stage dirs must be run-unique")
    assert(first.fact.count() == factBefore, "first run's frames re-read their own stage")
    // release sweeps exactly the released run's stage dir
    EtlJob.release(first)
    assert(!Files.exists(Paths.get(first.stagePath.get)))
    assert(second.fact.count() == factBefore, "second run unaffected by first's release")
    EtlJob.release(second)
    assert(!Files.exists(Paths.get(second.stagePath.get)))
  }

  test("uuid parity mode keeps FK closure via pinned evaluation") {
    val base = Files.createTempDirectory(Paths.get(graft.TmpDir.root), "uuidwh").toString
    val csvDir = warehouseDir.replace("/warehouse", "/input")
    val cfg = EtlJob.Config(csvDir, s"$base/warehouse",
      keyMode = SurrogateKeys.UuidParity, parityDedup = true,
      clock = () => "2026-01-01 00:00:00")
    EtlJob.run(spark, cfg)
    val fact = spark.read.parquet(s"$base/warehouse/FactShippingEvent")
    val dimDate = spark.read.parquet(s"$base/warehouse/DimDate")
    val dangling = fact.filter($"date_id".isNotNull).as("f")
      .join(dimDate.as("d"), $"f.date_id" === $"d.date_id", "left_anti")
    assert(dangling.count() == 0, "pinning each dim before fan-out preserves the written FK closure")
  }
}
