package graft.probes

import org.apache.spark.sql.functions._
import graft.sources.Readers
import ParityProbes.Probe

/** Engine-surface probes: the remaining API families a full Spark-native
  * engine must expose beyond SURVEY §2's census and the analytic surface —
  * the SQL text front-end (`spark.sql` over registered views), the ORC
  * columnar format (read+write round-trip; the reference is parquet-only,
  * SURVEY §2.1 "not present" list), GROUPING SETS (the general form of
  * q27's CUBE / q22's ROLLUP), and order-insensitive collection aggregates
  * (`collect_list`/`collect_set`, canonicalized by `sort_array` so the
  * result is deterministic and oracle-comparable).
  */
object EngineProbes {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Readers.table(s, dir, n)

  // — ORC round-trip: second columnar format, predicate pushdown intact ——
  private val q33 = Probe(
    "q33_orc_roundtrip",
    (s, dir) => {
      val tmp = s"${graft.TmpDir.root}/tmp/q33_orc_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
          "l_discount", "l_returnflag", "l_linestatus")
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .filter(col("l_quantity") > 10) // pushed to the ORC scan
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          round(avg(col("l_quantity")), 4).as("avg_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows,
           |  round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 4) AS revenue,
           |  round(avg(l_quantity), 4) AS avg_qty
           |FROM lineitem WHERE l_quantity > 10
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin))

  // — SQL text front-end: same Catalyst plans from ANSI SQL (TPC-H Q3-ish) —
  private val q34Sql =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey""".stripMargin

  private val q34 = Probe(
    "q34_sql_text",
    (s, dir) => {
      Seq("customer", "orders", "lineitem")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(q34Sql + "\nORDER BY revenue DESC, l_orderkey\nLIMIT 20")
    },
    Some(q34Sql + "\nORDER BY revenue DESC NULLS LAST, l_orderkey ASC NULLS FIRST\nLIMIT 20"))

  // — GROUPING SETS: arbitrary grouping lattice (generalizes CUBE/ROLLUP) —
  private val q35 = Probe(
    "q35_grouping_sets",
    (s, dir) => t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 4).as("total_price"),
        grouping(col("o_orderstatus")).cast("long").as("g_st"),
        grouping(col("o_orderpriority")).cast("long").as("g_pr"))
      .orderBy(col("g_st"), col("g_pr"), col("o_orderstatus"), col("o_orderpriority")),
    Some("""SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           |  round(CAST(sum(o_totalprice) AS DOUBLE), 4) AS total_price,
           |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
           |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pr
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
           |ORDER BY g_st ASC NULLS FIRST, g_pr ASC NULLS FIRST,
           |  o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin))

  // — collection aggregates, canonicalized for determinism ————————————————
  private val q36 = Probe(
    "q36_collect_agg",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        array_join(sort_array(collect_list(col("event_type"))), "|").as("all_types"),
        array_join(sort_array(collect_set(col("event_type"))), "|").as("distinct_types"),
        size(collect_set(col("event_type"))).cast("long").as("n_distinct_types"))
      .orderBy("user_id"),
    Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           |  array_to_string(list_sort(array_agg(event_type)), '|') AS all_types,
           |  array_to_string(list_sort(array_agg(DISTINCT event_type)), '|') AS distinct_types,
           |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct_types
           |FROM events GROUP BY user_id ORDER BY user_id ASC NULLS FIRST""".stripMargin))

  // — relational pivot() with explicit values (idiomatic twin of the
  //   reference's hand-rolled min(when) pivot, SURVEY §2.4 note) —————————
  private val q37 = Probe(
    "q37_pivot",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "purchase", "view"))
      .agg(round(sum(col("value")), 4))
      .orderBy("user_id"),
    Some("""SELECT user_id,
           |  round(sum(CASE WHEN event_type = 'click' THEN value END), 4) AS click,
           |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase,
           |  round(sum(CASE WHEN event_type = 'view' THEN value END), 4) AS view
           |FROM events GROUP BY user_id ORDER BY user_id ASC NULLS FIRST""".stripMargin))

  // — generator/lateral-view: posexplode of tokenized text ————————————————
  private val q38 = Probe(
    "q38_posexplode",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), "\\s+"), x => length(x) > lit(0))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("tok"))
      .orderBy("doc_id", "pos"),
    Some("""SELECT doc_id,
           |  CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
           |  unnest(toks) AS tok
           |FROM (SELECT doc_id,
           |        list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
           |      FROM documents)
           |ORDER BY doc_id ASC NULLS FIRST, pos ASC NULLS FIRST""".stripMargin))

  // — MapType + map function family (absent from the reference entirely;
  //   results projected to scalars so the oracle stays engine-portable) ——
  private val q39 = Probe(
    "q39_map_funcs",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n")))))
        .as("m"))
      .select(
        col("user_id"),
        element_at(col("m"), "click").as("click_n"), // null when key absent
        size(map_keys(col("m"))).cast("long").as("n_types"),
        array_join(map_keys(col("m")), "|").as("types_sorted"),
        aggregate(map_values(col("m")), lit(0L), (a, v) => a + v).as("total_events"),
        size(map_filter(col("m"), (_, v) => v > 1)).cast("long").as("n_repeated_types"))
      .orderBy("user_id"),
    Some("""WITH per AS (
           |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
           |  FROM events GROUP BY 1, 2)
           |SELECT user_id,
           |  max(CASE WHEN event_type = 'click' THEN n END) AS click_n,
           |  CAST(count(*) AS BIGINT) AS n_types,
           |  string_agg(event_type, '|' ORDER BY event_type) AS types_sorted,
           |  CAST(sum(n) AS BIGINT) AS total_events,
           |  CAST(count(CASE WHEN n > 1 THEN 1 END) AS BIGINT) AS n_repeated_types
           |FROM per GROUP BY user_id ORDER BY user_id ASC NULLS FIRST""".stripMargin))

  // — datetime arithmetic + null-handling families (beyond the reference's
  //   F4-F9/F13 census) ————————————————————————————————————————————————————
  private val q40 = Probe(
    "q40_datetime_null_funcs",
    (s, dir) => t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
        least(col("o_totalprice"), lit(50000.0)).as("capped_price"),
        greatest(col("o_custkey"), lit(100L)).as("floored_cust"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
           |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
           |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           |  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
           |  least(o_totalprice, 50000.0) AS capped_price,
           |  greatest(o_custkey, 100) AS floored_cust
           |FROM orders ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin))

  // — RANGE window frames (value/interval-based, vs q26's ROWS frames) ———
  private val q41 = Probe(
    "q41_range_frame",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_q41")
      s.sql("""SELECT o_custkey, o_orderkey,
              |  CAST(count(*) OVER w30 AS BIGINT) AS orders_trailing_30d,
              |  round(sum(o_totalprice) OVER w30, 4) AS spend_trailing_30d,
              |  round(avg(o_totalprice) OVER wprice, 4) AS avg_within_1k
              |FROM orders_q41
              |WINDOW
              |  w30 AS (PARTITION BY o_custkey ORDER BY o_orderdate
              |          RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW),
              |  wprice AS (PARTITION BY o_custkey ORDER BY o_totalprice
              |             RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
              |ORDER BY o_custkey, o_orderkey""".stripMargin)
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  CAST(count(*) OVER w30 AS BIGINT) AS orders_trailing_30d,
           |  round(sum(o_totalprice) OVER w30, 4) AS spend_trailing_30d,
           |  round(avg(o_totalprice) OVER wprice, 4) AS avg_within_1k
           |FROM orders
           |WINDOW
           |  w30 AS (PARTITION BY o_custkey ORDER BY o_orderdate
           |          RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW),
           |  wprice AS (PARTITION BY o_custkey ORDER BY o_totalprice
           |             RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
           |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin))

  // — correlated LATERAL join (per-row dependent subquery) ————————————————
  private val q42 = Probe(
    "q42_lateral_join",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_q42")
      t(s, dir, "orders").createOrReplaceTempView("orders_q42")
      s.sql("""SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 4) AS top_price
              |FROM customer_q42 c
              |JOIN LATERAL (
              |  SELECT o_orderkey, o_totalprice FROM orders_q42
              |  WHERE o_custkey = c.c_custkey
              |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
              |ORDER BY c.c_custkey, top_price DESC, o.o_orderkey""".stripMargin)
    },
    Some("""SELECT c.c_custkey, o.o_orderkey, round(o.o_totalprice, 4) AS top_price
           |FROM customer c
           |CROSS JOIN LATERAL (
           |  SELECT o_orderkey, o_totalprice FROM orders
           |  WHERE o_custkey = c.c_custkey
           |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
           |ORDER BY c.c_custkey ASC NULLS FIRST, top_price DESC NULLS LAST,
           |  o.o_orderkey ASC NULLS FIRST""".stripMargin))

  // — VARIANT semi-structured type (Spark 4): parse once, extract typed
  //   paths lazily — the scale path for schema-on-read JSON (no full
  //   StructType declaration, binary-encoded, pushdown-friendly) —————————
  private val q43 = Probe(
    "q43_variant_json",
    (s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("events_q43")
      s.sql("""SELECT event_type,
              |  CAST(count(*) AS BIGINT) AS n,
              |  CAST(sum(variant_get(v, '$.k', 'int')) AS BIGINT) AS sum_k,
              |  CAST(count(CASE WHEN variant_get(v, '$.missing', 'string') IS NULL
              |    THEN NULL ELSE 1 END) AS BIGINT) AS n_missing_path
              |FROM (SELECT event_type, parse_json(props) AS v FROM events_q43)
              |GROUP BY event_type ORDER BY event_type""".stripMargin)
    },
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           |  CAST(0 AS BIGINT) AS n_missing_path
           |FROM events GROUP BY event_type ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  // — catalog tables: saveAsTable → ANALYZE (CBO stats) → spark.table ————
  private val q44 = Probe(
    "q44_catalog_table",
    (s, dir) => {
      val tbl = s"nation_cat_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      // a prior JVM may have left the managed location behind while this
      // session's in-memory catalog has no entry for it — clear the orphan
      val loc = java.nio.file.Paths.get(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
      t(s, dir, "nation").write.mode("overwrite").saveAsTable(tbl)
      s.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR ALL COLUMNS")
      t(s, dir, "customer")
        .join(s.table(tbl), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"), round(avg(col("c_acctbal")), 4).as("avg_bal"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust,
           |  round(avg(c_acctbal), 4) AS avg_bal
           |FROM customer JOIN nation ON c_nationkey = n_nationkey
           |GROUP BY n_name ORDER BY n_name ASC NULLS FIRST""".stripMargin))

  // — null-safe equality join (`<=>`): nulls match nulls — the deliberate
  //   contrast to the reference's null-sensitive J4 (SURVEY §2.3) —————————
  private val q45 = Probe(
    "q45_nullsafe_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      // sub-key is null for ~1/4 of rows (k % 4 == 3) — both sides share it
      val l = ev.select(EventsVocab.sub.as("subkey"), col("event_id"))
        .filter(col("event_id") % 2 === 0)
      val r = ev.select(EventsVocab.sub.as("subkey"), col("event_id").as("r_id"))
        .filter(col("event_id") % 2 === 1)
      l.join(r, l("subkey") <=> r("subkey"), "inner")
        .select(l("subkey").as("subkey"), col("event_id"), col("r_id"))
        .groupBy(col("subkey"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("event_id")).as("n_left"),
          countDistinct(col("r_id")).as("n_right"))
        .orderBy(col("subkey"))
    },
    Some(s"""WITH l AS (SELECT ${EventsVocab.subSql} AS subkey, event_id
            |          FROM events WHERE event_id % 2 = 0),
            |r AS (SELECT ${EventsVocab.subSql} AS subkey, event_id AS r_id
            |      FROM events WHERE event_id % 2 = 1)
            |SELECT l.subkey, CAST(count(*) AS BIGINT) AS n_pairs,
            |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_left,
            |  CAST(count(DISTINCT r_id) AS BIGINT) AS n_right
            |FROM l JOIN r ON l.subkey IS NOT DISTINCT FROM r.subkey
            |GROUP BY l.subkey ORDER BY l.subkey ASC NULLS FIRST""".stripMargin))

  // — Hive-style partitioned warehouse layout + partition pruning: the
  //   single biggest scan-reducer at 100 TB (a day-filter over a
  //   date-partitioned store reads only the matching directories — the
  //   filter never even reaches row groups). `PlanSpec` asserts the
  //   read-back plan prunes to 7 of 30 partitions. ——————————————————————
  private val q48 = Probe(
    "q48_partitioned_prune",
    (s, dir) => {
      val tmp = s"${graft.TmpDir.root}/tmp/q48_part_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      t(s, dir, "events")
        .withColumn("event_day", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("event_day").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("event_day").between("2024-01-08", "2024-01-14"))
        .groupBy(date_format(col("event_day").cast("date"), "yyyy-MM-dd").as("event_day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
        .orderBy("event_day", "event_type")
    },
    Some("""SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_day, event_type,
           |  CAST(count(*) AS BIGINT) AS n_events,
           |  round(sum(value), 4) AS total_value
           |FROM events
           |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
           |GROUP BY 1, 2
           |ORDER BY event_day ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin))

  // — runtime bloom-filter join pruning: when BOTH join sides are too big
  //   to broadcast (the 100-TB default), Catalyst can still build a bloom
  //   filter from the selective dim side and push it into the fact scan,
  //   so non-joining fact rows die before the shuffle. Probed in a child
  //   session so the thresholds (tuned for local fixture sizes — at real
  //   scale the defaults fire on their own) don't leak into the catalog;
  //   `PlanSpec` asserts `might_contain` lands in the fact-side scan. ————
  private val q49 = Probe(
    "q49_bloom_join_prune",
    (s, dir) => bloomSession(s, dir),
    Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lines,
           |  round(CAST(sum(l_extendedprice) AS DOUBLE), 4) AS revenue
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |WHERE o_orderpriority = '1-URGENT'
           |GROUP BY l_returnflag ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin))

  /** The q49 pipeline in a child session with runtime-filter thresholds
    * sized for the fixture (shared catalog, isolated conf — the parent
    * session's plans are untouched). Exposed for `PlanSpec`.
    */
  def bloomSession(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // both sides "big"
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    t(s2, dir, "lineitem")
      .join(t(s2, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"), round(sum(col("l_extendedprice")), 4).as("revenue"))
      .orderBy("l_returnflag")
  }

  // — bucketed co-located join: both sides written with bucketBy on the
  //   join key, so the recurring fact⋈dim join runs with NO exchange on
  //   either side (ScaleSpec asserts the plan; at 100 TB this removes the
  //   dominant shuffle from every downstream star-join). The probe drives
  //   the real saveAsTable path and oracles the join result. ——————————————
  private val q50 = Probe(
    "q50_bucketed_join",
    (s, dir) => {
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val (tl, to) = (s"lineitem_bkt_$sfx", s"orders_bkt_$sfx")
      Seq(tl, to).foreach { tbl =>
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        // clear a prior JVM's orphaned managed location (same guard as q44)
        val loc = java.nio.file.Paths.get(
          s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
        if (java.nio.file.Files.exists(loc)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      }
      graft.etl.Bucketing.writeBucketed(
        t(s, dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice"),
        tl, Seq("l_orderkey"), 8, sortCols = Seq("l_orderkey"))
      graft.etl.Bucketing.writeBucketed(
        t(s, dir, "orders").select("o_orderkey", "o_orderstatus", "o_orderpriority"),
        to, Seq("o_orderkey"), 8, sortCols = Seq("o_orderkey"))
      s.table(tl)
        .join(s.table(to), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice")), 4).as("revenue"),
          round(avg(col("l_quantity")), 4).as("avg_qty"))
        .orderBy("o_orderstatus", "o_orderpriority")
    },
    Some("""SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
           |  round(CAST(sum(l_extendedprice) AS DOUBLE), 4) AS revenue,
           |  round(avg(l_quantity), 4) AS avg_qty
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderstatus, o_orderpriority
           |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin))

  // — SCD2 dimension from a change history: the warehouse-standard upgrade
  //   of the reference's type-1 (overwrite) dims. events(user_id, ts,
  //   event_type) is read as a change stream of per-user state; the
  //   operator compresses no-change records and chains valid_from/valid_to
  //   in one key-shuffle. The oracle replays the identical lag/lead
  //   windows in ANSI SQL. ————————————————————————————————————————————————
  private val q51 = Probe(
    "q51_scd2_history",
    (s, dir) => graft.ops.Scd.fromHistory(
        t(s, dir, "events").select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
        keyCols = Seq("user_id"), tsCol = "ts",
        payloadCols = Seq("event_type"), tieCols = Seq("event_id"))
      .select(col("user_id"), col("event_type").as("state"),
        date_format(col("valid_from"), graft.etl.Schemas.TsFmt).as("valid_from"),
        date_format(col("valid_to"), graft.etl.Schemas.TsFmt).as("valid_to"),
        col("is_current"))
      .orderBy("user_id", "valid_from"),
    Some("""WITH o AS (
           |  SELECT user_id, ts, event_id, event_type,
           |    lag(event_type) OVER w AS prev,
           |    row_number() OVER w AS rn
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |c AS (SELECT * FROM o WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
           |v AS (SELECT user_id, event_type AS state, ts AS valid_from,
           |        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
           |      FROM c)
           |SELECT user_id, state,
           |  strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           |  strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           |  valid_to IS NULL AS is_current
           |FROM v
           |ORDER BY user_id ASC NULLS FIRST, valid_from ASC NULLS FIRST""".stripMargin))

  // — SCD2 LATE-DATA repair: a deterministic slice of events arrives
  //   out of order AFTER the dimension was built from the rest. merge()'s
  //   append-only contract cannot place them (change-compression already
  //   discarded the rows a late record may split); repairLate rebuilds
  //   only the touched keys from retained raw history. The oracle is SCD2
  //   over the FULL history — exactly what the repair must reproduce. ————
  private val q57 = Probe(
    "q57_scd2_late_repair",
    (s, dir) => {
      val full = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val late = full.filter(col("event_id") % 13 === 5)
      val onTime = full.filter(col("event_id") % 13 =!= 5)
      val dim = graft.ops.Scd.fromHistory(onTime,
        keyCols = Seq("user_id"), tsCol = "ts",
        payloadCols = Seq("event_type"), tieCols = Seq("event_id"))
      graft.ops.Scd.repairLate(dim, onTime, late,
          keyCols = Seq("user_id"), tsCol = "ts",
          payloadCols = Seq("event_type"), tieCols = Seq("event_id"))
        .select(col("user_id"), col("event_type").as("state"),
          date_format(col("valid_from"), graft.etl.Schemas.TsFmt).as("valid_from"),
          date_format(col("valid_to"), graft.etl.Schemas.TsFmt).as("valid_to"),
          col("is_current"))
        .orderBy("user_id", "valid_from")
    },
    Some("""WITH o AS (
           |  SELECT user_id, ts, event_id, event_type,
           |    lag(event_type) OVER w AS prev,
           |    row_number() OVER w AS rn
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
           |c AS (SELECT * FROM o WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
           |v AS (SELECT user_id, event_type AS state, ts AS valid_from,
           |        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
           |      FROM c)
           |SELECT user_id, state,
           |  strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           |  strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           |  valid_to IS NULL AS is_current
           |FROM v
           |ORDER BY user_id ASC NULLS FIRST, valid_from ASC NULLS FIRST""".stripMargin))

  // — range-partitioned sorted store: `repartitionByRange` + in-partition
  //   sort gives every file a tight min/max on the sort column, so a
  //   selective filter decompresses only the 1-2 overlapping files — the
  //   z-order-lite layout for the single-column case. ScaleSpec asserts
  //   the read-side file skip; the oracle checks the aggregation. ————————
  private val q52 = Probe(
    "q52_sorted_store_prune",
    (s, dir) => {
      val tmp = s"${graft.TmpDir.root}/tmp/q52_sorted_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .repartitionByRange(8, col("value"))
        .sortWithinPartitions("value")
        .write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("value").between(100.0, 140.0))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("total_value"),
          round(avg(col("value")), 4).as("avg_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           |  round(sum(value), 4) AS total_value,
           |  round(avg(value), 4) AS avg_value
           |FROM events WHERE value BETWEEN 100.0 AND 140.0
           |GROUP BY event_type ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  // — AQE skew-join split: when one join key holds most of the rows (here
  //   80% of events on key 0), the hot reducer partition is the straggler
  //   that decides the whole stage's wall-clock at 100 TB. AQE detects the
  //   oversized partition at runtime and splits it across reducers,
  //   replicating the matching build side — no salting rewrite needed.
  //   Probed in a child session (thresholds sized for the fixture; real
  //   scale trips the defaults); `PlanSpec` asserts `skew=true` lands in
  //   the executed join. The result itself is value-oracled. —————————————
  private val q53 = Probe(
    "q53_aqe_skew_join",
    (s, dir) => skewSession(s, dir),
    Some("""WITH l AS (
           |  SELECT CASE WHEN event_id % 5 != 0 THEN 0 ELSE event_id % 97 END AS k,
           |    value, event_type
           |  FROM events),
           |r AS (SELECT DISTINCT event_id % 97 AS k FROM events)
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           |  round(sum(value), 4) AS total_value
           |FROM l JOIN r USING (k)
           |GROUP BY event_type ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  /** The q53 pipeline with fixture-sized skew thresholds in an isolated
    * child session. Exposed for `PlanSpec`'s `skew=true` assertion.
    */
  def skewSession(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // both sides "big"
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "800b")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "800b")
    // fan the single-file scan across map tasks: skew splitting works at
    // map-block granularity, so a 1-mapper shuffle leaves the hot reduce
    // partition as one unsplittable block no matter the thresholds
    val ev = Readers.fanOut(t(s2, dir, "events"))
    val l = ev.select(
      when(col("event_id") % 5 =!= 0, lit(0L))
        .otherwise(pmod(col("event_id"), lit(97L))).as("k"),
      col("value"), col("event_type"))
    // fanOut again, deliberately: distinct() leaves the dim ALREADY
    // hash-partitioned on k, the join reuses that exchange, and
    // OptimizeSkewedJoin then cannot fire — it pattern-matches ONLY
    // Sort(bare shuffle stage) on BOTH sides. Exchange reuse and skew
    // splitting are mutually exclusive here; for a hot-key join, breaking
    // the build side's co-partitioning is the right trade.
    val r = Readers.fanOut(
      ev.select(pmod(col("event_id"), lit(97L)).as("k")).distinct())
    l.join(r, Seq("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
      .orderBy("event_type")
  }

  // — corrupt-record-tolerant ingest: PERMISSIVE JSONL parse with a
  //   `_corrupt_record` column. A 100-TB lake always has malformed lines;
  //   failing the job (FAILFAST) or silently dropping (DROPMALFORMED)
  //   both lose information — the permissive quarantine column is the
  //   production posture. The probe plants deterministically-malformed
  //   lines (every event_id % 10 == 3, truncated JSON) so the oracle
  //   predicts good/bad counts and the good-side aggregate exactly. ———————
  private val q54 = Probe(
    "q54_corrupt_jsonl",
    (s, dir) => {
      val tmp = s"${graft.TmpDir.root}/tmp/q54_corrupt_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      t(s, dir, "events")
        .select(
          when(col("event_id") % 10 === 3,
            concat(lit("{\"event_id\": "), col("event_id"), lit(", \"event_type\": ")))
            .otherwise(to_json(struct(col("event_id"), col("event_type"), col("value"))))
            .as("value"))
        .write.mode("overwrite").text(tmp)
      val parsed = s.read
        .schema("event_id LONG, event_type STRING, value DOUBLE, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(tmp)
        // cache contract (Spark doc'd quirk): the corrupt-record column is
        // only observable after materializing the parsed frame as a whole
        .cache()
      parsed.agg(
          count(lit(1)).as("n_lines"),
          count(col("_corrupt_record")).as("n_corrupt"),
          count(col("value")).as("n_good"),
          round(sum(col("value")), 4).as("good_total_value"))
        .select(col("n_lines"), col("n_corrupt"), col("n_good"), col("good_total_value"))
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_lines,
           |  CAST(sum(CASE WHEN event_id % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
           |  CAST(sum(CASE WHEN event_id % 10 != 3 AND value IS NOT NULL
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
           |  round(sum(CASE WHEN event_id % 10 != 3 THEN value END), 4) AS good_total_value
           |FROM events""".stripMargin))

  // — schema evolution: a v2 writer adds columns; `mergeSchema` unions the
  //   footers and v1 rows read as null in the new columns. Written as
  //   v=1/v=2 directories so partition discovery doubles as the version
  //   tag — the standard additive-evolution posture for a parquet lake
  //   (no rewrite of old data). ———————————————————————————————————————————
  private val q55 = Probe(
    "q55_schema_evolution",
    (s, dir) => {
      val tmp = s"${graft.TmpDir.root}/tmp/q55_evolve_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val ev = t(s, dir, "events")
      ev.select(col("event_id"), col("event_type"))
        .write.mode("overwrite").parquet(s"$tmp/v=1")
      ev.select(col("event_id"), col("event_type"), col("value"), col("user_id"))
        .write.mode("overwrite").parquet(s"$tmp/v=2")
      s.read.option("mergeSchema", "true").parquet(tmp)
        .groupBy(col("v"), col("event_type"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("value")).as("n_value_present"),
          round(sum(col("value")), 4).as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("v", "event_type")
    },
    Some("""WITH v1 AS (
           |  SELECT 1 AS v, event_type, CAST(NULL AS DOUBLE) AS value,
           |    CAST(NULL AS BIGINT) AS user_id
           |  FROM events),
           |v2 AS (SELECT 2 AS v, event_type, value, user_id FROM events),
           |u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
           |SELECT v, event_type, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(value) AS BIGINT) AS n_value_present,
           |  round(sum(value), 4) AS total_value,
           |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           |FROM u GROUP BY v, event_type
           |ORDER BY v ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin))

  // — small-file compaction: a 64-file write (the streaming-sink shed
  //   pattern) rewrites into ~quarter-of-total-size files through the
  //   staging + atomic-rename path; the oracle checks content is
  //   preserved EXACTLY, ScaleSpec asserts the file count actually drops.
  private val q56 = Probe(
    "q56_compaction",
    (s, dir) => {
      val tmp = s"${graft.TmpDir.root}/tmp/q56_compact_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .repartition(64) // shed 64 small files
        .write.mode("overwrite").parquet(tmp)
      graft.etl.Layout.compact(s, tmp, graft.etl.Layout.dataBytes(s, tmp) / 4)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value")), 4).as("total_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           |  round(sum(value), 4) AS total_value
           |FROM events GROUP BY event_type
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  val all: Seq[Probe] = Seq(q33, q34, q35, q36, q37, q38, q39, q40, q41, q42, q43, q44, q45,
    q48, q49, q50, q51, q52, q53, q54, q55, q56, q57)
}
