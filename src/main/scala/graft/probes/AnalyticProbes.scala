package graft.probes

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{AsofJoin, RangeJoin}
import graft.sources.Readers
import ParityProbes.Probe

/** Analytic-surface probes beyond the reference's own operator census:
  * window functions, CUBE/grouping, set ops, semi/anti joins, statistical
  * aggregates, string/regex functions, array higher-order functions, and
  * the two "missing Spark operators" (as-of join, binned range join) —
  * everything a user of a full analytics engine reaches for that the
  * parcel reference (SURVEY §2.5-2.8 "not present" lists) happens not to
  * use. Each carries a DuckDB oracle; the approx-sketch probe is
  * rows-only by nature (engine-specific HLL).
  */
object AnalyticProbes {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Readers.table(s, dir, n)
  private val F = "%Y-%m-%d %H:%M:%S.%f"

  // — window functions (SURVEY §2.5: absent in reference) ————————————————
  private val q26 = Probe(
    "q26_window_funcs",
    (s, dir) => {
      val wOrd = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wPrio = Window.partitionBy("o_custkey").orderBy(col("o_orderpriority").asc)
      t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(wOrd).cast("long").as("rn"),
          rank().over(wPrio).cast("long").as("prio_rank"),
          dense_rank().over(wPrio).cast("long").as("prio_dense"),
          round(lag(col("o_totalprice"), 1).over(wOrd), 4).as("prev_price"),
          lead(col("o_orderkey"), 1).over(wOrd).as("next_key"),
          round(sum(col("o_totalprice"))
            .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
            .as("running_total"),
          ntile(4).over(wOrd).cast("long").as("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  CAST(row_number() OVER w_ord AS BIGINT) AS rn,
           |  CAST(rank() OVER w_prio AS BIGINT) AS prio_rank,
           |  CAST(dense_rank() OVER w_prio AS BIGINT) AS prio_dense,
           |  round(lag(o_totalprice, 1) OVER w_ord, 4) AS prev_price,
           |  lead(o_orderkey, 1) OVER w_ord AS next_key,
           |  round(sum(o_totalprice) OVER (w_ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
           |  CAST(ntile(4) OVER w_ord AS BIGINT) AS quartile
           |FROM orders
           |WINDOW
           |  w_ord AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST),
           |  w_prio AS (PARTITION BY o_custkey ORDER BY o_orderpriority ASC NULLS FIRST)
           |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin))

  // — CUBE + grouping flags (SURVEY §2.4: absent in reference) ———————————
  private val q27 = Probe(
    "q27_cube_grouping",
    (s, dir) => t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_rows"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
           |  round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 4) AS revenue,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
           |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           |ORDER BY g_rf ASC NULLS FIRST, g_ls ASC NULLS FIRST,
           |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin))

  // — INTERSECT / EXCEPT (SURVEY §2.7: absent in reference) ——————————————
  private val q28 = Probe(
    "q28_set_ops",
    (s, dir) => {
      val custN = t(s, dir, "customer").select(col("c_nationkey").cast("long").as("nationkey"))
      val suppN = t(s, dir, "supplier").select(col("s_nationkey").cast("long").as("nationkey"))
      custN.intersect(suppN).withColumn("op", lit("intersect"))
        .unionByName(custN.except(suppN).withColumn("op", lit("except")))
        .orderBy("op", "nationkey")
    },
    Some("""SELECT nationkey, 'intersect' AS op FROM
           |  (SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
           |   INTERSECT
           |   SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
           |UNION ALL
           |SELECT nationkey, 'except' AS op FROM
           |  (SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
           |   EXCEPT
           |   SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
           |ORDER BY op ASC NULLS FIRST, nationkey ASC NULLS FIRST""".stripMargin))

  // — LEFT SEMI / LEFT ANTI joins (SURVEY §2.3: absent in reference) —————
  private val q29 = Probe(
    "q29_semi_anti_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), lit("has_orders").as("tag"))
      val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), lit("no_orders").as("tag"))
      semi.unionByName(anti).orderBy("tag", "c_custkey")
    },
    Some("""SELECT c_custkey, c_name, 'has_orders' AS tag FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
           |UNION ALL
           |SELECT c_custkey, c_name, 'no_orders' AS tag FROM customer c
           |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
           |ORDER BY tag ASC NULLS FIRST, c_custkey ASC NULLS FIRST""".stripMargin))

  // — statistical aggregates: exact percentiles, stddev/var, corr/covar ——
  private val q30 = Probe(
    "q30_stats_percentiles",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
        round(expr("percentile(l_quantity, 0.25)"), 4).as("q1_qty"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("q3_qty"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_discount")), 6).as("var_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"))
      .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           |  round(quantile_cont(l_quantity, 0.25), 4) AS q1_qty,
           |  round(quantile_cont(l_quantity, 0.75), 4) AS q3_qty,
           |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
           |  round(var_samp(l_discount), 6) AS var_disc,
           |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
           |FROM lineitem GROUP BY l_returnflag
           |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin))

  // — string / regex function family ——————————————————————————————————————
  private val q31 = Probe(
    "q31_string_regex",
    (s, dir) => t(s, dir, "customer")
      .select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("cust_digits"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("name_masked"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).cast("long").as("name_len"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("key_padded"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"),
        size(split(col("c_name"), "#")).cast("long").as("n_parts"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
           |  upper(c_mktsegment) AS seg_upper,
           |  lower(c_name) AS name_lower,
           |  regexp_extract(c_name, '([0-9]+)', 1) AS cust_digits,
           |  regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
           |  substring(c_name, 1, 8) AS name_prefix,
           |  CAST(length(c_name) AS BIGINT) AS name_len,
           |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           |  CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
           |  CAST(len(string_split(c_name, '#')) AS BIGINT) AS n_parts
           |FROM customer ORDER BY c_custkey ASC NULLS FIRST""".stripMargin))

  // — array higher-order functions over tokenized text ————————————————————
  private val q32 = Probe(
    "q32_array_hof",
    (s, dir) => {
      val toks = filter(split(col("text"), "\\s+"), x => length(x) > lit(0))
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          aggregate(toks, lit(0L), (a, x) => a + length(x)).as("total_chars"),
          array_contains(toks, "the").as("has_the"),
          array_join(slice(array_sort(toks), 1, 3), "|").as("first3_sorted"),
          array_max(transform(toks, x => length(x))).cast("long").as("max_tok_len"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (
           |  SELECT doc_id,
           |    list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS toks
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(toks) AS BIGINT) AS n_tokens,
           |  CAST(coalesce(list_aggregate(list_transform(toks, x -> len(x)), 'sum'), 0) AS BIGINT) AS total_chars,
           |  list_contains(toks, 'the') AS has_the,
           |  array_to_string(list_sort(toks)[1:3], '|') AS first3_sorted,
           |  CAST(list_max(list_transform(toks, x -> len(x))) AS BIGINT) AS max_tok_len
           |FROM tok ORDER BY doc_id ASC NULLS FIRST""".stripMargin))

  // — as-of join: last click at-or-before each purchase, per user —————————
  private val x14 = Probe(
    "x14_asof_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      AsofJoin.backward(purchases, clicks, Seq("user_id"), "ts", "click_ts", Seq("click_ts"))
        .select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), graft.etl.Schemas.TsFmt).as("ts_str"),
          date_format(col("click_ts"), graft.etl.Schemas.TsFmt).as("last_click_ts"))
        .orderBy("event_id")
    },
    Some(s"""SELECT p.event_id, p.user_id, strftime(p.ts, '$F') AS ts_str,
            |  strftime((SELECT max(c.ts) FROM events c
            |            WHERE c.user_id = p.user_id AND c.event_type = 'click'
            |              AND c.ts <= p.ts), '$F') AS last_click_ts
            |FROM events p WHERE p.event_type = 'purchase'
            |ORDER BY event_id ASC NULLS FIRST""".stripMargin))

  // — binned range join: events binned into overlapping value intervals ——
  private val x15 = Probe(
    "x15_range_join_binned",
    (s, dir) => {
      val ranges = s.range(0, 20).select(
        col("id").as("range_id"),
        (col("id") * 25.0).as("lo"),
        (col("id") * 25.0 + 30.0).as("hi"))
      RangeJoin.pointInRange(
          t(s, dir, "events").select(col("event_id"), col("value")),
          "value", ranges, "lo", "hi", binWidth = 16.0)
        .groupBy("range_id")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
        .orderBy("range_id")
    },
    Some("""WITH ranges AS (
           |  SELECT r AS range_id, r * 25.0 AS lo, r * 25.0 + 30.0 AS hi
           |  FROM generate_series(0, 19) t(r))
           |SELECT range_id, CAST(count(*) AS BIGINT) AS n,
           |  round(sum(value), 4) AS total_value
           |FROM ranges JOIN events ON value BETWEEN lo AND hi
           |GROUP BY range_id ORDER BY range_id ASC NULLS FIRST""".stripMargin))

  // — HLL sketch distinct, gated by a derived-metric oracle: the sketch
  //   value is engine-specific, but |approx − exact| / exact ≤ 5% (the
  //   sketch's default rsd) is a pinned invariant, and DuckDB recomputes
  //   the exact counts (measured relative error 0.7% at sf0.01). ——————————
  private val x16 = Probe(
    "x16_approx_distinct",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("__approx"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("__approx") - col("exact_users")).cast("double") / col("exact_users") <= 0.05)
          .as("within_5pct"))
      .orderBy("event_type"),
    Some("""SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           |  TRUE AS within_5pct
           |FROM events GROUP BY event_type
           |ORDER BY event_type ASC NULLS FIRST""".stripMargin))

  val all: Seq[Probe] = Seq(q26, q27, q28, q29, q30, q31, q32, x14, x15, x16)
}
