package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsofJoin, RangeJoin}
import graft.sources.Readers

/** Semantics of the new analytic operators (as-of join, binned range
  * join, HLL approx-distinct tolerance) on hand-built frames — the DuckDB
  * oracles cover them at sf scale; these pin the edge cases.
  */
class AnalyticOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward: picks latest right row at-or-before, null when none") {
    val trades = Seq(("A", 10L, "t1"), ("A", 20L, "t2"), ("B", 5L, "t3"))
      .toDF("sym", "t", "trade_id")
    val quotes = Seq(("A", 8L), ("A", 15L), ("A", 20L), ("B", 9L))
      .toDF("sym", "qt")
    val out = AsofJoin.backward(trades, quotes, Seq("sym"), "t", "qt", Seq("qt"))
      .orderBy("trade_id")
      .select("trade_id", "qt").as[(String, Option[Long])].collect()
    assert(out === Array(
      ("t1", Some(8L)),   // 15 and 20 are in the future
      ("t2", Some(20L)),  // tie at exactly t=20 is visible (<= semantics)
      ("t3", None)))      // B's only quote is at 9 > 5
  }

  test("asof backward: equals a correlated-subquery reference on random data") {
    val r = new scala.util.Random(42)
    val left = (1 to 200).map(i => (s"k${r.nextInt(5)}", r.nextInt(1000).toLong, i)).toDF("k", "t", "lid")
    val right = (1 to 300).map(_ => (s"k${r.nextInt(5)}", r.nextInt(1000).toLong)).toDF("k", "rt")
    val got = AsofJoin.backward(left, right, Seq("k"), "t", "rt", Seq("rt"))
      .select("lid", "rt").as[(Int, Option[Long])].collect().toMap
    left.createOrReplaceTempView("asof_l")
    right.createOrReplaceTempView("asof_r")
    val want = spark.sql(
      """SELECT lid, (SELECT max(rt) FROM asof_r r WHERE r.k = l.k AND r.rt <= l.t)
        |FROM asof_l l""".stripMargin)
      .as[(Int, Option[Long])].collect().toMap
    assert(got === want)
  }

  test("asof forward: earliest right row at-or-after") {
    val left = Seq(("A", 10L, "x")).toDF("k", "t", "id")
    val right = Seq(("A", 9L), ("A", 10L), ("A", 30L)).toDF("k", "rt")
    val out = AsofJoin.forward(left, right, Seq("k"), "t", "rt", Seq("rt"))
      .select("rt").as[Option[Long]].head()
    assert(out === Some(10L))
  }

  test("asof: multi-column payload is row-level — all columns from the SAME matched row") {
    val left = Seq(("A", 20L, "t1")).toDF("k", "t", "id")
    // matched (latest <= 20) row has price=2, size=null; an older row has
    // size=9 — a per-column pick would leak the stale 9 into the result
    val right = Seq(
      ("A", 5L, Some(1L), Some(9L)),
      ("A", 15L, Some(2L), None)
    ).toDF("k", "rt", "price", "sz")
    val got = AsofJoin.backward(left, right, Seq("k"), "t", "rt", Seq("price", "sz"))
      .select("price", "sz").as[(Option[Long], Option[Long])].head()
    assert(got === ((Some(2L), None)))
    val fwd = AsofJoin.forward(
      Seq(("A", 1L, "t1")).toDF("k", "t", "id"),
      right, Seq("k"), "t", "rt", Seq("price", "sz"))
      .select("price", "sz").as[(Option[Long], Option[Long])].head()
    assert(fwd === ((Some(1L), Some(9L))))
  }

  test("asof: payload colliding with a left column fails fast in both directions") {
    val left = Seq(("A", 1L, 2L)).toDF("k", "t", "p")
    val right = Seq(("A", 1L, 3L)).toDF("k", "rt", "p")
    intercept[IllegalArgumentException] {
      AsofJoin.backward(left, right, Seq("k"), "t", "rt", Seq("p"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.forward(left, right, Seq("k"), "t", "rt", Seq("p"))
    }
  }

  test("range join binned: equals naive cross+filter, any bin width") {
    val points = (0 until 100).map(i => (i, i * 3.7)).toDF("pid", "v")
    val ranges = Seq((0, 10.0, 55.0), (1, 50.0, 50.0), (2, 300.0, 360.0), (3, 56.0, 20.0))
      .toDF("rid", "lo", "hi") // rid=3 is inverted → matches nothing
    val naive = points.crossJoin(ranges)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "rid").as[(Int, Int)].collect().toSet
    for (w <- Seq(1.0, 7.0, 16.0, 1000.0)) {
      val got = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi", w)
        .select("pid", "rid").as[(Int, Int)].collect().toSet
      assert(got === naive, s"binWidth=$w")
    }
  }

  test("interval overlap binned: each overlapping pair exactly once") {
    val a = Seq((1, 0.0, 10.0), (2, 20.0, 25.0), (3, 40.0, 41.0)).toDF("aid", "alo", "ahi")
    val b = Seq((10, 5.0, 22.0), (11, 24.0, 39.0), (12, 41.0, 50.0)).toDF("bid", "blo", "bhi")
    val got = RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi", 4.0)
      .select("aid", "bid").as[(Int, Int)].collect().sorted
    // (1,10): 0-10 ∩ 5-22; (2,10): 20-25 ∩ 5-22; (2,11): 20-25 ∩ 24-39; (3,12): touch at 41
    assert(got === Array((1, 10), (2, 10), (2, 11), (3, 12)))
  }

  test("percentile_approx within 2% relative error of exact percentile") {
    val li = Readers.table(spark, sf0001, "lineitem")
    val rows = li.agg(
      expr("percentile(l_extendedprice, 0.5)"),
      expr("percentile_approx(l_extendedprice, 0.5, 10000)"),
      expr("percentile(l_extendedprice, 0.95)"),
      expr("percentile_approx(l_extendedprice, 0.95, 10000)")
    ).as[(Double, Double, Double, Double)].head()
    assert(math.abs(rows._2 - rows._1) / rows._1 < 0.02, s"p50 ${rows._1} vs ${rows._2}")
    assert(math.abs(rows._4 - rows._3) / rows._3 < 0.02, s"p95 ${rows._3} vs ${rows._4}")
  }

  test("approx_count_distinct within 5% of exact at sf0.001") {
    val ev = graft.sources.Readers.table(spark, sf0001, "events")
    val rows = ev.agg(
        approx_count_distinct(col("user_id")).as("a"),
        countDistinct(col("user_id")).as("e"))
      .as[(Long, Long)].head()
    val (a, e) = rows
    assert(math.abs(a - e).toDouble / e < 0.05, s"approx $a vs exact $e")
  }

  test("asof join plan: single shuffle on the key, no join node") {
    val ev = graft.sources.Readers.table(spark, sf0001, "events")
    val l = ev.filter(col("event_type") === "purchase").select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "click").select(col("user_id"), col("ts").as("cts"))
    val plan = AsofJoin.backward(l, r, Seq("user_id"), "ts", "cts", Seq("cts"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not plan a join")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles === 1, s"expected exactly 1 hash exchange, got $shuffles\n$plan")
  }
}
