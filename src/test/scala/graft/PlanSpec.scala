package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analytics.Kpi
import graft.etl._
import graft.probes.EventsVocab
import graft.sources.Readers

/** Physical-plan audits: the optimizations the 100-TB design depends on
  * must actually fire — filters reach the parquet scan, projections prune
  * the read schema, bounded dims broadcast, pipelines stay inside
  * whole-stage codegen.
  */
class PlanSpec extends SparkSpec {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("predicate pushdown: a filter on a stored column reaches the parquet scan") {
    val plan = physical(
      Readers.table(spark, sf0001, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_quantity")))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan)
  }

  test("column pruning: a 2-column projection reads only those columns (+filter col)") {
    val plan = physical(
      Readers.table(spark, sf0001, "lineitem").select(col("l_orderkey"), col("l_quantity")))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"), readSchema)
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"),
      s"scan must not read unused columns: $readSchema")
  }

  test("star-join enrichment: bounded dims join via BroadcastHashJoin") {
    val flat = Flatten(EventsVocab.synth(Readers.table(spark, sf0001, "events")))
    val dimClient = Dims.client(flat, SurrogateKeys.Deterministic)
    val dimLocation = Dims.location(flat, SurrogateKeys.Deterministic)
    val dimState = Dims.state(flat, SurrogateKeys.Deterministic)
    val plan = physical(FactBuilder.dimShipping(flat, dimClient, dimLocation, dimState))
    val broadcasts = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 3, s"client + 2x location joins must broadcast, got $broadcasts:\n$plan")
  }

  test("KPI pipeline stays inside whole-stage codegen") {
    val flatShaped = Readers.table(spark, sf0001, "events").select(
      EventsVocab.code.as("event_code"), EventsVocab.sub.as("event_sub_code"),
      col("ts").as("event_date"), EventsVocab.shippingId.as("shipping_id"))
    val df = Kpi.headline(spark, flatShaped).toDF()
    df.collect() // materialize so AQE finalizes the plan (isFinalPlan=true)
    val plan = physical(df)
    assert(plan.contains("*("), s"'*(n)' whole-stage marker expected:\n$plan")
    // the pivot is a partial+final HashAggregate pair around one exchange
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2, plan)
  }

  test("vec_dot participates in whole-stage codegen (no interpreted fallback marker)") {
    val emb = Readers.table(spark, sf0001, "embeddings")
    val plan = physical(emb.select(
      graft.functions.VectorFunctions.vec_dot(col("embedding"), col("embedding")).as("d")))
    assert(plan.startsWith("*("), s"the vec_dot projection must be inside a codegen stage:\n$plan")
  }

  test("fact write path: dedup becomes a single exchange + window, no extra shuffles") {
    val flat = Flatten(EventsVocab.synth(Readers.table(spark, sf0001, "events")))
    val dimClient = Dims.client(flat, SurrogateKeys.Deterministic)
    val dimLocation = Dims.location(flat, SurrogateKeys.Deterministic)
    val dimState = Dims.state(flat, SurrogateKeys.Deterministic)
    val ship = FactBuilder.dimShipping(flat, dimClient, dimLocation, dimState)
    val exchanges = physical(ship).linesIterator.count(_.contains("Exchange hashpartitioning(shipping_id"))
    assert(exchanges == 1, s"exactly one shuffle on shipping_id for the dedup, got $exchanges")
  }
}
