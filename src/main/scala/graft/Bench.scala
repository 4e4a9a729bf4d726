package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: headline queries on `SPARK_GRAFT_SF_DIR` at local[32],
  * one JSON line on stdout (driver contract).
  *
  * Each query is forced through the `noop` sink so the FULL plan executes
  * (a bare `count()` would let Catalyst prune away most of the computed
  * columns and understate the work).
  */
object Bench {

  /** Headline subset: the reference's two entry points (KPI + ETL) plus
    * the heaviest scan/join/agg/extension paths.
    */
  val headline: Seq[String] = Seq(
    "q16_kpi_headline",
    "q17_parcel_etl_fact",
    "q13_using_chain",
    "q21_group_agg",
    "q08_dedup_keyed",
    "x02_dedup_ngram_jaccard",
    "x03_dedup_minhash_lsh",
    "x05_sim_topk_bruteforce",
    "x08_text_stats",
    "x09_sessionize",
    "q22_part_supplier_agg",
    "q24_jsonl_scan",
    "x12_sim_topk_ivf",
    "q26_window_funcs",
    "q33_orc_roundtrip",
    "q34_sql_text",
    "q35_grouping_sets",
    "x07_cosine_near_dup",
    "x14_asof_join",
    "q37_pivot",
    "q39_map_funcs",
    "q41_range_frame",
    "q42_lateral_join",
    "q43_variant_json",
    "x19_stratified_sample")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fns = SparkEntry.queries
    // untimed warm-up pass: janino codegen compilation + JIT warmup would
    // otherwise dominate the first queries' numbers
    headline.filter(fns.contains).foreach { name =>
      try fns(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    val results = headline.filter(fns.contains).map { name =>
      val t0 = System.nanoTime()
      try fns(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop persisted intermediates so queries are timed in isolation
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
