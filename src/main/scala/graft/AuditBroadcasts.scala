package graft

/** Plan-audit diagnostic: print every BroadcastExchange subtree head in
  * the executed plans of the heavy composed queries, to catch wrong-side
  * broadcasts caused by checkpoint-collapsed size estimates.
  *
  * Reading the output: a BroadcastExchange whose child is an
  * `AQEShuffleRead` was converted at RUNTIME from measured sizes — safe
  * at any scale (AQE won't convert a big side). A BroadcastExchange over
  * a raw Project/Filter/Scan subtree is a STATIC planner decision from
  * Catalyst estimates — fine when the estimates are honest (parquet
  * scans self-correct at scale), dangerous when the subtree is
  * checkpoint-backed (`Scan ExistingRDD` — LogicalRDD estimates are
  * unreliable and do NOT grow with the data). Two such hazards were
  * found and fixed this way: [[ops.Decontaminate.overlaps]] broadcast-
  * built the corpus shingle side, and
  * [[ops.Dedup.incrementalSemanticDedup]] broadcast-built the corpus
  * band frame; both now decide the side from bounded measured counts.
  *
  * `runMain graft.AuditBroadcasts [sfDir]`
  */
object AuditBroadcasts {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("audit-bhj")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = Seq("x48_curate_pipeline", "x21_incremental_dedup",
      "x03_dedup_minhash_lsh", "x02_dedup_ngram_jaccard", "q17_parcel_etl_fact",
      "x29_dedup_corpus", "x44_semantic_dedup", "x47_incremental_semantic",
      "x51_bloom_incremental", "x41_decontaminate", "x28_quality_prune",
      "x46_token_budget_mixture", "x52_snapshot_diff", "q13_using_chain",
      "x67_semdedup_cluster", "x69_url_dedup")
    val fns = SparkEntry.queries
    names.filter(fns.contains).foreach { n =>
      val df = fns(n)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      val ls = plan.linesIterator.toVector
      println(s"=== $n")
      ls.zipWithIndex.filter(_._1.contains("BroadcastExchange")).foreach { case (l, i) =>
        val indent = l.indexOf("BroadcastExchange")
        // first two plan lines under the exchange: takeWhile directly on
        // indentation depth — stop at the first line at or above the
        // exchange's indent, so sibling/parent subtrees never leak into
        // the printed heads (round-7 advice: a pre-filter before the
        // takeWhile misattributed lines after the subtree ended)
        val kids = ls.drop(i + 1)
          .takeWhile(x => x.length > indent && x.take(indent + 1).forall(c => ":+- |".contains(c)))
          .take(2)
        println("  BX: " + kids.map(_.trim.take(100)).mkString(" | "))
      }
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
