package graft

import org.apache.spark.sql.functions._

/** Stage-level timing of the x48 curation composition — where does the
  * pipeline's wall go? Each stage is forced through the noop sink after
  * the previous stage is pinned with a localCheckpoint, so a stage's
  * number is its own subtree cost, not cumulative lineage.
  *
  * `runMain graft.CurateBreakdown [sfDir]`
  */
object CurateBreakdown {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("curate-breakdown")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import graft.ops._
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[curate-breakdown] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.sources.Readers.fanOut(
      graft.sources.Readers.table(spark, dir, "documents"))
    val planted = docs.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 7 === 1, " see https://ex.com/z now").otherwise("")).as("text"))
    val bench = docs.filter(col("doc_id") % 37 === 0)
      .select(col("doc_id").as("bid"), col("text").as("btext"))
    // warm-up: codegen + JIT off the stage clocks
    Curate.run(planted, "doc_id", "text", Some((bench, "bid", "btext")),
      Curate.Config(minQuality = 0.6)).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache(); System.gc()

    // mirrors Curate.run's FUSED composition (round 8): line stats
    // per-row, both n-gram widths on one explode, shingles shared
    // between near-dup and decontamination
    val gated = timed("scrub+stats+quality gate (checkpoint)") {
      TextStats.withStats(planted.withColumn("text", TextStats.scrub(col("text"))))
        .filter(col("quality_score") >= 0.6).localCheckpoint()
    }
    // the ACTUAL fused gate — the same Repetition.fusedGopherFiltered
    // call Curate.pipeline makes, so this stage's wall can never drift
    // from the composition it diagnoses
    val afterRep = timed("fused repetition gate (checkpoint)") {
      Repetition.fusedGopherFiltered(gated, "doc_id", "text").localCheckpoint()
    }
    val exactKept = timed("exact dedup (checkpoint)") {
      Dedup.exactKeepFirst(afterRep, Seq("text"), "doc_id").localCheckpoint()
    }
    val sh = timed("  near-dup: shared shingle explode (checkpoint)") {
      Dedup.shingleTable(exactKept, "doc_id", col("text"), 3).localCheckpoint()
    }
    val pairs = timed("  near-dup: jaccard pairs (checkpoint)") {
      Dedup.ngramJaccardPairsFromShingles(sh, 0.5).localCheckpoint()
    }
    val labels = timed("  near-dup: connected components") {
      Dedup.components(pairs)
    }
    val (nearKept, survivorSh) = timed("  near-dup: drop anti-joins (checkpoint)") {
      val drop = labels.filter(col("id") =!= col("comp")).select(col("id")).localCheckpoint()
      val near = exactKept.join(drop.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
        .localCheckpoint()
      (near, sh.join(drop, Seq("id"), "left_anti")
        .select(col("id").as("corpus_id"), col("shingle")))
    }
    timed("decontaminate from shared shingles (noop write)") {
      Decontaminate.cleanFromShingles(nearKept, "doc_id", survivorSh,
          bench, "bid", col("btext"), 3, 2L)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
