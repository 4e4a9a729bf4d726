package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full pretraining-corpus curation pipeline composed from the
  * engine's curation operators, in the order a production pipeline runs:
  *
  *   1. PII scrub (URLs → emails → phones, [[TextStats.scrub]]);
  *   2. text stats + ABSOLUTE quality gate ([[TextStats.withStats]]).
  *      Absolute, not the per-language fraction cut: a fraction cut's
  *      result depends on what other stages have already removed, so it
  *      belongs at the recipe layer ([[TextStats.qualityPrune]] /
  *      [[TextStats.qualityPruneApprox]]), not inside the composition;
  *   3. Gopher repetition gate ([[Repetition.gopherStats]] `keep`);
  *   4. exact dedup, min id survives ([[Dedup.exactKeepFirst]]);
  *   5. near-dup removal: n-gram Jaccard pairs → connected components →
  *      drop non-canonical members ([[Dedup.dedupCorpusExact]]; swap the
  *      MinHash pair stage in at 100 TB — the cluster/drop tail is
  *      identical);
  *   6. benchmark decontamination ([[Decontaminate.clean]]).
  *
  * Per-document gates (2-3) run before the pair stages (4-6) so the
  * expensive self-joins see the smallest possible corpus; decontamination
  * runs last so it scans only the deduped survivor set. Returns the
  * surviving rows with scrubbed text plus the [[TextStats.withStats]]
  * columns.
  */
object Curate {

  /** Stage parameters; defaults are the published-shaped gates used by
    * the individual operators. `pinStages` controls the stage-boundary
    * `localCheckpoint`s (see [[run]]): `true` (default) trades eager
    * execution and executor-loss recomputability for one-corpus-scan-per-
    * stage; set `false` for a fully lazy, lineage-recoverable plan (each
    * stage subtree may then re-execute once per downstream consumer).
    */
  final case class Config(
      minQuality: Double = 0.0,
      repetitionGate: Boolean = true,
      lineSep: String = "\n",
      dedupNgram: Int = 3,
      dedupThreshold: Double = 0.5,
      decontamNgram: Int = 3,
      decontamMinHits: Long = 2L,
      pinStages: Boolean = true)

  /** Stage boundaries are pinned with eager `localCheckpoint`s: each stage
    * consumes its predecessor's output SEVERAL times (the repetition gate
    * joins `gated` against stats computed FROM `gated`; near-dup removal
    * builds a shingle index from `exactKept` and then anti-joins
    * `exactKept` against the drop set), so an unpinned composition
    * re-executes the regex-heavy scrub+stats subtree once per consumer
    * (cost-neutral at bench scale where exchange reuse hides most of it,
    * but the re-executed subtree grows with every consumer and with
    * per-document cost — at 100 TB the pin is the difference between one
    * corpus scan per stage and one per stage-consumer). localCheckpoint
    * rather than `persist()` keeps the stage outputs off the SQL cache
    * manager (nothing for the caller to release; the ContextCleaner
    * reclaims the blocks when the returned plan is dropped). The 100-TB
    * deployment shape is the same discipline with durable storage: write
    * each stage boundary to parquet and read it back — exactly what the
    * streaming ingest sink does per micro-batch.
    *
    * Trade-offs of the pin (`cfg.pinStages`, default on): localCheckpoint
    * is EAGER — jobs fire at call time even if the returned plan is never
    * acted on — and checkpointed blocks are NOT recomputable on executor
    * loss (a lost block fails downstream actions instead of re-deriving
    * from lineage). On preemptible/spot clusters prefer
    * `pinStages = false` (lazy, lineage-recoverable, pays repeated stage
    * subtrees) or the durable parquet-per-stage deployment shape above.
    */
  def run(docs: DataFrame, idCol: String, textCol: String,
      bench: Option[(DataFrame, String, String)] = None,
      cfg: Config = Config()): DataFrame = {
    def pin(df: DataFrame): DataFrame = if (cfg.pinStages) df.localCheckpoint() else df
    val scrubbed = docs.withColumn(textCol, TextStats.scrub(col(textCol)))
    val stats = TextStats.withStats(scrubbed, textCol)
    val gated = pin(stats.filter(col("quality_score") >= cfg.minQuality))
    val afterRep =
      if (!cfg.repetitionGate) gated
      else gated.join(
        Repetition.gopherStats(gated, idCol, textCol, cfg.lineSep)
          .filter(col("keep")).select(col(idCol)),
        Seq(idCol), "left_semi")
    val exactKept = pin(Dedup.exactKeepFirst(afterRep, Seq(textCol), idCol))
    val nearKept = Dedup.dedupCorpusExact(exactKept, idCol, col(textCol),
      cfg.dedupNgram, cfg.dedupThreshold)
    bench match {
      case Some((b, bid, btext)) =>
        Decontaminate.clean(nearKept, idCol, col(textCol), b, bid, col(btext),
          cfg.decontamNgram, cfg.decontamMinHits)
      case None => nearKept
    }
  }
}
