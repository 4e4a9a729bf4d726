package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
      pinStages: Boolean = true,
      // optional CCNet fluency stage (a TRAINED [[Lm.Gate]], applied
      // between the repetition gate and exact dedup — the CCNet order:
      // model-based fluency after heuristics, before dedup); None = off,
      // existing compositions unchanged
      lmGate: Option[Lm.Gate] = None)

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
      cfg: Config = Config()): DataFrame =
    pipeline(docs, idCol, textCol, bench, cfg, audit = false)._1

  /** [[run]] plus per-document drop attribution — the removal-rate
    * accounting every production curation report publishes (what fraction
    * died at each gate, per Gopher/C4/FineWeb reporting convention).
    *
    * `attribution` holds EVERY input id exactly once with the first stage
    * that dropped it — `quality`, `repetition`, `disfluent` (only when
    * `cfg.lmGate` is set), `exact_dup`, `near_dup`,
    * `contaminated` — or `kept`; "first" is well-defined because stage
    * survivor sets are nested (a doc the quality gate killed is never
    * seen by the repetition gate). Built from id-only projections of the
    * stage boundaries in five id-keyed left joins: the attribution adds
    * no content shuffle at any scale, and in `pinStages` mode the extra
    * boundary consumers read the stage checkpoints instead of re-running
    * stage subtrees (the 100-TB deployment shape writes each boundary to
    * parquet and derives this same frame from the id columns for free).
    */
  def runAudited(docs: DataFrame, idCol: String, textCol: String,
      bench: Option[(DataFrame, String, String)] = None,
      cfg: Config = Config()): AuditedRun = {
    val (result, b) = pipeline(docs, idCol, textCol, bench, cfg, audit = true)
    def flag(df: DataFrame, name: String): DataFrame =
      df.select(col(idCol)).withColumn(name, lit(true))
    // the disfluent join/label only ride when the LM gate is ON (gate off
    // makes lmKept the SAME frame as afterRep — the label could never
    // fire, and the extra join would be pure cost)
    val base = docs.select(col(idCol))
      .join(flag(b.gated, "__q"), Seq(idCol), "left")
      .join(flag(b.afterRep, "__r"), Seq(idCol), "left")
    val withLm = if (b.lmKept eq b.afterRep) base
      else base.join(flag(b.lmKept, "__l"), Seq(idCol), "left")
    val lmLabel: Column => Column = w =>
      if (b.lmKept eq b.afterRep) w
      else when(col("__l").isNull, "disfluent").otherwise(w)
    val attribution = withLm
      .join(flag(b.exactKept, "__e"), Seq(idCol), "left")
      .join(flag(b.nearKept, "__n"), Seq(idCol), "left")
      .join(flag(result, "__k"), Seq(idCol), "left")
      .select(col(idCol),
        when(col("__q").isNull, "quality")
          .when(col("__r").isNull, "repetition")
          .otherwise(lmLabel(
            when(col("__e").isNull, "exact_dup")
              .when(col("__n").isNull, "near_dup")
              .when(col("__k").isNull, "contaminated")
              .otherwise(lit("kept")))).as("stage"))
    AuditedRun(result, attribution)
  }

  /** Survivors plus the (idCol, stage) attribution frame of [[runAudited]]. */
  final case class AuditedRun(survivors: DataFrame, attribution: DataFrame)

  /** Stage-boundary survivor frames captured for attribution. */
  private final case class Boundaries(
      gated: DataFrame, afterRep: DataFrame, lmKept: DataFrame,
      exactKept: DataFrame, nearKept: DataFrame)

  private def pipeline(docs: DataFrame, idCol: String, textCol: String,
      bench: Option[(DataFrame, String, String)],
      cfg: Config, audit: Boolean): (DataFrame, Boundaries) = {
    def pin(df: DataFrame): DataFrame = if (cfg.pinStages) df.localCheckpoint() else df
    // a boundary consumed once by the pipeline gains a second consumer in
    // audit mode (the attribution join) — pin those too, plus the final
    // survivor frame, so no stage subtree executes twice
    def pinIfAudit(df: DataFrame): DataFrame =
      if (audit && cfg.pinStages) df.localCheckpoint() else df
    val scrubbed = docs.withColumn(textCol, TextStats.scrub(col(textCol)))
    val stats = TextStats.withStats(scrubbed, textCol)
    val gated = pin(stats.filter(col("quality_score") >= cfg.minQuality))
    // repetition gate, fused: the LINE fractions are per-row expressions
    // appended in place (no join), and the two n-gram families ride ONE
    // tagged explode (Repetition.ngramCharAgg) instead of gopherStats'
    // per-width explode+join pair; the verdict applies in one id-keyed
    // left join. Values are identical to gopherStats — CurationSpec pins
    // the fused gate against it row for row.
    val afterRep =
      if (!cfg.repetitionGate) gated
      else Repetition.fusedGopherFiltered(gated, idCol, textCol, cfg.lineSep)
    val afterRepB = pinIfAudit(afterRep)
    // optional trained-LM fluency gate (CCNet): scan-side map-literal
    // scoring + filter — no shuffle, the stage costs one projection
    val lmKept = cfg.lmGate match {
      case Some(g) => pinIfAudit(Lm.gateFilter(afterRepB, g, textCol))
      case None => afterRepB
    }
    val exactKept = pin(Dedup.exactKeepFirst(lmKept, Seq(textCol), idCol))
    // near-dup removal + decontamination share ONE shingle table when
    // their gram widths agree (the composition's common case): the
    // explode that feeds the pair self-join is filtered down to the
    // near-dup survivors and fed straight into the decontamination join,
    // instead of re-tokenizing and re-exploding the survivor corpus.
    val (result, nearKeptB) = bench match {
      case Some((b, bid, btext)) if cfg.decontamNgram == cfg.dedupNgram =>
        val sh = Dedup.shingleTable(exactKept, idCol, col(textCol), cfg.dedupNgram)
          .localCheckpoint() // feeds pairs, verification, AND decontam
        // pin: components() consumes the pair frame twice (node set +
        // initial edges) — unpinned, the pair self-join + verification
        // would execute twice, halving the fusion's point
        val pairs = Dedup.ngramJaccardPairsFromShingles(sh, cfg.dedupThreshold)
          .localCheckpoint()
        val labels = Dedup.components(pairs, maxIter = 20)
        pairs.unpersist() // both consumers materialized inside components()
        val drop = labels
          .filter(col("id") =!= col("comp"))
          .select(col("id"))
          .localCheckpoint()
        labels.unpersist()
        val nearKept = pinIfAudit(
          exactKept.join(drop.select(col("id").as(idCol)), Seq(idCol), "left_anti"))
        val survivorSh = sh.join(drop, Seq("id"), "left_anti")
          .select(col("id").as("corpus_id"), col("shingle"))
        (Decontaminate.cleanFromShingles(nearKept, idCol, survivorSh, b, bid, col(btext),
          cfg.decontamNgram, cfg.decontamMinHits), nearKept)
      case Some((b, bid, btext)) =>
        val nearKept = pinIfAudit(Dedup.dedupCorpusExact(exactKept, idCol, col(textCol),
          cfg.dedupNgram, cfg.dedupThreshold))
        (Decontaminate.clean(nearKept, idCol, col(textCol), b, bid, col(btext),
          cfg.decontamNgram, cfg.decontamMinHits), nearKept)
      case None =>
        val nearKept = pinIfAudit(Dedup.dedupCorpusExact(exactKept, idCol, col(textCol),
          cfg.dedupNgram, cfg.dedupThreshold))
        (nearKept, nearKept)
    }
    // with no bench the survivors ARE the near-dup boundary — don't
    // checkpoint the same frame twice
    val resultB = if (result eq nearKeptB) result else pinIfAudit(result)
    (resultB, Boundaries(gated, afterRepB, lmKept, exactKept, nearKeptB))
  }

  /** The WEB pre-cleaning pipeline — the metadata+markup stages a
    * crawled corpus runs BEFORE [[run]]'s content pipeline:
    *
    *   1. URL-keyed dedup ([[Urls.dedupByUrl]] — recrawls and
    *      tracking-param variants die on the canonical URL, no content
    *      ever hashed);
    *   2. URL/provenance gate ([[Urls.filterBlocked]]);
    *   3. HTML-to-text extraction ([[Html.extractText]], markup column
    *      dropped);
    *   4. Gopher document-shape rules
    *      ([[Repetition.gopherQualityStats]] `quality_keep`);
    *   5. hashed linear quality classifier
    *      ([[Classify.filterLowQuality]]).
    *
    * Provenance cuts run FIRST so the HTML bytes of blocked and
    * duplicate pages are never parsed — at 100 TB the regex chain is
    * the expensive stage and stages 1-2 shrink its input for free
    * (stage 1's digest aggregate is the composition's only shuffle;
    * 2-5 are scan-side projections/filters). Returns survivors with
    * `textCol` holding the extracted text and the caller's other
    * columns intact.
    */
  def webPreclean(docs: DataFrame, idCol: String, urlCol: String, htmlCol: String,
      textCol: String = "text",
      minWords: Long = 50L,
      minStopwordHits: Long = 2L,
      clfMinMeanCenti: Long = 0L): DataFrame =
    precleanStages(docs, idCol, urlCol, htmlCol, textCol,
      minWords, minStopwordHits, clfMinMeanCenti, identity).last._2

  /** [[webPreclean]]'s stage boundaries in pipeline order, each wrapped by
    * `pin` as it is produced (identity for single-consumer callers; a
    * `localCheckpoint` when each boundary gains a second consumer, as in
    * [[assemblePretraining]]'s attribution joins). Names are the fate a
    * document missing from that boundary is attributed:
    * `url_dup`, `url_blocked`, `shape`, `classifier`.
    */
  private def precleanStages(docs: DataFrame, idCol: String, urlCol: String,
      htmlCol: String, textCol: String, minWords: Long, minStopwordHits: Long,
      clfMinMeanCenti: Long, pin: DataFrame => DataFrame): Seq[(String, DataFrame)] = {
    val urlDeduped = pin(Urls.dedupByUrl(docs, urlCol, idCol))
    val gated = pin(Urls.filterBlocked(urlDeduped, urlCol))
    val extracted = Html.extractText(gated, htmlCol, textCol).drop(htmlCol)
    val cols = extracted.columns.toSeq
    val shaped = pin(Repetition.gopherQualityStats(extracted, idCol, textCol,
        minWords = minWords, minStopwordHits = minStopwordHits)
      .filter(col("quality_keep"))
      .select(cols.map(col): _*))
    val classified =
      pin(Classify.filterLowQuality(shaped, textCol, minMeanCenti = clfMinMeanCenti))
    Seq("url_dup" -> urlDeduped, "url_blocked" -> gated,
      "shape" -> shaped, "classifier" -> classified)
  }

  /** End-to-end pretraining-data ASSEMBLY: web-raw pages → ordered token
    * shards, with per-document fate attribution — the full composition a
    * production pipeline runs as one lineage (every stage of which is
    * individually oracled by its own probe):
    *
    *   1-4. [[webPreclean]] (URL dedup → domain gate → HTML extract →
    *        Gopher shape rules → hashed classifier);
    *   5. benchmark decontamination over the EXTRACTED text
    *      ([[Decontaminate.clean]]);
    *   6. temperature-weighted mixture over caller-named source slices
    *      ([[Sampling.temperatureMixturePortable]] — the portable coin,
    *      so the kept set replays cross-engine); or, when
    *      `balanceTargets` is set, the water-fill domain-balance recipe
    *      at those target fractions ([[Sampling.balanceToTarget]] —
    *      the x136/x140 card, first-match source attribution);
    *   7. token-balanced contiguous shards in the seeded epoch order
    *      ([[graft.etl.Export.trainOrderTokenShards]]; `tokenCount`
    *      defaults to `length(textCol)`, the char proxy).
    *
    * Returns ONE row per input page: `(idCol, stage, shard, ord)` where
    * `stage` is the first stage that dropped the page (`url_dup`,
    * `url_blocked`, `shape`, `classifier`, `contaminated`, `mixture`) or
    * `kept`, and `shard`/`ord` are the training-order coordinates of kept
    * pages (null otherwise). "First" is well-defined because stage
    * survivor sets are nested. A page matching NO source predicate never
    * enters the mixture and reports `mixture`.
    *
    * Scale shape: the composition inherits each stage's own discipline —
    * the URL-dedup digest aggregate and the decontamination shingle join
    * are the only content shuffles; the attribution is id-only left joins
    * against pinned stage boundaries ([[runAudited]]'s pattern: no
    * content shuffle, and with `pinStages` each boundary's subtree runs
    * once even though the attribution re-consumes it). The 100-TB
    * deployment writes each boundary to durable parquet instead — the
    * attribution frame then derives from the id columns for free.
    */
  def assemblePretraining(pages: DataFrame, idCol: String, urlCol: String,
      htmlCol: String,
      sources: Seq[(String, org.apache.spark.sql.Column)],
      bench: DataFrame, benchIdCol: String, benchText: org.apache.spark.sql.Column,
      textCol: String = "text",
      minWords: Long = 50L,
      minStopwordHits: Long = 2L,
      clfMinMeanCenti: Long = 0L,
      decontamNgram: Int = 3,
      decontamMinHits: Long = 2L,
      alpha: Double = 0.5,
      budget: Long = 1000L,
      seed: String = "epoch1",
      nShards: Int = 8,
      tokenCount: Option[org.apache.spark.sql.Column] = None,
      pinStages: Boolean = true,
      balanceTargets: Option[Seq[(String, Double)]] = None): DataFrame = {
    require(sources.nonEmpty, "need >=1 mixture source")
    def pin(df: DataFrame): DataFrame = if (pinStages) df.localCheckpoint() else df
    val pre = precleanStages(pages, idCol, urlCol, htmlCol, textCol,
      minWords, minStopwordHits, clfMinMeanCenti, pin)
    val classified = pre.last._2
    val decont = pin(Decontaminate.clean(classified, idCol, col(textCol),
      bench, benchIdCol, benchText, n = decontamNgram, minHits = decontamMinHits))
    val tok = tokenCount.getOrElse(length(col(textCol)).cast("long"))
    // step 6, two recipe forms: the temperature mixture (default), or —
    // when `balanceTargets` is given — the water-fill domain balance real
    // data cards state ([[Sampling.balanceToTarget]]; round 15, the
    // balance → shuffle → shard composition x148 pins stage-for-stage).
    // In the balance arm a page is attributed to the FIRST source whose
    // predicate matches (the mixture's slices may overlap; a rate card
    // needs a partition), and `alpha`/`budget` are unused.
    val mixed = balanceTargets match {
      case Some(targets) =>
        val srcExpr = sources.tail.foldLeft(
            when(sources.head._2, lit(sources.head._1))) {
          case (acc, (name, pred)) => acc.when(pred, lit(name))
        }
        Sampling.balanceToTarget(
            decont.withColumn("__src", srcExpr).filter(col("__src").isNotNull),
            col("__src"), col(idCol), tok, targets)
          .drop("__src", "balance_rate")
      case None =>
        val named = sources.map { case (name, pred) => (name, decont.filter(pred)) }
        val rates = Sampling.temperatureRates(named, alpha, budget)
        Sampling.temperatureMixturePortable(named, col(idCol), rates)
    }
    val shards = pin(graft.etl.Export.trainOrderTokenShards(mixed, idCol, seed, nShards, tok)
      .select(col(idCol), col("ord"), col("shard")))
    def flag(df: DataFrame, name: String): DataFrame =
      df.select(col(idCol)).withColumn(name, lit(true))
    pages.select(col(idCol))
      .join(flag(pre(0)._2, "__s1"), Seq(idCol), "left")
      .join(flag(pre(1)._2, "__s2"), Seq(idCol), "left")
      .join(flag(pre(2)._2, "__s3"), Seq(idCol), "left")
      .join(flag(pre(3)._2, "__s4"), Seq(idCol), "left")
      .join(flag(decont, "__s5"), Seq(idCol), "left")
      .join(shards, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__s1").isNull, "url_dup")
          .when(col("__s2").isNull, "url_blocked")
          .when(col("__s3").isNull, "shape")
          .when(col("__s4").isNull, "classifier")
          .when(col("__s5").isNull, "contaminated")
          .when(col("ord").isNull, "mixture")
          .otherwise("kept").as("stage"),
        col("shard"), col("ord"))
  }

  /** Host-scoped boilerplate line removal — the CCNet/OpenWebText trick:
    * a line appearing on ≥ `minDf` DISTINCT pages of the SAME host is
    * site furniture (nav, cookie banner, footer), not content — drop
    * EVERY occurrence. Unlike [[Dedup.paragraphDedup]] (which keeps the
    * globally-first occurrence), boilerplate removal keeps none and
    * scopes frequency to the host: the same sentence on two different
    * sites is quotation; on fifty pages of one site it is a template.
    *
    * Semantics (deterministic, engine-replayable): lines split on `sep`;
    * whitespace-only lines never count toward frequency and are kept in
    * place; a line counts ONCE per page toward its host's df; pages
    * whose every line is dropped keep an empty text (downstream quality
    * gates are the arbiter). `hostCol` is expected non-null (run a
    * provenance gate first): null-host rows group together for the df
    * count but never match the anti-join, so their lines are always
    * kept. Returns (idCol, hostCol, textCol).
    *
    * Plan shape: one line explode (pinned — it feeds the df count AND
    * reassembly); df is a map-side-combinable count of distinct
    * (host, line-hash, id) triples; the hot set is BOUNDED by
    * totalLines / minDf and broadcasts when its materialized count
    * licenses it — the skew-safe shape, since each hot key's many
    * copies (the very lines being dropped) stay distributed across
    * their input partitions instead of converging on one reducer. Past
    * the cap the anti-join falls back to shuffle, where AQE's skew
    * handling applies. Reassembly groups by the UNSKEWED page id, never
    * by content.
    */
  def removeHostBoilerplate(docs: DataFrame, idCol: String, hostCol: String,
      textCol: String, minDf: Long, sep: String = "\n",
      hotBroadcastCap: Long = 4000000L): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf (1 would drop every line)")
    val lines = docs
      .select(col(idCol), col(hostCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .toDF(idCol, hostCol, "__pos", "__line")
      .localCheckpoint()
    val hot = lines
      .filter(length(trim(col("__line"))) > 0)
      .select(col(hostCol), sha2(col("__line"), 256).as("__h"), col(idCol))
      .groupBy(col(hostCol), col("__h"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col(hostCol), col("__h"))
      .localCheckpoint()
    val keyed = lines.withColumn("__h", sha2(col("__line"), 256))
    val kept =
      if (hot.count() <= hotBroadcastCap)
        keyed.join(broadcast(hot), Seq(hostCol, "__h"), "left_anti")
      else keyed.join(hot, Seq(hostCol, "__h"), "left_anti")
    val rebuilt = kept
      .groupBy(col(idCol), col(hostCol))
      .agg(concat_ws(sep,
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line"))).as(textCol))
    // Reassembly joins on idCol ALONE: it uniquely identifies the page, and
    // an equi-join that included hostCol would never match a null-host page
    // (null != null), silently replacing its whole text with "" — the exact
    // opposite of the documented null-host contract above.
    docs.select(col(idCol), col(hostCol))
      .join(rebuilt.drop(hostCol), Seq(idCol), "left")
      .select(col(idCol), col(hostCol),
        coalesce(col(textCol), lit("")).as(textCol))
  }
}
