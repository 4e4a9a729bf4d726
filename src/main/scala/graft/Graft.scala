package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import graft.analytics.Kpi
import graft.etl.{DqRunner, EtlJob, SurrogateKeys}
import graft.ops._
import graft.streaming.StreamingIngest

/** Single front door to the engine — the operations a user of the
  * reference pipeline (and of a large-scale training-data pipeline) reaches
  * for, re-exported with their home module documented. Everything returns
  * lazy DataFrames/Datasets; nothing here adds behavior.
  *
  * {{{
  * val spark  = graft.Sessions.local("my-app")         // tuned builder
  * val wh     = graft.Graft.etl(spark, EtlJob.Config(in, out))
  * val kpis   = graft.Graft.kpiHeadline(spark, flat)
  * val dupes  = graft.Graft.nearDupMinhash(docs, "doc_id", col("text"))
  * }}}
  */
object Graft {

  // — the reference pipeline (SURVEY §2/§7) ————————————————————————————
  /** Full CSV→star-schema ETL with single-pass DQ ([[graft.etl.EtlJob]]). */
  def etl(spark: SparkSession, cfg: EtlJob.Config): EtlJob.Warehouse = EtlJob.run(spark, cfg)

  /** The 4-KPI headline query over a flat event frame ([[graft.analytics.Kpi]]). */
  def kpiHeadline(spark: SparkSession, flat: DataFrame): Dataset[graft.etl.KpiResult] =
    Kpi.headline(spark, flat)

  /** Star-join enrichment (notebook J7-J10). */
  def enrich(fact: DataFrame, dimShipping: DataFrame, dimClient: DataFrame,
      dimDate: DataFrame, dimLocation: DataFrame): DataFrame =
    Kpi.enrich(fact, dimShipping, dimClient, dimDate, dimLocation)

  /** Single-pass data-quality checkpoint ([[graft.etl.DqRunner]]). */
  def dqCheck(df: DataFrame, checkpoint: String): Seq[graft.etl.DqCheck] =
    DqRunner.run(df, checkpoint, DqRunner.systemClock)

  // — dedup family ([[graft.ops.Dedup]]) ————————————————————————————————
  def dedupExact(df: DataFrame, contentCols: Seq[String], idCol: String): DataFrame =
    Dedup.exact(df, contentCols, idCol)

  /** MinHash+LSH near-dup pairs: signatures → banded candidates → exact
    * Jaccard verification of candidates only.
    */
  def nearDupMinhash(docs: DataFrame, idCol: String, text: Column,
      n: Int = 3, numPerm: Int = 64, bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    require(numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm) — a remainder would silently " +
        "drop signature permutations from banding and degrade recall")
    val sig = Dedup.minhashSignatures(docs, idCol, text, n, numPerm)
    val cand = Dedup.lshCandidates(sig, idCol, bands, numPerm / bands)
    Dedup.jaccardVerify(docs, idCol, text, n, cand, threshold)
  }

  def nearDupSimhash(docs: DataFrame, idCol: String, text: Column, maxDist: Int = 6): DataFrame =
    Dedup.simhashPairs(Dedup.simhash(docs, idCol, text), idCol, maxDist)

  /** Pairwise matches → duplicate clusters (canonical = min id per
    * component) — the keep/drop step after any near-dup pair operator.
    * Throws if the pair graph has a chain longer than `maxIter`.
    */
  def dedupClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame =
    Dedup.components(pairs, maxIter)

  /** Fold a pair DELTA into existing cluster labels without replaying
    * history — incremental ≡ one-shot over the full pair set
    * ([[graft.ops.Dedup.componentsIncremental]]).
    */
  def componentsIncremental(labels: DataFrame, newPairs: DataFrame): DataFrame =
    Dedup.componentsIncremental(labels, newPairs)

  /** Persisted cluster labels: write / fold a pair delta (idempotent, no
    * ledger needed) / read with heal-on-entry ([[graft.ops.Dedup]]).
    */
  def writeCcIndex(spark: SparkSession, path: String, labels: DataFrame): Unit =
    Dedup.writeCcIndex(spark, path, labels)
  def appendToCcIndex(spark: SparkSession, path: String, newPairs: DataFrame): Unit =
    Dedup.appendToCcIndex(spark, path, newPairs)
  def readCcIndex(spark: SparkSession, path: String): DataFrame =
    Dedup.readCcIndex(spark, path)

  /** Daily-ingest dedup: a new batch against an existing corpus without
    * ever self-joining the corpus. Eager — the result is materialized and
    * cached; `unpersist()` it when done.
    */
  def dedupIncremental(corpus: DataFrame, batch: DataFrame, idCol: String, text: Column,
      n: Int = 3, numPerm: Int = 64, bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    require(numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm) — a remainder would silently " +
        "drop signature permutations from banding and degrade recall")
    Dedup.incrementalDedup(corpus, batch, idCol, text, n, numPerm, bands, numPerm / bands, threshold)
  }

  /** End-to-end semantic (embedding-cosine) dedup removal — SemDeDup shape:
    * LSH cosine pairs → clusters → drop non-canonical members.
    */
  def dedupSemantic(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 8, dim: Int = 64): DataFrame =
    Dedup.dedupCorpusSemantic(emb, idCol, vecCol, threshold, numPlanes, dim)

  /** Benchmark decontamination: remove corpus docs sharing ≥ minHits
    * distinct n-gram shingles with any eval-set document.
    */
  def decontaminate(corpus: DataFrame, idCol: String, text: Column,
      bench: DataFrame, benchIdCol: String, benchText: Column,
      n: Int = 13, minHits: Long = 1L): DataFrame =
    Decontaminate.clean(corpus, idCol, text, bench, benchIdCol, benchText, n, minHits)

  /** Index a benchmark suite once ([[graft.ops.Decontaminate.writeBenchIndex]]),
    * then decontaminate every corpus batch against the persisted index —
    * the incremental-deployment shape (append new eval tasks with
    * [[graft.ops.Decontaminate.appendToBenchIndex]]).
    */
  def decontaminateIndexed(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, corpus: DataFrame, idCol: String, text: Column,
      minHits: Long = 1L): DataFrame =
    Decontaminate.cleanIndexed(
      Decontaminate.readBenchIndex(spark, indexPath), corpus, idCol, text, minHits)

  /** The composed curation pipeline: scrub → quality gate → repetition
    * gate → exact dedup → near-dup removal → decontamination.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      bench: Option[(DataFrame, String, String)] = None,
      cfg: Curate.Config = Curate.Config()): DataFrame =
    Curate.run(docs, idCol, textCol, bench, cfg)

  /** Gopher-style within-document repetition stats + keep verdict. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String = "text",
      lineSep: String = "\n"): DataFrame =
    Repetition.gopherStats(docs, idCol, textCol, lineSep)

  /** Daily-ingest semantic dedup: new embedding batch vs existing corpus
    * (corpus probed, never self-joined). Eager — `unpersist()` when done.
    */
  def dedupSemanticIncremental(corpus: DataFrame, batch: DataFrame, idCol: String,
      vecCol: String, threshold: Double, numPlanes: Int = 8, dim: Int = 64): DataFrame =
    Dedup.incrementalSemanticDedup(corpus, batch, idCol, vecCol, threshold, numPlanes, dim)

  // — similarity search ([[graft.ops.Similarity]], [[graft.ops.Ivf]]) ————
  def topKExact(queries: DataFrame, qid: String, qvec: String,
      corpus: DataFrame, cid: String, cvec: String, k: Int): DataFrame =
    Similarity.bruteForceTopK(queries, qid, qvec, corpus, cid, cvec, k)

  def cosineNearDup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int, dim: Int): DataFrame =
    Similarity.cosinePairs(corpus, idCol, vecCol, threshold, numPlanes, dim)

  /** Int8-quantized candidate generation + exact rerank (¼ shuffle bytes). */
  def topKQuantized(queries: DataFrame, qid: String, qvec: String,
      corpus: DataFrame, cid: String, cvec: String, k: Int, candMult: Int = 4): DataFrame =
    Similarity.quantizedTopK(queries, qid, qvec, corpus, cid, cvec, k, candMult)

  /** Johnson–Lindenstrauss compression: project a vector column through a
    * deterministic ±1 matrix (per-pair scoring cost drops dim → outDim).
    */
  def randomProject(vec: Column, outDim: Int, dim: Int, seed: Long = 7L): Column =
    Similarity.project(vec, Similarity.projectionMatrix(outDim, dim, seed))

  /** Top-k by PROJECTED cosine — the JL shortlist generator. */
  def topKProjected(queries: DataFrame, qid: String, qvec: String,
      corpus: DataFrame, cid: String, cvec: String, k: Int,
      outDim: Int, dim: Int, seed: Long = 7L): DataFrame =
    Similarity.topKProjected(queries, qid, qvec, corpus, cid, cvec, k, outDim, dim, seed)

  /** Project → shortlist → exact rerank: JL candidates, exact final
    * ranking; `shortlist` is the recall knob.
    */
  def topKProjectedRerank(queries: DataFrame, qid: String, qvec: String,
      corpus: DataFrame, cid: String, cvec: String, k: Int, shortlist: Int,
      outDim: Int, dim: Int, seed: Long = 7L): DataFrame =
    Similarity.topKProjectedRerank(queries, qid, qvec, corpus, cid, cvec,
      k, shortlist, outDim, dim, seed)

  /** The composed 100-TB ANN plan: IVF coarse quantizer (scan ≈
    * nprobe/numCentroids of the corpus) with int8 candidate scoring inside
    * the probed lists + exact rerank.
    */
  def topKIvfQuantized(queries: DataFrame, qid: String, qvec: String,
      corpus: DataFrame, cid: String, cvec: String, cents: DataFrame,
      k: Int, nprobe: Int, candMult: Int = 4): DataFrame =
    Ivf.searchQuantized(queries, qid, qvec, corpus, cid, cvec, cents, k, nprobe, candMult)

  /** Persist / load / query an IVF index whose inverted lists are Hive
    * partitions — build once, probe many batches, read only probed lists.
    */
  def ivfWriteIndex(path: String, corpus: DataFrame, cid: String, cvec: String,
      cents: DataFrame): Unit = Ivf.writeIndex(path, corpus, cid, cvec, cents)
  def ivfReadIndex(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    Ivf.readIndex(spark, path)
  def topKIvfIndexed(queries: DataFrame, qid: String, qvec: String,
      lists: DataFrame, cid: String, cvec: String, cents: DataFrame,
      k: Int, nprobe: Int): DataFrame =
    Ivf.searchAssigned(queries, qid, qvec, lists, cid, cvec, cents, k, nprobe)

  /** IVF index lifecycle beyond build: fold a batch in under the frozen
    * quantizer ([[graft.ops.Ivf.appendToIndex]]), split-and-refine the
    * lists after drift ([[graft.ops.Ivf.rebalanceIndex]] — crash-safe
    * staging+marker swap), and re-gate recall
    * ([[graft.ops.Ivf.plantedRecall]], the x38 discipline — healthy
    * reads ≥ 0.9).
    */
  def ivfAppendToIndex(spark: SparkSession, path: String, newVecs: DataFrame,
      cid: String, cvec: String): Unit =
    Ivf.appendToIndex(spark, path, newVecs, cid, cvec)
  def ivfRebalanceIndex(spark: SparkSession, path: String, cid: String,
      cvec: String): Unit = Ivf.rebalanceIndex(spark, path, cid, cvec)
  def ivfPlantedRecall(spark: SparkSession, path: String, cid: String,
      cvec: String, k: Int = 5, nprobe: Int = 4): Double =
    Ivf.plantedRecall(spark, path, cid, cvec, k, nprobe)

  /** The same lifecycle for the IVF-PQ layout: append under frozen
    * quantizer+codebooks, rebalance lists (codes ride through unchanged),
    * refresh codebooks + re-encode after distribution drift
    * ([[graft.ops.Ivf.reencodePqIndex]]), and re-gate recall through the
    * ADC path — with `nprobe`/`candMult` at blob width over
    * near-dup-dense regions (see the scaladocs for the measured limits).
    */
  def ivfPqAppendToIndex(spark: SparkSession, path: String, newVecs: DataFrame,
      cid: String, cvec: String): Unit =
    Ivf.appendToPqIndex(spark, path, newVecs, cid, cvec)
  def ivfPqRebalanceIndex(spark: SparkSession, path: String, cid: String,
      cvec: String): Unit = Ivf.rebalancePqIndex(spark, path, cid, cvec)
  def ivfPqReencodeIndex(spark: SparkSession, path: String, cid: String,
      cvec: String, iters: Int = 3): Unit =
    Ivf.reencodePqIndex(spark, path, cid, cvec, iters)
  def ivfPqPlantedRecall(spark: SparkSession, path: String, cid: String,
      cvec: String, k: Int = 5, nprobe: Int = 4, candMult: Int = 4): Double =
    Ivf.plantedRecallPq(spark, path, cid, cvec, k, nprobe, candMult)

  // — text analysis ([[graft.ops.TextStats]]) ————————————————————————————
  def textStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    TextStats.withStats(docs, textCol)

  /** Per-document top-k characteristic terms (engine-portable tf-idf). */
  def topTerms(docs: DataFrame, idCol: String, text: Column, k: Int = 5): DataFrame =
    TextStats.tfidfTopTerms(docs, idCol, text, k)

  /** Redact URLs/emails/phone numbers — the pre-training scrub pass. */
  def scrubText(text: Column): Column = TextStats.scrub(text)

  /** Per-document PII counts (URL/email/phone) + redacted text — the
    * reporting side of [[scrubText]], with its order-sensitive masking
    * chain (an email inside a URL counts as URL).
    */
  def piiStats(docs: DataFrame, idCol: String, textCol: String = "text"): DataFrame =
    TextStats.piiStats(docs, idCol, textCol)

  /** Per-source PII detection totals + rollup grand total — the release
    * checklist card ([[graft.ops.Report.piiCard]]).
    */
  def piiCard(docs: DataFrame, idCol: String, textCol: String = "text",
      sourceCol: String = "source"): DataFrame =
    Report.piiCard(docs, idCol, textCol, sourceCol)

  /** Deflate compression ratio (round4) — entropy proxy: boilerplate
    * deflates below prose, binary junk above it; gate both ends.
    */
  def compressionRatio(text: Column): Column = TextStats.compressionRatio(text)

  /** ftfy-lite encoding repair: inverts UTF-8-decoded-as-Latin-1
    * mojibake (≤ 2 rounds), strictly guarded — clean text is a fixpoint.
    */
  def repairEncoding(text: Column): Column = TextStats.repairEncoding(text)

  /** Per-language quality gate: `approx = false` is the exact
    * floor(frac·n) window form; `approx = true` is the 2-pass sketch
    * threshold + broadcast cut that never sorts a language partition
    * (the dominant-language-safe 100-TB form).
    */
  def qualityPrune(docs: DataFrame, idCol: String, frac: Double,
      textCol: String = "text", approx: Boolean = false): DataFrame =
    if (approx) TextStats.qualityPruneApprox(docs, idCol, frac, textCol)
    else TextStats.qualityPrune(docs, idCol, frac, textCol)

  /** Train a hashed quality-classifier weight table (Naive Bayes
    * log-odds, order-free and value-replayable) from a labeled corpus;
    * score it back with [[classifierAnnotate]].
    */
  def trainClassifier(docs: DataFrame, labelCol: Column,
      textCol: String = "text", alpha: Double = 1.0): DataFrame =
    Classify.train(docs, labelCol, textCol, alpha)

  /** Score documents with a trained (or pinned-vocabulary) hashed linear
    * classifier — shuffle-free `typedlit`-map projection.
    */
  def classifierAnnotate(docs: DataFrame, table: Map[Long, Long],
      textCol: String = "text"): DataFrame =
    Classify.annotateWith(docs, table, textCol)

  /** Merge two trained classifier tables into the exact combined-corpus
    * model (NB counts are additive) — the daily incremental retrain.
    */
  def mergeClassifiers(a: DataFrame, b: DataFrame, alpha: Double = 1.0): DataFrame =
    Classify.mergeTrained(a, b, alpha)

  /** Train a stupid-backoff bigram LM from a reference corpus (the CCNet
    * fluency-model shape, distributed-first per Brants '07); score with
    * [[lmAnnotateTrained]] / gate with [[perplexityPruneTrained]].
    */
  def trainLm(ref: DataFrame, textCol: String = "text", vocabSize: Int = 1024,
      bigramSize: Int = 4096, minBigramCount: Long = 2L): DataFrame =
    Lm.train(ref, textCol, vocabSize, bigramSize, minBigramCount)

  /** LM sufficient statistics (raw n-gram counts, ONE corpus scan) —
    * additive via [[mergeLmCounts]], compiled with [[lmFromCounts]]: the
    * incremental-retrain shape ([[mergeClassifiers]] at LM scale).
    */
  def lmTrainCounts(ref: DataFrame, textCol: String = "text"): DataFrame =
    Lm.trainCounts(ref, textCol)

  /** Merge two LM count tables into the exact combined-corpus statistics. */
  def mergeLmCounts(a: DataFrame, b: DataFrame): DataFrame =
    Lm.mergeCounts(a, b)

  /** The persisted daily-fold shape of LM statistics: init / fold a
    * batch in (EXACT — the index always equals one-shot counts of the
    * folded union; replay-idempotent via the in-table batch ledger;
    * crash-safe single-table staging+marker swap) / read back for
    * [[lmFromCounts]] or [[graft.ops.Lm.modelFromCounts3]].
    */
  def lmCountsIndexInit(spark: SparkSession, path: String): Unit =
    Lm.writeCountsIndex(spark, path)
  def lmCountsIndexFold(spark: SparkSession, path: String, batchId: String,
      docs: DataFrame, textCol: String = "text"): Boolean =
    Lm.foldIntoCountsIndex(spark, path, batchId, docs, textCol)
  def lmCountsIndexRead(spark: SparkSession, path: String): DataFrame =
    Lm.readCountsIndex(spark, path)

  /** Compile a scoring model from (possibly merged) LM count tables. */
  def lmFromCounts(counts: DataFrame, vocabSize: Int = 1024,
      bigramSize: Int = 4096, minBigramCount: Long = 2L): DataFrame =
    Lm.modelFromCounts(counts, vocabSize, bigramSize, minBigramCount)

  /** Score documents through a trained LM — shuffle-free map-literal
    * projection, exact integer centi-log10 sums.
    */
  def lmAnnotateTrained(docs: DataFrame, model: DataFrame,
      textCol: String = "text"): DataFrame =
    Lm.annotate(docs, model, textCol)

  /** The CCNet gate over a trained LM: keep the fluent buckets. */
  def perplexityPruneTrained(docs: DataFrame, model: DataFrame,
      textCol: String = "text", keep: Seq[String] = Seq("head", "middle")): DataFrame =
    Lm.perplexityPrune(docs, model, textCol, keep)

  /** [[trainLm]] at the TRIGRAM order (the production KenLM/CCNet grain):
    * counts stay one corpus scan and additive ([[mergeLmCounts]] applies
    * unchanged — use [[graft.ops.Lm.trainCounts3]] +
    * [[graft.ops.Lm.modelFromCounts3]] for the incremental shape); score
    * with [[lmAnnotateTrained3]] — recursive tri→bi→uni stupid backoff,
    * still a shuffle-free map-literal projection.
    */
  def trainLm3(ref: DataFrame, textCol: String = "text", vocabSize: Int = 1024,
      bigramSize: Int = 4096, trigramSize: Int = 4096,
      minBigramCount: Long = 2L, minTrigramCount: Long = 2L): DataFrame =
    Lm.train3(ref, textCol, vocabSize, bigramSize, trigramSize,
      minBigramCount, minTrigramCount)

  /** Score documents through a [[trainLm3]] trigram model. */
  def lmAnnotateTrained3(docs: DataFrame, model: DataFrame,
      textCol: String = "text"): DataFrame =
    Lm.annotate3(docs, model, textCol)

  // — sessionization ([[graft.ops.Sessionize]]) ———————————————————————————
  def sessionize(events: DataFrame, idCol: String, tsCol: String, gap: String,
      valueCol: Option[String] = None): DataFrame =
    Sessionize.bySessionWindow(events, idCol, tsCol, gap, valueCol)

  // — deterministic sampling ([[graft.ops.Sampling]]) ————————————————————
  def hashSplit(df: DataFrame, idCol: Column, splits: Seq[(String, Double)]): DataFrame =
    Sampling.hashSplit(df, idCol, splits)

  /** Train/val/test split coined per near-dup CLUSTER — no near-duplicate
    * pair ever straddles a split boundary (eval-leakage-safe).
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, text: Column, n: Int,
      threshold: Double, splits: Seq[(String, Double)]): DataFrame =
    Sampling.leakageSafeSplit(docs, idCol, text, n, threshold, splits)

  /** Exact-k WEIGHTED sample per group (Efraimidis–Spirakis A-ES over
    * the portable coin) — deterministic, value-oracle-able; weight ≤ 0
    * excluded ([[graft.ops.Sampling.weightedTopKPerGroup]]).
    */
  def weightedSample(df: DataFrame, groupCol: Column, idCol: Column,
      weightCol: Column, k: Int): DataFrame =
    Sampling.weightedTopKPerGroup(df, groupCol, idCol, weightCol, k)

  def stratifiedSample(df: DataFrame, stratumCol: Column, idCol: Column, frac: Double): DataFrame =
    Sampling.stratifiedExact(df, stratumCol, idCol, frac)

  /** Token-budget data recipe: per source, keep documents in deterministic
    * hash order until the stated token budget is filled.
    */
  def tokenBudgetMixture(sources: Seq[(String, DataFrame, Long)],
      idCol: Column, tokenCount: Column): DataFrame =
    Sampling.tokenBudget(sources, idCol, tokenCount)

  /** Cluster-balanced temperature resampling over an embedding column:
    * assign to max-cosine centroids, resample clusters at `p ∝ n^α`
    * against a document budget (α < 1 flattens the dominant clusters),
    * deterministic portable per-row coin.
    */
  def clusterTemperature(docs: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, alpha: Double, budget: Long): DataFrame =
    Sampling.clusterTemperature(docs, idCol, vecCol, cents, alpha, budget)

  // — SCD2 dimension versioning ([[graft.ops.Scd]]) ——————————————————————
  def scd2FromHistory(history: DataFrame, keyCols: Seq[String], tsCol: String,
      payloadCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame =
    Scd.fromHistory(history, keyCols, tsCol, payloadCols, tieCols)

  /** Append-only change batch → updated SCD2 dim; only batch keys recompute. */
  def scd2Merge(dim: DataFrame, changes: DataFrame, keyCols: Seq[String],
      tsCol: String, payloadCols: Seq[String]): DataFrame =
    Scd.merge(dim, changes, keyCols, tsCol, payloadCols)

  /** Late/out-of-order batch → rebuild only the touched keys from retained
    * raw history (the backfill case [[scd2Merge]] cannot cover).
    */
  def scd2RepairLate(dim: DataFrame, rawHistory: DataFrame, lateBatch: DataFrame,
      keyCols: Seq[String], tsCol: String, payloadCols: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame =
    Scd.repairLate(dim, rawHistory, lateBatch, keyCols, tsCol, payloadCols, tieCols)

  // — training-sequence packing ([[graft.ops.Packing]]) ——————————————————
  /** Sentence-aware chunking: chunks cut only at sentence boundaries,
    * cumulative-token buckets, a straddling sentence overflows rather
    * than splitting ([[graft.ops.Packing.sentenceChunks]]).
    */
  def sentenceChunks(docs: DataFrame, idCol: String, text: Column,
      maxTokens: Int): DataFrame =
    Packing.sentenceChunks(docs, idCol, text, maxTokens)

  /** [[sentenceChunks]] with RAG overlap: each chunk carries the last
    * `overlap` sentences of its predecessor (duplicated, counted in
    * both) ([[graft.ops.Packing.sentenceChunksOverlap]]).
    */
  def sentenceChunksOverlap(docs: DataFrame, idCol: String, text: Column,
      maxTokens: Int, overlap: Int): DataFrame =
    Packing.sentenceChunksOverlap(docs, idCol, text, maxTokens, overlap)

  def packSequences(docs: DataFrame, idCol: String, tokenCount: Column,
      budget: Int, shards: Int = 64): DataFrame =
    Packing.concatChunk(docs, idCol, tokenCount, budget, shards)

  // — time-series resampling ([[graft.ops.Resample]]) ————————————————————
  def resample(events: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      unit: String = "hour"): DataFrame =
    Resample.gapFilled(events, keyCol, tsCol, valueCol, unit)

  def fillForward(df: DataFrame, keyCol: String, tsCol: String, cols: Seq[String]): DataFrame =
    Resample.locf(df, keyCol, tsCol, cols)

  // — sketched term frequency ([[graft.ops.Frequency]]) ——————————————————
  /** Persisted per-key HLL approx-distinct index: init / fold a batch
    * (idempotent by register-max algebra, no ledger) / read estimates
    * with heal-on-entry ([[graft.ops.Frequency]]).
    */
  def writeHllIndex(spark: SparkSession, path: String, df: DataFrame,
      keyCol: String, valueCol: String, lgK: Int = 12): Unit =
    Frequency.writeHllIndex(spark, path, df, keyCol, valueCol, lgK)
  def foldIntoHllIndex(spark: SparkSession, path: String, batch: DataFrame,
      keyCol: String, valueCol: String, lgK: Int = 12): Unit =
    Frequency.foldIntoHllIndex(spark, path, batch, keyCol, valueCol, lgK)
  def readHllEstimates(spark: SparkSession, path: String): DataFrame =
    Frequency.readHllEstimates(spark, path)
  /** Collapse the HLL delta table to one row per key (register union)
    * under the marker protocol ([[graft.ops.Frequency.compactHllIndex]]).
    */
  def compactHllIndex(spark: SparkSession, path: String, targetFiles: Int = 1): Unit =
    Frequency.compactHllIndex(spark, path, targetFiles)

  // — retrieval scoring + data recipes —————————————————————————————————
  /** BM25 relevance of every document against a small query set
    * ([[graft.ops.TextStats.bm25]]); query terms broadcast, the
    * vocabulary domain is never shuffled.
    */
  def bm25(docs: DataFrame, idCol: String, text: Column,
      queries: DataFrame, qIdCol: String, qText: Column,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    TextStats.bm25(docs, idCol, text, queries, qIdCol, qText, k1, b)

  /** Water-filling per-source keep rates toward a target token
    * distribution ([[graft.ops.Sampling.domainBalance]]); feed the rates
    * to [[graft.ops.Sampling.mixturePortable]].
    */
  def domainBalance(docs: DataFrame, sourceCol: Column, tokenCount: Column,
      targets: Seq[(String, Double)]): DataFrame =
    Sampling.domainBalance(docs, sourceCol, tokenCount, targets)

  /** Apply the water-fill rates with the content-addressed coin
    * ([[graft.ops.Sampling.balanceToTarget]]): the kept set is a pure
    * function of the data — reproducible across clusters and retries.
    */
  def balanceToTarget(docs: DataFrame, sourceCol: Column, idCol: Column,
      tokenCount: Column, targets: Seq[(String, Double)]): DataFrame =
    Sampling.balanceToTarget(docs, sourceCol, idCol, tokenCount, targets)

  /** Persisted BM25 postings index: build once / fold batches
    * (idempotent anti-join appends) / score fresh queries through
    * term-partition-pruned postings ([[graft.ops.TextStats]]).
    */
  def writeBm25Index(docs: DataFrame, idCol: String, text: Column, path: String): Unit =
    TextStats.writeBm25Index(docs, idCol, text, path)
  def appendToBm25Index(spark: SparkSession, path: String, newDocs: DataFrame,
      idCol: String, text: Column): Unit =
    TextStats.appendToBm25Index(spark, path, newDocs, idCol, text)
  def probeBm25Index(spark: SparkSession, path: String, queries: DataFrame,
      qIdCol: String, qText: Column): DataFrame =
    TextStats.probeBm25Index(spark, path, queries, qIdCol, qText)
  /** Top-k documents per query by BM25 (ties on id, portable round4
    * ranking) ([[graft.ops.TextStats.bm25TopK]]).
    */
  def bm25TopK(docs: DataFrame, idCol: String, text: Column, queries: DataFrame,
      qIdCol: String, qText: Column, k: Int): DataFrame =
    TextStats.bm25TopK(docs, idCol, text, queries, qIdCol, qText, k)

  def termFrequencySketch(items: DataFrame, term: Column,
      eps: Double = 1e-3, confidence: Double = 0.99, seed: Int = 7) =
    Frequency.sketch(items, term, eps, confidence, seed)

  // — multimodal ([[graft.ops.Multimodal]]) ———————————————————————————————
  def readBinary(spark: SparkSession, dir: String, glob: String, kind: String): DataFrame =
    Multimodal.readBinaryDir(spark, dir, glob, kind)

  /** Nearest-neighbor raster resize for uncompressed images (BMP/PPM);
    * audio/unknown blobs pass through unchanged.
    */
  def resizeMedia(spark: SparkSession, media: DataFrame, w: Int, h: Int) =
    Multimodal.resizeAll(spark, media, w, h)

  // — streaming ([[graft.streaming.StreamingIngest]]) —————————————————————
  def streamFlatEvents(spark: SparkSession, path: String): DataFrame =
    StreamingIngest.flatEvents(spark, path)

  /** CDC change stream → parquet-backed SCD2 dimension (foreachBatch). */
  def streamScd2Dim(changes: DataFrame, dimPath: String, checkpoint: String,
      keyCols: Seq[String], tsCol: String, payloadCols: Seq[String]) =
    StreamingIngest.scd2DimSink(changes, dimPath, checkpoint, keyCols, tsCol, payloadCols)

  /** Document stream → curated, cross-batch-deduped corpus (append-only
    * batch partitions, idempotent on replay).
    */
  def streamCuratedCorpus(docs: DataFrame, corpusPath: String, checkpoint: String,
      idCol: String, textCol: String, cfg: Curate.Config = Curate.Config()) =
    StreamingIngest.curatedCorpusSink(docs, corpusPath, checkpoint, idCol, textCol, cfg)

  /** [[streamCuratedCorpus]] with a streaming-maintained dedup index —
    * per-batch cost tracks the batch, not the corpus (the daily-ingest
    * deployment shape); exactly-once through the index under replay.
    */
  def streamCuratedCorpusIndexed(docs: DataFrame, corpusPath: String, indexPath: String,
      checkpoint: String, idCol: String, textCol: String,
      cfg: Curate.Config = Curate.Config(), compactEvery: Int = 0) =
    StreamingIngest.curatedCorpusIndexedSink(docs, corpusPath, indexPath, checkpoint,
      idCol, textCol, cfg, compactEvery = compactEvery)

  /** Exact quantiles of an integral column without a global sort. */
  def exactQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double]): DataFrame =
    Quantiles.exactQuantiles(df, valueCol, qs)

  /** Per-document near-dup cluster sizes + 1/k soft-dedup weights. */
  def duplicationWeights(docs: DataFrame, idCol: String, text: Column,
      n: Int = 3, threshold: Double = 0.5): DataFrame =
    Dedup.duplicationWeights(docs, idCol, text, n, threshold)

  /** Soft-dedup sampled corpus: one expected survivor per cluster. */
  def softDedupSample(docs: DataFrame, idCol: String, text: Column,
      n: Int = 3, threshold: Double = 0.5): DataFrame =
    Dedup.softDedupSample(docs, idCol, text, n, threshold)

  /** Host-scoped boilerplate line removal (CCNet line-frequency trick). */
  def removeHostBoilerplate(docs: DataFrame, idCol: String, hostCol: String,
      textCol: String, minDf: Long): DataFrame =
    Curate.removeHostBoilerplate(docs, idCol, hostCol, textCol, minDf)

  /** Asymmetric containment pairs (Broder '97 containment, not
    * resemblance) — quote/boilerplate mining: a short document embedded
    * in a long one scores containment 1.0 at a Jaccard that vanishes
    * with length. Directional fractions ride along so callers keep the
    * container and cut the contained. Same candidate machinery and
    * hot-shingle guard as [[nearDupPairs]].
    */
  def containmentPairs(docs: DataFrame, idCol: String, text: Column,
      n: Int = 3, threshold: Double = 0.8): DataFrame =
    Dedup.containmentPairs(docs, idCol, text, n, threshold)

  /** Cutting form: drop documents contained in another (the contained
    * side loses; mutual containment keeps the smaller id); keeps the
    * caller's schema.
    */
  def removeContained(docs: DataFrame, idCol: String, text: Column,
      n: Int = 3, threshold: Double = 0.8): DataFrame =
    Dedup.removeContained(docs, idCol, text, n, threshold)

  /** [[duplicationWeights]] with the banded (MinHash+LSH) pair stage —
    * the 100-TB arm; weights match the exact arm wherever banding recall
    * holds (identical documents always collide).
    */
  def duplicationWeightsLsh(docs: DataFrame, idCol: String, text: Column,
      n: Int = 3, numPerm: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame =
    Dedup.duplicationWeightsLsh(docs, idCol, text, n, numPerm, bands,
      numPerm / bands, threshold)

  /** Power-iteration PageRank over a directed edge list — the host/domain
    * authority prior web-corpus curation weights documents by
    * ([[graft.ops.Graph.pageRank]]: one shuffle join + one keyed
    * aggregate per iteration, dangling mass redistributed, no driver-side
    * graph).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 10, damping: Double = 0.85): DataFrame =
    Graph.pageRank(edges, srcCol, dstCol, iters, damping)

  /** Weighted / personalized PageRank ([[graft.ops.Graph.pageRankWeighted]]):
    * integer edge weights split contributions w/W; an optional teleport
    * vector turns it into TrustRank (trust propagates from vetted seed
    * hosts and never leaks to unvetted ones through dangling pages).
    */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int = 10, damping: Double = 0.85,
      teleport: Option[DataFrame] = None): DataFrame =
    Graph.pageRankWeighted(edges, srcCol, dstCol, weightCol, iters, damping, teleport)

  /** Quote/boilerplate SOURCE authority, composed: [[containmentPairs]] →
    * citation edges (the contained side cites its container) →
    * [[pageRank]]. The document everyone copies outranks its copies.
    */
  def quoteAuthority(docs: DataFrame, idCol: String, text: Column, n: Int = 3,
      threshold: Double = 0.8, iters: Int = 10): DataFrame =
    Graph.pageRank(Graph.quoteEdges(
      Dedup.containmentPairs(docs, idCol, text, n, threshold), threshold),
      "src", "dst", iters)

  /** [[quoteAuthority]] at HOST grain — the site-level quality prior:
    * doc-level quote edges lifted through an id→host map (numeric host
    * ids; dictionary-encode strings first), then PageRank over hosts.
    */
  def hostAuthority(docs: DataFrame, idCol: String, hostCol: String,
      text: Column, n: Int = 3, threshold: Double = 0.8,
      iters: Int = 10): DataFrame =
    Graph.hostAuthority(
      Graph.quoteEdges(Dedup.containmentPairs(docs, idCol, text, n, threshold),
        threshold),
      docs, idCol, hostCol, iters)

  /** [[hostAuthority]] with quote MULTIPLICITY as edge weight — rank
    * splits by citation volume instead of collapsing multi-edges; pick
    * per corpus trust model ([[graft.ops.Graph.hostQuoteWeights]]).
    */
  def hostAuthorityWeighted(docs: DataFrame, idCol: String, hostCol: String,
      text: Column, n: Int = 3, threshold: Double = 0.8,
      iters: Int = 10): DataFrame =
    Graph.pageRankWeighted(
      Graph.hostQuoteWeights(
        Graph.quoteEdges(Dedup.containmentPairs(docs, idCol, text, n, threshold),
          threshold),
        docs, idCol, hostCol),
      "src", "dst", "w", iters)

  /** [[streamCuratedCorpusIndexed]]'s EMBEDDING twin: streaming semantic
    * dedup against a persisted vec ingest index — exactly-once through
    * the index under replay, SemDeDup within each micro-batch.
    */
  def streamSemanticCorpusIndexed(docs: DataFrame, corpusPath: String,
      indexPath: String, checkpoint: String, idCol: String, vecCol: String,
      threshold: Double = 0.9, numPlanes: Int = 8, dim: Int = 64,
      compactEvery: Int = 0) =
    StreamingIngest.semanticCorpusIndexedSink(docs, corpusPath, indexPath,
      checkpoint, idCol, vecCol, threshold, numPlanes, dim,
      compactEvery = compactEvery)

  /** Streaming arm of the persisted LM counts index: each micro-batch's
    * exact n-gram sufficient statistics fold under a ledgered batch id —
    * exactly-once under crash replay, near-flat per-batch cost
    * ([[graft.streaming.StreamingIngest.lmCountsIndexSink]]).
    */
  def streamLmCountsIndex(docs: DataFrame, indexPath: String,
      checkpoint: String, textCol: String = "text") =
    StreamingIngest.lmCountsIndexSink(docs, indexPath, checkpoint, textCol)

  /** Streaming arm of the persisted cluster-label index: each micro-batch
    * of near-dup pairs folds into the labels; exactly-once by ALGEBRA
    * (folds are idempotent fixpoints, no ledger)
    * ([[graft.streaming.StreamingIngest.ccIndexSink]]).
    */
  def streamCcIndex(pairs: DataFrame, indexPath: String, checkpoint: String) =
    StreamingIngest.ccIndexSink(pairs, indexPath, checkpoint)

  /** Streaming arm of the persisted HLL index: per-key sketches union
    * per micro-batch, exactly-once by register-max algebra
    * ([[graft.streaming.StreamingIngest.hllIndexSink]]).
    */
  def streamHllIndex(rows: DataFrame, indexPath: String, checkpoint: String,
      keyCol: String, valueCol: String, lgK: Int = 12) =
    StreamingIngest.hllIndexSink(rows, indexPath, checkpoint, keyCol, valueCol, lgK)

  /** Streaming media near-dup corpus over a persisted [[writeSimhashIndex]]
    * index: intra-batch Hamming dedup, probe, batch-owned corpus
    * partitions, idempotent index appends — exactly-once under replay
    * ([[graft.streaming.StreamingIngest.mediaCorpusIndexedSink]]).
    */
  def streamMediaCorpusIndexed(media: DataFrame, corpusPath: String,
      indexPath: String, checkpoint: String, idCol: String, sigCol: String,
      maxDist: Int = 2, compactEvery: Int = 0) =
    StreamingIngest.mediaCorpusIndexedSink(media, corpusPath, indexPath,
      checkpoint, idCol, sigCol, maxDist, compactEvery)

  /** Persisted Hamming near-dup index over ANY 64-bit perceptual
    * signature (text SimHash, image aHash/dHash/pHash, audio/video
    * fingerprints — [[graft.ops.Dedup.SimhashIndex]]): build once,
    * append batches idempotently, probe each batch with batch-sized
    * compute instead of re-chunking the corpus.
    */
  def writeSimhashIndex(sig: DataFrame, idCol: String, sigCol: String,
      path: String, maxDist: Int): Unit =
    Dedup.writeSimhashIndex(sig, idCol, sigCol, path, maxDist)
  def readSimhashIndex(spark: SparkSession, path: String): Dedup.SimhashIndex =
    Dedup.readSimhashIndex(spark, path)
  def appendToSimhashIndex(spark: SparkSession, path: String, newSigs: DataFrame,
      idCol: String, sigCol: String): Unit =
    Dedup.appendToSimhashIndex(spark, path, newSigs, idCol, sigCol)
  def probeSimhashIndex(idx: Dedup.SimhashIndex, batch: DataFrame,
      idCol: String, sigCol: String): DataFrame =
    Dedup.probeSimhashIndex(idx, batch, idCol, sigCol)
  def compactSimhashIndex(spark: SparkSession, path: String,
      targetFiles: Int = 1): Unit =
    Dedup.compactSimhashIndex(spark, path, targetFiles)

  /** Incremental image near-dup: hash the batch ([[graft.ops.Multimodal
    * .aHash64]]) and probe a persisted [[writeSimhashIndex]] index —
    * the daily media-ingest shape.
    */
  def imageNearDupIndexed(idx: Dedup.SimhashIndex, batch: DataFrame,
      idCol: String, pixels: Column, w: Int, h: Int): DataFrame =
    Multimodal.imageNearDupIndexed(idx, batch, idCol, pixels, w, h)

  /** 64-bit audio perceptual fingerprint of a PCM sample column —
    * silence-trim → 16×16 resample → integer DCT → median sign bits;
    * invariant to silence padding and integer volume scaling.
    */
  def audioFingerprint(samples: Column, silenceThr: Int = 8): Column =
    Multimodal.audioHash64(samples, silenceThr)

  /** Audio near-dup pairs within a Hamming radius over
    * [[audioFingerprint]]s (chunk-bucketed candidates, no all-pairs).
    */
  def audioNearDupPairs(df: DataFrame, idCol: String, samples: Column,
      maxDist: Int = 2): DataFrame =
    Multimodal.audioNearDupPairs(df, idCol, samples, maxDist)

  /** [[audioNearDupPairs]] behind a cheap coarse pre-key (sketch gates
    * exact): the full fingerprint kernel runs only on streams whose
    * coarse bucket has ≥ 2 members — the crawl-scale arm. Pairs are
    * reported iff both members share a coarse key and their fingerprints
    * are within `maxDist`; pad/scale twins always share a key.
    */
  def audioNearDupPairsGated(df: DataFrame, idCol: String, samples: Column,
      maxDist: Int = 2): DataFrame =
    Multimodal.audioNearDupPairsGated(df, idCol, samples, maxDist)

  /** Video near-dup pairs: sampled-frame digest sets scored by exact
    * Jaccard through the text-dedup candidate machinery.
    */
  def videoNearDupPairs(spark: SparkSession, media: DataFrame, frameBytes: Int,
      everyN: Int, threshold: Double): DataFrame =
    Multimodal.videoNearDupPairs(spark, media, frameBytes, everyN, threshold)

  /** Fold a batch-maintained index's parquet append deltas into few
    * files (crash-safe staging+marker+swap; readers self-heal an
    * interrupted fold). One wrapper per index layout in
    * [[graft.ops.Dedup]]: `compactHashIndex` / `compactBandIndex` /
    * `compactVecIndex` / `compactParagraphIndex`.
    */
  def compactParagraphIndex(spark: SparkSession, path: String,
      targetFiles: Int = 1): Unit =
    Dedup.compactParagraphIndex(spark, path, targetFiles)
}
