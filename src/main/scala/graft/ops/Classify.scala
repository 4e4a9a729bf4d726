package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature linear quality classifier — the fastText inference
  * shape (Joulin et al. '16) that CCNet-descended pipelines run as their
  * learned quality filter: word unigram + bigram features, hashed into a
  * fixed bucket space, a linear weight per bucket, classify on the mean
  * weight. This is the INFERENCE path (a pinned model ships with the
  * job); [[Dsir]] is the companion that ESTIMATES a table from data.
  * Completes the quality family: heuristic ([[TextStats.qualityScore]])
  * → LM fluency ([[TextStats.lmAnnotate]]) → importance ([[Dsir]]) →
  * learned linear (this).
  *
  * Engine-portable determinism (the [[TextStats.lmAnnotate]]/[[Dsir]]
  * discipline): weights are INTEGER centi-logits, a document's score is
  * an exact order-free integer sum over its features, and the gate never
  * computes a sigmoid — σ is monotone, so `σ(mean) ≥ σ(t)` is decided as
  * the all-integer cross-multiplication `Σw ≥ t·n` (zero FP anywhere in
  * the decision; the reported `clf_score` mean pays exactly one IEEE
  * division, [[graft.Canonical.round4]]-canonicalized).
  *
  * Hashing-trick fine print: vocabulary entries landing in the same
  * bucket SUM their weights, and any corpus feature colliding into a
  * vocabulary bucket picks up that bucket's weight — faithful to how a
  * real hashed model behaves, surfaced by [[weightTable]] being the
  * collision-summed map rather than a term dictionary.
  *
  * 100-TB shape: the model is a driver CONSTANT (≤ [[Buckets]] entries)
  * riding into the plan as a `typedlit` map literal, so scoring is a
  * SHUFFLE-FREE codegen'd projection — each feature costs one
  * fingerprint + one map probe, nothing corpus-scale moves, and the
  * gate collapses to a scan-side filter.
  */
object Classify {

  /** Hashed bucket space. 4096 keeps the demo vocabulary collision-free
    * in practice while exercising real modular hashing; a production
    * fastText table (millions of buckets) rides the same way.
    */
  val Buckets = 4096

  /** Pinned demo model: centi-logit weights for natural-prose indicators
    * (positive) and boilerplate/spam indicators (negative), unigrams and
    * bigrams. A real exported model substitutes its own (term, weight)
    * rows; everything downstream is term-agnostic.
    */
  val DefaultVocab: Seq[(String, Long)] = Seq(
    // prose indicators
    "the" -> 15L, "and" -> 12L, "because" -> 30L, "however" -> 35L,
    "therefore" -> 35L, "which" -> 20L, "would" -> 18L, "about" -> 15L,
    "of the" -> 25L, "in the" -> 22L, "it is" -> 20L, "there are" -> 25L,
    "such as" -> 30L, "as well" -> 25L,
    // boilerplate / spam indicators
    "click" -> -60L, "subscribe" -> -45L, "cookie" -> -40L,
    "javascript" -> -70L, "login" -> -35L, "password" -> -40L,
    "click here" -> -90L, "buy now" -> -90L, "free shipping" -> -70L,
    "sign up" -> -55L, "casino" -> -120L, "winner" -> -50L,
    "lorem" -> -100L, "ipsum" -> -100L,
    "rights reserved" -> -45L, "terms of" -> -35L, "privacy policy" -> -40L)

  /** Portable bucket of one feature string:
    * `fingerprint(f) mod Buckets` — the same positional fingerprint
    * every other sketch op hashes with, so the oracle recomputes bucket
    * ids independently.
    */
  def bucketOf(f: Column): Column =
    pmod(graft.functions.TextFunctions.fingerprint(f), lit(Buckets.toLong))

  /** The collision-summed bucket→centi-weight map a vocabulary compiles
    * to (driver-side, bounded by the vocabulary size).
    */
  def weightTable(vocab: Seq[(String, Long)] = DefaultVocab): Map[Long, Long] =
    vocab.groupBy { case (term, _) =>
      Math.floorMod(graft.functions.PositionalFingerprint.of(term), Buckets.toLong)
    }.map { case (b, entries) => b -> entries.map(_._2).sum }

  /** Unigram + bigram feature array (with multiplicity, fastText-style)
    * from a prebuilt token array, let-bound ([[graft.Canonical.bindOnce]])
    * so the bigram lambda reads a VARIABLE: higher-order functions are
    * interpreted (CodegenFallback), and an expression tree captured
    * inside the lambda re-runs per ELEMENT — tokenization inlined here
    * made scoring O(tokens²) regex work per document (caught by the 32×
    * scale pilot: 40 s for 5 000 docs).
    */
  def featuresFromToks(toksE: Column): Column =
    graft.Canonical.bindOnce(toksE) { toks =>
      val bigrams = when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>"))
      concat(toks, bigrams)
    }

  /** Annotate each document with
    *   - `clf_n_feats` — feature count (unigrams + bigrams, long);
    *   - `clf_centi`   — exact integer sum of hashed-bucket centi-logit
    *     weights (0 for feature-free documents);
    *   - `clf_score`   — the mean logit `clf_centi / (100·clf_n_feats)`,
    *     [[graft.Canonical.round4]]ed (0.0 when feature-free) — the
    *     number a sigmoid would be applied to, reported raw so the
    *     oracle never touches `exp`.
    */
  def annotate(docs: DataFrame, textCol: String = "text",
      vocab: Seq[(String, Long)] = DefaultVocab): DataFrame =
    annotateWith(docs, weightTable(vocab), textCol)

  /** [[annotate]] over an explicit bucket→centi-weight table — the form a
    * [[train]]ed model scores through (same plan: `typedlit` map literal,
    * shuffle-free codegen'd projection).
    */
  def annotateWith(docs: DataFrame, table: Map[Long, Long],
      textCol: String = "text"): DataFrame = {
    val lut = typedlit(table)
    // ONE evaluation of tokenize→features per row (round 15): the
    // feature array is let-bound ([[graft.Canonical.bindOnce]]) so both
    // aggregates read the same array, and the (count, sum) pair is
    // staged behind a plan barrier ([[graft.Canonical.stageOnce]]) so
    // downstream references (clf_score, keep predicates, collapsed
    // projections) never inline the tokenize tree again
    val stats = graft.Canonical.bindOnce(
        featuresFromToks(TextStats.lmTokens(col(textCol)))) { fs =>
      struct(
        size(fs).cast("long").as("n"),
        aggregate(
          transform(fs, f => coalesce(element_at(lut, bucketOf(f)), lit(0L))),
          lit(0L), (acc, x) => acc + x).as("centi"))
    }
    graft.Canonical.stageOnce(docs, Seq("__clf" -> stats))
      .withColumn("clf_n_feats", col("__clf.n"))
      .withColumn("clf_centi", col("__clf.centi"))
      .withColumn("clf_score", graft.Canonical.round4(
        when(col("clf_n_feats") === 0L, lit(0.0))
          .otherwise(col("clf_centi").cast("double") /
            (col("clf_n_feats").cast("double") * lit(100.0)))))
      .drop("__clf")
  }

  /** TRAIN a weight table from a labeled corpus — the missing half of the
    * quality-classifier family ([[annotate]] is inference over a pinned
    * model; this produces the model). Multinomial Naive Bayes log-odds
    * over the SAME hashed unigram+bigram feature space the scorer reads:
    *
    *   w(b) = 100 · ( ln((c⁺_b + α)/(N⁺ + α·B)) − ln((c⁻_b + α)/(N⁻ + α·B)) )
    *
    * with per-class bucket counts c±, class feature totals N±, Laplace α,
    * bucket count B = [[Buckets]], `floor(·+0.5)`-quantized to the integer
    * centi-logits [[annotateWith]] sums. Naive Bayes rather than SGD
    * because the closed form is ORDER-FREE: counts are exact integer
    * aggregates, so the trained model is deterministic under any
    * partitioning/retry and every weight is value-oracle-checkable —
    * fastText's logistic fit trades that replayability for a few points
    * of accuracy, the wrong trade for a lineage-audited data pipeline.
    *
    * 100-TB shape: explode → ONE map-side-combined count shuffle bounded
    * post-shuffle by 2·[[Buckets]] rows; class totals aggregate the tiny
    * counts frame (broadcast back); weights are a scan-side projection of
    * that frame. Nothing corpus-sized moves twice, nothing sorts.
    *
    * Returns (bucket, n_pos, n_neg, weight_centi) for every OBSERVED
    * bucket; unobserved buckets score 0 at inference (coalesce), which is
    * the α-symmetric prior log-odds rounded — consistent by construction.
    * Rows with a NULL label are ignored (unlabeled pool).
    */
  def train(docs: DataFrame, labelCol: Column, textCol: String = "text",
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val counts = docs
      .withColumn("__lab", labelCol)
      .filter(col("__lab").isNotNull)
      .withColumn("__clf_toks", TextStats.lmTokens(col(textCol)))
      .withColumn("__clf_fs", featuresFromToks(col("__clf_toks")))
      .select(col("__lab"), explode(col("__clf_fs")).as("__f"))
      .select(col("__lab"), bucketOf(col("__f")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("__lab"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("__lab"), 1L).otherwise(0L)).as("n_neg"))
    weightsFromCounts(counts, alpha)
  }

  /** Weight recompute over a (bucket, n_pos, n_neg) frame — shared by
    * [[train]] and [[mergeTrained]] so a merged model can never use
    * different arithmetic than a from-scratch one.
    */
  private def weightsFromCounts(counts: DataFrame, alpha: Double): DataFrame = {
    val tot = counts.agg(sum(col("n_pos")).as("__tp"), sum(col("n_neg")).as("__tn"))
    counts.crossJoin(broadcast(tot))
      .withColumn("weight_centi",
        floor((log((col("n_pos") + lit(alpha)) / (col("__tp") + lit(alpha * Buckets)))
          - log((col("n_neg") + lit(alpha)) / (col("__tn") + lit(alpha * Buckets))))
          * lit(100.0) + lit(0.5)).cast("long"))
      .select(col("bucket"), col("n_pos"), col("n_neg"), col("weight_centi"))
  }

  /** Incremental retrain: merge two [[train]]ed tables into the model of
    * the combined corpus WITHOUT re-reading either corpus — Naive Bayes
    * sufficient statistics are the per-bucket counts, which are additive,
    * so `mergeTrained(train(A), train(B)) == train(A ∪ B)` EXACTLY (the
    * OpsSpec drill asserts row equality, weights included). The daily
    * pipeline shape: train on the day's labeled batch, merge into the
    * persisted table, scores stay replayable end to end. Cost: a
    * ≤2·[[Buckets]]-row outer join — nothing corpus-scale.
    */
  def mergeTrained(a: DataFrame, b: DataFrame, alpha: Double = 1.0): DataFrame = {
    val counts = a.select(col("bucket"), col("n_pos"), col("n_neg"))
      .unionByName(b.select(col("bucket"), col("n_pos"), col("n_neg")))
      .groupBy(col("bucket"))
      .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_neg")).as("n_neg"))
    weightsFromCounts(counts, alpha)
  }

  /** Collect a [[train]]ed table into the driver-side map
    * [[annotateWith]] scores through (≤ [[Buckets]] rows by
    * construction — driver-bounded like every sketch collect).
    */
  def trainedTable(trained: DataFrame): Map[Long, Long] =
    trained.select(col("bucket"), col("weight_centi")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** The keep verdict at mean-centi-logit threshold `minMeanCenti`
    * (default 0 = sigmoid 0.5): `clf_centi ≥ minMeanCenti · clf_n_feats`
    * — all-integer, no sigmoid, exactly σ(mean) ≥ σ(threshold) by
    * monotonicity. Feature-free documents fail (nothing to classify on,
    * the conservative call for a quality gate).
    */
  def keepPredicate(minMeanCenti: Long = 0L): Column =
    col("clf_n_feats") > 0L &&
      col("clf_centi") >= lit(minMeanCenti) * col("clf_n_feats")

  /** [[annotate]] + `clf_keep` (audit form). */
  def gate(docs: DataFrame, textCol: String = "text",
      vocab: Seq[(String, Long)] = DefaultVocab,
      minMeanCenti: Long = 0L): DataFrame =
    annotate(docs, textCol, vocab).withColumn("clf_keep", keepPredicate(minMeanCenti))

  /** The classifier's survivors with the caller's schema (cutting form). */
  def filterLowQuality(docs: DataFrame, textCol: String = "text",
      vocab: Seq[(String, Long)] = DefaultVocab,
      minMeanCenti: Long = 0L): DataFrame = {
    val cols = docs.columns.toSeq
    gate(docs, textCol, vocab, minMeanCenti)
      .filter(col("clf_keep"))
      .select(cols.map(col): _*)
  }
}
