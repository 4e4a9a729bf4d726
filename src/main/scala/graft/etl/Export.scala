package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded training-data export with a verifiable manifest — the sink
  * shape a dataset release actually ships: N content-addressed shards a
  * downstream loader can fetch/verify independently, plus a manifest
  * whose every number can be recomputed from the source (and by the
  * DuckDB oracle) — row counts, id bounds, and a content checksum per
  * shard.
  *
  * Shard assignment is a pure function of the id through the PORTABLE
  * [[graft.functions.PositionalFingerprint]] hash of its decimal string
  * (NOT `xxhash64`, which only Spark can compute): re-exports land every
  * row in the same shard on any engine any day, and the manifest can be
  * audited without Spark. The checksum is order-independent (a sum), so
  * it verifies CONTENT independent of row order within a shard — exactly
  * what a parallel loader needs.
  *
  * Checksum wrap contract: the checksum is the per-shard fingerprint sum
  * DEFINED MOD 2⁶⁴ (two's-complement, i.e. exactly what a 64-bit integer
  * sum wraps to). Spark's non-ANSI long sum implements this natively; an
  * auditor whose engine widens sums (DuckDB promotes BIGINT sums to
  * HUGEINT) must apply the wrap explicitly —
  * `CASE WHEN s % 2^64 >= 2^63 THEN s % 2^64 - 2^64 ELSE s % 2^64 END`
  * over the HUGEINT sum `s` (fingerprints are non-negative). Without a
  * defined wrap, a large shard (≳2⁴⁰ fingerprint-weighted chars)
  * overflows silently in one engine and errors in the other.
  *
  * Plan shape at 100 TB: one `partitionBy(shard)` write (each task
  * writes ≤ N shard files — with a `repartition(shardCol)` upstream each
  * task writes exactly one), one scan of the written data for the
  * manifest (reading back VERIFIES the files, not the input: a manifest
  * derived from the input would happily describe a corrupted write).
  */
object Export {

  /** `pmod(fingerprint(CAST(id AS STRING)), nShards)` — deterministic,
    * engine-portable shard id in [0, nShards).
    */
  def shardOf(idCol: String, nShards: Int): org.apache.spark.sql.Column =
    pmod(graft.functions.TextFunctions.fingerprint(col(idCol).cast("string")),
      lit(nShards.toLong))

  /** Write `df` to `path` partitioned into `nShards` content-addressed
    * shards, then read the files back and return the manifest:
    * (shard, n_rows, min_id, max_id, checksum) with
    * `checksum = Σ fingerprint(coalesce(contentCol, ''))` per shard.
    */
  def sharded(spark: SparkSession, df: DataFrame, idCol: String,
      contentCol: String, path: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn("shard", shardOf(idCol, nShards))
      .repartition(col("shard")) // one writer task per shard: no small files
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    manifest(spark.read.parquet(path), idCol, contentCol)
  }

  /** The manifest of an already-sharded frame (column `shard` present). */
  def manifest(sharded: DataFrame, idCol: String, contentCol: String): DataFrame =
    sharded.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"),
        sum(graft.functions.TextFunctions.fingerprint(
          coalesce(col(contentCol), lit("")))).as("checksum"))

  // — deterministic training order ————————————————————————————————————————
  //   A training dataloader needs a reproducible global shuffle (an
  //   "epoch permutation") plus a shard/position manifest: worker w reads
  //   shard w and steps through positions in order. `sample(...)`/`rand()`
  //   orders change across retries and partitionings; these are pure
  //   functions of (seed, id), so epoch 3 of run B is bit-identical to
  //   epoch 3 of run A on any cluster.

  /** Bucket fan-out of the rank plans (shared discipline with
    * [[graft.ops.Sampling]]): the seeded order is DEFINED as
    * `(fp mod 256, fp, id)` with `fp = fingerprint(seed || ':' || id)`,
    * so the bucket is the order's own leading key and per-bucket
    * row_numbers + bucket offsets concatenate into the exact global rank
    * while the sort runs in up to 256 parallel tasks.
    */
  private val OrderBuckets = 256L

  private def seededFp(idCol: String, seed: String) =
    graft.functions.TextFunctions.fingerprint(
      concat(lit(seed), lit(":"), col(idCol).cast("string")))

  /** Deterministic epoch shuffle: adds
    *   - `ord`   — the row's 1-based position in the seeded global order;
    *   - `shard` — `(ord−1) mod nShards` (round-robin interleave, so
    *     shard row counts differ by ≤1 and every shard samples the whole
    *     order uniformly);
    *   - `pos`   — `(ord−1) div nShards`, the row's position WITHIN its
    *     shard.
    *
    * A new seed is a new permutation (epoch reshuffle); the same seed
    * reproduces the same (ord, shard, pos) for every row on any engine —
    * the fingerprint order is engine-portable, unlike `xxhash64`.
    *
    * Scale shape: two-pass bucketed rank — a map-side-combined per-bucket
    * count, a window over that 256-row frame for offsets (AQE broadcasts
    * the join-back), then `row_number` WITHIN each bucket. No global
    * sort task ever sees more than ~1/256 of the data.
    */
  def trainOrder(df: DataFrame, idCol: String, seed: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val W = org.apache.spark.sql.expressions.Window
    val base = df.withColumn("__fp", seededFp(idCol, seed))
      .withColumn("__b", pmod(col("__fp"), lit(OrderBuckets)))
    val wOff = W.orderBy(col("__b")).rowsBetween(W.unboundedPreceding, -1)
    val offs = base.groupBy(col("__b")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .select(col("__b").as("__ob"), col("__off"))
    val wIn = W.partitionBy(col("__b")).orderBy(col("__fp"), col(idCol))
    base.join(offs, col("__b") === col("__ob"))
      .withColumn("ord", col("__off") + row_number().over(wIn))
      .withColumn("shard", pmod(col("ord") - 1, lit(nShards.toLong)))
      .withColumn("pos", floor((col("ord") - 1) / nShards).cast("long"))
      .drop("__fp", "__b", "__ob", "__off")
  }

  /** Token-balanced CONTIGUOUS shards over the same seeded order: shard
    * boundaries fall on token-prefix quantiles —
    * `shard = floor(tokens_before · nShards / total_tokens)` — so every
    * shard carries `total/nShards` tokens ± one document, the balance
    * target when documents vary 100× in length and workers step in
    * lock-step batches. `ord` orders rows within a shard.
    *
    * Same two-pass bucketed plan with a token prefix sum instead of a
    * count ([[graft.ops.Sampling.tokenBudget]]'s discipline over the
    * portable order).
    */
  def trainOrderTokenShards(df: DataFrame, idCol: String, seed: String,
      nShards: Int, tokenCount: org.apache.spark.sql.Column): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val W = org.apache.spark.sql.expressions.Window
    val base = df.withColumn("__tok", tokenCount.cast("long"))
      .withColumn("__fp", seededFp(idCol, seed))
      .withColumn("__b", pmod(col("__fp"), lit(OrderBuckets)))
    val wOff = W.orderBy(col("__b")).rowsBetween(W.unboundedPreceding, -1)
    val wAll = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    val offs = base.groupBy(col("__b"))
      .agg(count(lit(1)).as("__cnt"), sum(col("__tok")).as("__btok"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .withColumn("__toff", coalesce(sum(col("__btok")).over(wOff), lit(0L)))
      .withColumn("__total", sum(col("__btok")).over(wAll))
      .select(col("__b").as("__ob"), col("__off"), col("__toff"), col("__total"))
    val wIn = W.partitionBy(col("__b")).orderBy(col("__fp"), col(idCol))
    val wInTok = wIn.rowsBetween(W.unboundedPreceding, -1)
    base.join(offs, col("__b") === col("__ob"))
      .withColumn("ord", col("__off") + row_number().over(wIn))
      .withColumn("__before",
        col("__toff") + coalesce(sum(col("__tok")).over(wInTok), lit(0L)))
      .withColumn("shard",
        least(floor(col("__before") * nShards / greatest(col("__total"), lit(1L))),
          lit(nShards - 1L)).cast("long"))
      .drop("__tok", "__fp", "__b", "__ob", "__off", "__toff", "__total", "__before")
  }
}
