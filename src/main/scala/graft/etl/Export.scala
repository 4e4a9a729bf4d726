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
}
