package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance scoring — "which raw documents look like my
  * target corpus?" (Xie et al. 2023, *Data Selection for Language Models
  * via Importance Resampling*): estimate unigram distributions over
  * HASHED feature buckets for a small target corpus and the raw corpus,
  * then score every raw document by the sum of per-token log-likelihood
  * ratios. High scores ≈ target-like documents; resampling by score is
  * the selection step of a pretraining mix.
  *
  * Engine-portable determinism (the same discipline as
  * [[TextStats.lmAnnotate]]'s centi-log table): per-bucket ratios are
  * quantized ONCE to integer centi-log10 units (`floor(llr·100 + 0.5)`,
  * round-half-toward-+∞ — [[graft.Canonical]]'s formula), and every
  * per-document score is an exact INTEGER sum of those units — order-free
  * under any partitioning, and replayable by any SQL engine. Tokens hash
  * into buckets through the portable positional fingerprint
  * ([[TextStats.fingerprint]]), not `xxhash64`, so the oracle recomputes
  * bucket ids independently.
  *
  * 100-TB shape: the feature table is a BOUNDED SKETCH — exactly
  * [[Buckets]] rows regardless of corpus size (the two estimation passes
  * are map-side-combined aggregates collapsing to ≤ [[Buckets]] groups
  * each). Collected to the driver ([[featureTable]] — same bounded-
  * materialization pattern as the CMS / Bloom sketches), it rides into
  * [[annotate]] as a map LITERAL, making scoring a SHUFFLE-FREE
  * projection: no explode-shuffle, no join, nothing corpus-scale moves.
  */
object Dsir {

  /** Hashed feature buckets. Small enough that the table is a sketch
    * (8 KiB of longs), large enough that collisions don't flatten the
    * ratio signal at n-gram granularity.
    */
  val Buckets = 1024

  /** Tokens for feature hashing: lowercased alphanumeric runs (shared
    * with the LM gate — [[TextStats.lmTokens]]).
    */
  def dsirTokens(text: Column): Column = TextStats.lmTokens(text)

  /** Portable bucket of one token: `fingerprint(tok) mod Buckets`. */
  def bucketOf(tok: Column): Column =
    pmod(graft.functions.TextFunctions.fingerprint(tok), lit(Buckets.toLong))

  /** Per-bucket token counts of a corpus: (bucket, cnt) with ≤ [[Buckets]]
    * rows — explode + map-side-combined count, nothing else.
    */
  private def bucketCounts(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(explode(dsirTokens(col(textCol))).as("__tok"))
      .select(bucketOf(col("__tok")).as("__bucket"))
      .groupBy(col("__bucket")).agg(count(lit(1)).as("__cnt"))

  /** The quantized log-likelihood-ratio table: for each bucket b,
    *
    *   `centi_llr(b) = floor(100·[ (log10(tc_b+1) − log10(T+B))
    *                             − (log10(rc_b+1) − log10(R+B)) ] + 0.5)`
    *
    * where tc/rc are target/raw token counts in b, T/R the corpora's total
    * token counts and B = [[Buckets]] (add-one smoothing, so buckets the
    * target never hits still score finitely). Returned as a dense
    * [[Buckets]]-entry map (buckets absent from BOTH corpora get the
    * all-smoothed ratio, identical to their sparse-row absence).
    *
    * Driver materialization is bounded by construction: exactly
    * [[Buckets]] longs, independent of corpus size.
    */
  def featureTable(target: DataFrame, raw: DataFrame, textCol: String = "text"): Map[Long, Long] = {
    val tc = bucketCounts(target, textCol)
      .withColumnRenamed("__cnt", "__tc")
    val rc = bucketCounts(raw, textCol)
      .withColumnRenamed("__cnt", "__rc")
    val joined = tc.join(rc, Seq("__bucket"), "full_outer")
      .select(col("__bucket"),
        coalesce(col("__tc"), lit(0L)).as("__tc"),
        coalesce(col("__rc"), lit(0L)).as("__rc"))
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // totals via a window over the ≤Buckets-row frame (no second pass);
    // the llr arithmetic is written with EXPLICIT association so the SQL
    // oracle reproduces the identical IEEE evaluation order
    val b = lit(Buckets.toDouble)
    val rows = joined
      .withColumn("__T", sum(col("__tc")).over(w))
      .withColumn("__R", sum(col("__rc")).over(w))
      .withColumn("__centi", floor(
        ((log10(col("__tc") + lit(1.0)) - log10(col("__T") + b))
          - (log10(col("__rc") + lit(1.0)) - log10(col("__R") + b))) * lit(100.0)
          + lit(0.5)).cast("long"))
      .select(col("__bucket"), col("__centi"), col("__T"), col("__R"))
      .collect()
    val sparse = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // buckets absent from both corpora: tc=rc=0 → the all-smoothed ratio
    val (tTot, rTot) =
      if (rows.isEmpty) (0L, 0L) else (rows.head.getLong(2), rows.head.getLong(3))
    val absent = math.floor(
      ((math.log10(1.0) - math.log10(tTot + Buckets.toDouble))
        - (math.log10(1.0) - math.log10(rTot + Buckets.toDouble))) * 100.0 + 0.5).toLong
    (0L until Buckets.toLong).map(b => b -> sparse.getOrElse(b, absent)).toMap
  }

  /** Annotate each document with
    *   - `dsir_n_toks`  — token count (long);
    *   - `dsir_centi`   — exact integer sum of its tokens' bucket
    *     centi-llr units (0 for token-free documents): higher = more
    *     target-like.
    *
    * A single shuffle-free projection — the table is a driver-constant
    * map literal, each token costs one fingerprint + one map probe.
    */
  def annotate(docs: DataFrame, table: Map[Long, Long], textCol: String = "text"): DataFrame = {
    val lut = typedlit(table)
    val toks = dsirTokens(col(textCol))
    val centi = aggregate(
      transform(toks, t => element_at(lut, bucketOf(t)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    docs
      .withColumn("dsir_n_toks", size(toks).cast("long"))
      .withColumn("dsir_centi", centi)
  }

  /** Keep the most target-like `frac` of documents — the selection step,
    * in the sketch-threshold form that never sorts the corpus (the
    * [[TextStats.qualityPruneApprox]] discipline): pass 1 sketches the
    * `1−frac` quantile of `dsir_centi` (mergeable KLL-style sketch, tiny
    * fixed state); pass 2 keeps rows scoring ABOVE it. Kept count is
    * `frac·n` ± sketch error; threshold-equal rows drop together
    * (deterministic content-defined cut).
    */
  def resample(docs: DataFrame, table: Map[Long, Long], frac: Double,
      textCol: String = "text", accuracy: Int = 10000): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0,1], got $frac")
    val scored = annotate(docs, table, textCol)
    if (frac == 1.0) scored
    else {
      val thr = scored.agg(
        percentile_approx(col("dsir_centi"), lit(1.0 - frac), lit(accuracy)).as("__thr"))
      scored.join(broadcast(thr)).filter(col("dsir_centi") > col("__thr")).drop("__thr")
    }
  }

  /** DuckDB twin of [[featureTable]] + [[annotate]]: a CTE chain ending in
    * `__dsir(doc_id-cols…, dsir_n_toks, dsir_centi)`, reading the target
    * from `__dsir_target(text)` and the scored corpus from
    * `__dsir_in(…, text)`. Shares the exact arithmetic: fingerprint-mod
    * buckets, add-one smoothing, the same explicitly-associated log10
    * expression, the same floor(x·100+0.5) quantization, integer sums.
    */
  def annotateSql(): String = {
    def fpBucket(ref: String): String =
      s"(${graft.ops.TextStats.fingerprintSql(ref)} % $Buckets + $Buckets) % $Buckets"
    s"""__tt AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM __dsir_target),
       |__tb AS (SELECT ${fpBucket("tok")} AS bucket FROM __tt),
       |__tcnt AS (SELECT bucket, count(*) AS tc FROM __tb GROUP BY 1),
       |__rt AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM __dsir_in),
       |__rb AS (SELECT ${fpBucket("tok")} AS bucket FROM __rt),
       |__rcnt AS (SELECT bucket, count(*) AS rc FROM __rb GROUP BY 1),
       |__tot AS (SELECT (SELECT coalesce(sum(tc), 0) FROM __tcnt) AS T,
       |                 (SELECT coalesce(sum(rc), 0) FROM __rcnt) AS R),
       |__lut AS (SELECT b.range AS bucket,
       |    CAST(floor(((log10(coalesce(t.tc, 0) + 1.0) - log10(T + ${Buckets}.0))
       |      - (log10(coalesce(r.rc, 0) + 1.0) - log10(R + ${Buckets}.0))) * 100.0 + 0.5) AS BIGINT) AS centi
       |  FROM range(0, $Buckets) b CROSS JOIN __tot
       |  LEFT JOIN __tcnt t ON t.bucket = b.range
       |  LEFT JOIN __rcnt r ON r.bucket = b.range),
       |__dtok AS (SELECT d.*, CAST(len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS BIGINT) AS dsir_n_toks,
       |    unnest(CASE WHEN len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) = 0 THEN [NULL]
       |           ELSE regexp_extract_all(lower(d.text), '[a-z0-9]+') END) AS tok
       |  FROM __dsir_in d),
       |__dsc AS (SELECT * EXCLUDE (bucket, centi),
       |    CASE WHEN tok IS NULL THEN 0 ELSE centi END AS lp
       |  FROM (SELECT *, ${fpBucket("tok")} AS __tokb FROM __dtok) x
       |  LEFT JOIN __lut ON __lut.bucket = CASE WHEN tok IS NULL THEN -1 ELSE __tokb END),
       |__dsir AS (SELECT * EXCLUDE (tok, lp, __tokb), CAST(sum(lp) AS BIGINT) AS dsir_centi
       |  FROM __dsc GROUP BY ALL)""".stripMargin
  }
}
