package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, all designed for
  * the 100-TB regime:
  *
  *   - [[exact]]: content-hash groupBy — one shuffle on a 256-bit hash, no
  *     wide rows move (hash first, shuffle the hash).
  *   - [[minhashSignatures]] + [[lshCandidates]] + [[jaccardVerify]]:
  *     MinHash+LSH (Broder '97 / MMDS ch.3) — shingle→minhash→band→
  *     bucket-join; only same-bucket pairs are verified, so the quadratic
  *     all-pairs comparison never materializes.
  *   - [[simhash]] + [[simhashPairs]]: Charikar '02 64-bit SimHash with the
  *     chunk-index trick (pairs within Hamming distance k must share one of
  *     k+1 chunks) — again no all-pairs.
  *   - [[ngramJaccardPairs]]: exact n-gram Jaccard via shingle inverted
  *     index (explode + self-join on shingle) — exact but heavier; the
  *     LSH paths are the scale route.
  *
  * Hot-bucket guards: every self-join here (shingle index, LSH band
  * buckets, SimHash chunk buckets) caps the bucket size BEFORE the join.
  * One shingle shared by 1M docs is 5·10¹¹ pairs in a single reducer —
  * the unguarded quadratic pocket that kills the job at 100 TB. The two
  * guard shapes differ deliberately:
  *
  *   - SHINGLE df-caps ([[ngramJaccardPairs]]) DROP the hot shingle from
  *     candidate generation — a stop-phrase shingle carries no dedup
  *     signal, and a true dup pair always shares low-df shingles too;
  *   - BAND/CHUNK bucket caps ([[lshCandidates]], [[simhashPairs]])
  *     degrade the hot bucket to linear STAR candidates (hub = min id)
  *     instead of dropping it — an oversized signature bucket is usually
  *     a true mass-dup cluster, the single most important thing a 100-TB
  *     dedup must find.
  *
  * Jaccard/Hamming verification always runs on the full, uncapped sets,
  * so scores are exact for every pair that is generated.
  *
  * No UDFs anywhere: `xxhash64`, higher-order array functions and
  * `bit_count` keep everything inside codegen.
  */
object Dedup {

  val MersennePrime31: Long = 2147483647L // 2^31 - 1

  /** Default bucket-size cap for candidate-generating self-joins: bounds
    * any single bucket's pair contribution to C(cap, 2) ≈ 1.3M pairs —
    * safely inside one reducer's budget at any corpus size.
    */
  val DefaultMaxBucket: Int = 1638

  /** Max batch rows that still broadcast in the incremental batch-vs-
    * corpus probes (~a few hundred MB of banded vectors — the comfortable
    * hashed-relation band; same evidence-over-estimates discipline as
    * [[Decontaminate.BenchBroadcastCap]]).
    */
  val BatchBroadcastCap: Long = 1000000L

  /** Max corpus hash-index rows that still broadcast in the incremental
    * exact probes (~tens of MB of 64-char hashes — comfortably inside a
    * hashed relation). Above it the exact join degrades to sort-merge on
    * the hash: the batch side of a left join is preserved and can never
    * be the build side, so without this evidence gate a checkpoint-
    * collapsed corpus estimate would static-broadcast the whole index.
    */
  val CorpusIndexBroadcastCap: Long = 1000000L

  /** Null-unambiguous string form of a content column: a null-flag prefix
    * ("true"/"false") + the value with null → "". A bare sentinel (e.g.
    * "␀") would collide with a document whose text IS the sentinel; the
    * flag makes null and every literal string distinct by construction.
    */
  private def tagged(c: Column): Column =
    concat(isnull(c).cast("string"), coalesce(c.cast("string"), lit("")))

  /** Exact dedup: group identical content, keep the smallest id.
    * Returns (content_hash, keep_id, dup_count).
    *
    * Multi-column contents hash each column separately and hash the
    * concatenation of the fixed-width hex digests — no separator exists
    * in the outer preimage, so no value can alias a neighboring column's
    * content (a '§'-joined preimage was aliasable: ("x§0y","z") and
    * ("x","y§0z") concatenate identically). The single-column digest is
    * the plain tagged hash, replayable as
    * `sha256(CAST(c IS NULL AS VARCHAR) || coalesce(c, ''))`.
    */
  def exact(df: DataFrame, contentCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(contentDigest(contentCols).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** `idCol`, failing LOUDLY on null: the keep-first election is
    * `min(id)` + a semi-join on the winner, and both silently IGNORE
    * nulls — a null id would not elect, match nothing in the semi-join,
    * and every row carrying it would vanish from the output. That is
    * data loss, not dedup, so precondition violations throw (a runtime
    * `AssertNotNull`, evaluated executor-side — no extra pass over the
    * data) instead of shrinking the corpus. [[Curate.run]] feeds
    * arbitrary user frames through this path.
    */
  private def idNotNull(idCol: String): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
        org.apache.spark.sql.GraftSqlBridge.expression(col(idCol)),
        Seq(s"dedup requires a non-null id: '$idCol' " +
          "(a null id would be silently dropped or corrupt the keep-first " +
          "election, not deduplicated)")))

  /** The alias-proof multi-column content digest [[exact]] groups on —
    * public so other id-by-content operators ([[graft.ops.Snapshot]])
    * share one definition of content identity.
    */
  def contentDigest(contentCols: Seq[String]): Column =
    if (contentCols.size == 1) sha2(tagged(col(contentCols.head)), 256)
    else sha2(concat(contentCols.map(c => sha2(tagged(col(c)), 256)): _*), 256)

  /** Keep-one projection of [[exact]]: the input minus exact duplicates.
    *
    * Plan shape: [[exact]]'s digest aggregate elects `min(id)` per content
    * group with MAP-SIDE partial aggregation (a 10⁸-copy boilerplate
    * document combines to one row per input partition before the shuffle),
    * then a `left_semi` join on the id brings the winning bodies through.
    * Bodies shuffle keyed by the UNSKEWED id — or not at all when AQE
    * broadcasts the keep-set — never through a window keyed by content,
    * which would land every copy of a mass-duplicated document (bodies and
    * all) in one sort partition. Requires `idCol` unique per row (it is
    * the survivor's identity); a NULL id throws at runtime
    * ([[idNotNull]]) rather than silently dropping the row.
    */
  def exactKeepFirst(df: DataFrame, contentCols: Seq[String], idCol: String): DataFrame =
    df.join(exact(df.withColumn(idCol, idNotNull(idCol)), contentCols, idCol)
        .select(col("keep_id")),
      col(idCol) === col("keep_id"), "left_semi")

  /** [[exact]] over the NORMALIZED text form ([[TextStats.canonical]]:
    * NFC + lowercase + whitespace collapse) — "fuzzy-exact" dedup, the
    * ccnet-style pass that catches case/spacing/Unicode-composition
    * variants plain content hashing misses. Same output contract as
    * [[exact]]: (content_hash, keep_id, dup_count), hash over the
    * canonical form.
    */
  def exactNormalized(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(tagged(TextStats.canonical(col(textCol))), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Keep-one projection of [[exactNormalized]]: rows whose id is the
    * smallest in their canonical-form group. The ORIGINAL text is kept —
    * normalization only decides identity, it does not rewrite content.
    * Same agg + semi-join plan as [[exactKeepFirst]] (map-side combine on
    * the canonical digest; bodies never shuffle on a content key);
    * requires `idCol` unique per row; a NULL id throws ([[idNotNull]]).
    */
  def exactNormalizedKeepFirst(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.join(exactNormalized(df.withColumn(idCol, idNotNull(idCol)), textCol, idCol)
        .select(col("keep_id")),
      col(idCol) === col("keep_id"), "left_semi")

  /** Paragraph-level exact dedup (the FineWeb/ccnet granularity): split
    * each document on `sep`, drop every paragraph whose content already
    * appeared in an earlier (id, position) slot ANYWHERE in the corpus,
    * and reassemble the survivors in original order. Documents left with
    * zero surviving paragraphs drop out entirely. Returns (idCol, textCol).
    *
    * Plan shape at 100 TB — three shuffles, none carrying bodies through
    * the skewed key:
    *   1. survivor election is `groupBy(digest).agg(min(struct(id, pos)))`
    *      — MAP-SIDE partial aggregation combines a boilerplate paragraph
    *      repeated 10⁸ times down to one (digest, min-slot) row per input
    *      partition BEFORE the shuffle, so the hot digest never
    *      materializes as a fat partition (a `row_number` window would
    *      sort all 10⁸ digest rows in one task);
    *   2. a semi-join on (id, pos) brings the winning slots back to the
    *      exploded bodies (hash-partitioned by id — unskewed by
    *      construction, paragraph positions are unique per doc);
    *   3. reassembly groups by id (same key as 2 — AQE/bucketing can
    *      co-locate them).
    */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    // A null id would phantom-win the min(struct(id, pos)) election (null
    // struct fields sort first) while matching nothing in the (id, pos)
    // semi-join — other documents' genuine first occurrences get cut and
    // the null-id document passes through untouched. Same loud-failure
    // contract as the keep-first dedups ([[idNotNull]]).
    val guarded = docs.withColumn(idCol, idNotNull(idCol))
    val paras = guarded
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .toDF(idCol, "__pos", "__para")
      .filter(length(trim(col("__para"))) > 0)
    val surv = paras
      .select(sha2(col("__para"), 256).as("__h"), col(idCol), col("__pos"))
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__slot"))
      .select(col("__slot")(idCol).as(idCol), col("__slot")("__pos").as("__pos"))
    paras.join(surv, Seq(idCol, "__pos"), "left_semi")
      .groupBy(col(idCol))
      .agg(concat_ws(sep,
        transform(array_sort(collect_list(struct(col("__pos"), col("__para")))),
          s => s.getField("__para"))).as(textCol))
  }

  /** Exact SUBSTRING dedup — the Lee et al. 2021 ("Deduplicating Training
    * Data Makes Language Models Better", arXiv:2107.06499) granularity
    * between paragraph and document: remove duplicated ≥`k`-token SPANS
    * shared across documents (boilerplate sentences inside otherwise
    * unique pages — paragraph dedup misses them whenever paragraph
    * boundaries differ). Returns (idCol, textCol).
    *
    * Semantics (deterministic, engine-replayable):
    *   - every length-`k` token window (whitespace tokens, the
    *     [[TextStats.tokens]] split) is digested; for each distinct
    *     window content the occurrence with the smallest `(id, pos)`
    *     slot WINS — every other occurrence loses;
    *   - the union of token positions covered by a document's LOSING
    *     windows is cut; surviving tokens reassemble in order, joined by
    *     single spaces. Overlapping duplicated windows therefore merge
    *     into maximal cut spans, and the first occurrence of a span
    *     keeps its tokens (unless a DIFFERENT losing window covers
    *     them). A document whose every token is covered drops out;
    *   - a document with NO losing windows (including every document
    *     shorter than `k` tokens) passes through byte-identical —
    *     whitespace is only normalized where a cut actually rewrites.
    *
    * Lee et al. build one giant suffix array — the right shape for a
    * single machine, the wrong one for a cluster (global order = global
    * coordination). The Spark-first re-expression trades O(n·k) window
    * hashing (embarrassingly parallel, whole-stage codegen) for the
    * suffix array's O(n) span discovery, and reuses [[paragraphDedup]]'s
    * skew-safe election:
    *   1. window digests are built INSIDE a per-row projection
    *      (`transform(sequence, slice, sha2)`) — no explode of token
    *      bodies, only (id, pos, digest) triples leave the row;
    *   2. survivor election is `groupBy(digest).agg(min(struct(id,
    *      pos)))` — MAP-SIDE combine collapses a boilerplate window
    *      repeated 10⁸ times to one row per input partition before the
    *      shuffle, so hot digests never form a fat partition;
    *   3. losers are the `left_anti` of occurrences vs winners keyed by
    *      the UNSKEWED `(id, pos)` — digests never key a join;
    *   4. per-document loser positions `collect_list` (bounded by the
    *      document's own window count, like [[paragraphDedup]]'s
    *      reassembly), join back on id, and the span cut runs as a pure
    *      array expression (`sequence`/`flatten`/`filter`).
    * Three shuffles total; bodies only ever shuffle keyed by id.
    */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"window must span at least 2 tokens, got $k")
    val base = spanBase(docs, idCol, textCol)
    val wins = spanWindows(base, idCol, k)
    val winners = wins
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("__wpos"))).as("__slot"))
      .select(col("__slot")(idCol).as(idCol), col("__slot")("__wpos").as("__wpos"))
    cutSpanLosers(base, spanLoserLists(wins, winners, idCol), idCol, textCol, k)
  }

  /** Tokenized frame shared by the live and indexed substring paths —
    * ONE definition of the token grain, so the two can never disagree.
    * Same null-id hazard as [[paragraphDedup]]: the election would elect
    * a phantom (null, pos) slot and the anti-join/join-back on id would
    * cut every OTHER document's first occurrence — fail loudly instead
    * ([[idNotNull]]).
    */
  private def spanBase(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn(idCol, idNotNull(idCol))
      .withColumn("__toks", TextStats.tokens(col(textCol)))
      .withColumn("__n", size(col("__toks")))

  /** One (id, __wpos, __h sha256-of-k-token-window) row per window. */
  private def spanWindows(base: DataFrame, idCol: String, k: Int): DataFrame = {
    val winArr = when(col("__n") >= k,
      transform(sequence(lit(1), col("__n") - (k - 1)),
        p => sha2(concat_ws(" ", slice(col("__toks"), p, lit(k))), 256)))
      .otherwise(array().cast("array<string>"))
    base.select(col(idCol), posexplode(winArr))
      .select(col(idCol), (col("pos") + 1).as("__wpos"), col("col").as("__h"))
  }

  /** Per-document losing window positions: every window not in `winners`. */
  private def spanLoserLists(wins: DataFrame, winners: DataFrame,
      idCol: String): DataFrame =
    wins.select(col(idCol), col("__wpos"))
      .join(winners, Seq(idCol, "__wpos"), "left_anti")
      .groupBy(col(idCol))
      .agg(collect_list(col("__wpos")).as("__lose"))

  /** Remove every token covered by a losing window and reassemble; docs
    * with full coverage drop. Returns (idCol, textCol).
    */
  private def cutSpanLosers(base: DataFrame, loserLists: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame = {
    val covered = array_distinct(flatten(
      transform(col("__lose"), p => sequence(p, p + (k - 1)))))
    base.join(loserLists, Seq(idCol), "left")
      .withColumn("__cov", when(col("__lose").isNotNull, covered))
      .filter(col("__lose").isNull || size(col("__cov")) < col("__n"))
      .withColumn(textCol,
        when(col("__lose").isNull, col(textCol))
          .otherwise(concat_ws(" ",
            transform(
              filter(
                transform(sequence(lit(1), col("__n")),
                  i => struct(i.as("p"), element_at(col("__toks"), i).as("t"))),
                s => !array_contains(col("__cov"), s.getField("p"))),
              s => s.getField("t")))))
      .select(col(idCol), col(textCol))
  }

  /** Word n-gram shingles of a text column (distinct per doc,
    * first-occurrence order). Empty/short docs yield an empty set.
    * One codegen'd kernel scan ([[graft.functions.WordShingles]],
    * round 15, guide §1.2 per-task work) replacing the
    * tokenize → sequence → per-position slice + concat_ws HOF chain —
    * same values (EngineProps pins kernel ≡ HOF on adversarial text),
    * no per-shingle array slicing or lambda interpretation.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.TextFunctions.wsShingles(text, n)

  /** Exploded (id, shingle) table — build it ONCE (persist + eager count)
    * when several stages consume the same shingle set (signatures +
    * verification); each of [[minhashFromShingles]]/[[jaccardFromShingles]]
    * otherwise re-explodes the corpus.
    */
  def shingleTable(docs: DataFrame, idCol: String, text: Column, n: Int): DataFrame =
    docs.select(col(idCol).as("id"), explode(shingles(text, n)).as("shingle"))

  /** MinHash signatures from a prebuilt [[shingleTable]] (column `id`). */
  def minhashFromShingles(sh: DataFrame, numPerm: Int): DataFrame =
    sh.withColumn("h", pmod(xxhash64(col("shingle")), lit(MersennePrime31)))
      .groupBy(col("id"))
      .agg(graft.functions.HashAggFunctions.minhash_agg(col("h"), numPerm).as("sig"))

  /** Exact Jaccard for candidate pairs from a prebuilt [[shingleTable]]. */
  def jaccardFromShingles(sh: DataFrame, pairs: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("set_size"))
    ngramJaccardForPairs(sh, sizes, pairs, threshold)
  }

  /** MinHash signature per id as one `array<long>` column `sig`:
    * `sig[p] = min over shingles of (a_p·h + b_p) mod (2^31-1)` with
    * `h = xxhash64(shingle) mod (2^31-1)` (31-bit domain keeps `a·h` inside
    * Long under ANSI mode). One explode + one hash-partition aggregation
    * through the custom [[graft.functions.MinHashAgg]] kernel — `numPerm`
    * separate `min()` columns would overflow the codegen budget and fall
    * back to interpreted evaluation.
    */
  def minhashSignatures(df: DataFrame, idCol: String, text: Column, n: Int, numPerm: Int): DataFrame = {
    val exploded = df
      .select(col(idCol), explode(shingles(text, n)).as("shingle"))
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(MersennePrime31)))
    exploded.groupBy(col(idCol))
      .agg(graft.functions.HashAggFunctions.minhash_agg(col("h"), numPerm).as("sig"))
  }

  /** Banding expressions shared by [[lshCandidates]] and
    * [[incrementalDedup]] — ONE definition, so batch-vs-corpus banding can
    * never silently desynchronize from self-join banding.
    */
  private def bandExprs(bands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until bands).map { b =>
      struct(lit(b).as("band_idx"),
        xxhash64(concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, rowsPerBand).cast("array<string>"))).as("band_hash"))
    }

  /** LSH banding: signature → (band_idx, band_hash) rows; same-bucket pairs
    * are the candidates. bands·rowsPerBand must equal the signature width.
    *
    * Hot buckets (> maxBucket members) degrade to STAR candidate
    * generation instead of the full pairwise self-join: every member is
    * paired with the bucket's min-id hub — |bucket|−1 pairs, not
    * C(|bucket|, 2). An oversized band bucket is often a TRUE mass-dup
    * cluster (boilerplate repeated 10⁵ times — the classic 100-TB dedup
    * target), so dropping it outright would miss the biggest clusters;
    * the star keeps them findable with linear work, and after exact
    * verification [[components]] recovers member↔member links
    * transitively through the hub. Residual risk: a member similar to
    * other members but NOT to the hub is missed — only possible when the
    * bucket is a mixed collision, not a genuine dup cluster.
    *
    * Cache lifecycle: the banded frame is `localCheckpoint`ed (it feeds
    * the hot-bucket aggregate and both self-join sides) — unlike
    * `persist`, the blocks are NOT registered in the SQL cache manager
    * and are released by the ContextCleaner once the returned frame is
    * unreferenced, so repeated calls in a long-lived session cannot
    * accumulate pinned cache entries.
    */
  def lshCandidates(sig: DataFrame, idCol: String, bands: Int, rowsPerBand: Int,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val bandCols = bandExprs(bands, rowsPerBand)
    // hot buckets are found with a map-side-combining aggregate and split
    // out with anti/semi-joins (AQE broadcasts the hot set, which is
    // empty/tiny on unskewed data — measurably cheaper than a
    // count-window, whose WindowExec would re-sort every banded row)
    val banded = sig
      .select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_hash"))
      .localCheckpoint()
    val hotBuckets = banded.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__bs")).filter(col("__bs") > maxBucket)
      .select(col("band_idx"), col("band_hash"))
    val bucketed = banded.join(hotBuckets, Seq("band_idx", "band_hash"), "left_anti")
    val coldPairs = bucketed.as("l")
      .join(bucketed.as("r"),
        col("l.band_idx") === col("r.band_idx") &&
          col("l.band_hash") === col("r.band_hash") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
    val hotRows = banded.join(hotBuckets, Seq("band_idx", "band_hash"), "left_semi")
    val hubs = hotRows.groupBy(col("band_idx"), col("band_hash"))
      .agg(min(col(idCol)).as("__hub"))
    val starPairs = hotRows.join(hubs, Seq("band_idx", "band_hash"))
      .filter(col(idCol) =!= col("__hub"))
      .select(col("__hub").as("id_a"), col(idCol).as("id_b"))
    coldPairs.unionByName(starPairs).distinct()
  }

  /** Exact Jaccard for given candidate pairs, via shingle-set sizes and an
    * inverted-index intersection count. Returns pairs with
    * `jaccard >= threshold` (rounded to 4 decimals).
    */
  def jaccardVerify(
      docs: DataFrame, idCol: String, text: Column, n: Int,
      pairs: DataFrame, threshold: Double): DataFrame = {
    // localCheckpoint, not persist: reused by sizes + both pair-join sides,
    // but must not outlive the call in the SQL cache manager (blocks are
    // ContextCleaner-released once the returned frame is dropped)
    val sh = docs.select(col(idCol).as("id"), explode(shingles(text, n)).as("shingle"))
      .localCheckpoint()
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("set_size"))
    ngramJaccardForPairs(sh, sizes, pairs, threshold)
  }

  private def ngramJaccardForPairs(
      sh: DataFrame, sizes: DataFrame, pairs: DataFrame, threshold: Double): DataFrame = {
    val shA = sh.select(col("id").as("id_a"), col("shingle"))
    val shB = sh.select(col("id").as("id_b"), col("shingle"))
    val inter = pairs
      .join(shA, Seq("id_a"))
      .join(shB, Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter_size"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("set_size").as("size_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("set_size").as("size_b")), Seq("id_b"))
      .withColumn("jaccard",
        graft.Canonical.round4(col("inter_size").cast("double") /
          (col("size_a") + col("size_b") - col("inter_size")).cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** N-gram Jaccard near-dup pairs via the shingle inverted index, with a
    * document-frequency cap on candidate generation: a pair is found iff
    * it shares ≥1 shingle whose df ≤ `maxDf`, and every found pair's
    * Jaccard is EXACT (verification counts ALL shared shingles, hot ones
    * included). A shingle in 1M docs would contribute 5·10¹¹ candidate
    * pairs to one reducer; such stop-phrase shingles carry no dedup signal,
    * so capping candidate generation on them is the standard guard.
    * `maxDf = Int.MaxValue` recovers the fully exact (unguarded) operator.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, text: Column, n: Int,
      threshold: Double, maxDf: Int = DefaultMaxBucket): DataFrame = {
    // localCheckpoint (eager), not persist: feeds the candidate self-join
    // twice, the set-size aggregate AND the verification joins — but a
    // persist would stay registered in the SQL cache manager after the
    // call returns (the caller can't release it without killing the lazy
    // result); checkpoint blocks are ContextCleaner-released on GC.
    val sh = docs.select(col(idCol).as("id"), explode(shingles(text, n)).as("shingle"))
      .localCheckpoint()
    ngramJaccardPairsFromShingles(sh, threshold, maxDf)
  }

  /** [[ngramJaccardPairs]] over a prebuilt (persisted) [[shingleTable]] —
    * use when the shingle set also feeds other stages (signatures,
    * verification) so the corpus is exploded once.
    *
    * Plan shape: the HOT shingles (df > maxDf) are separated with an
    * anti-join (the hot set is the Zipf tail above the cap — tiny relative
    * to the corpus, so AQE turns the anti-join into a broadcast at
    * runtime); the cold index keeps the fused self-join + pair-count plan
    * (ONE shuffle, no candidate materialization); shared hot shingles are
    * then added back for the candidate pairs only, so every emitted
    * jaccard is exact over the FULL shingle sets. Only pairs sharing
    * nothing but hot shingles are pruned — the guard's semantic.
    */
  def ngramJaccardPairsFromShingles(sh: DataFrame, threshold: Double,
      maxDf: Int = DefaultMaxBucket): DataFrame =
    pairIntersections(sh, maxDf)
      .withColumn("jaccard",
        graft.Canonical.round4(col("inter_size").cast("double") /
          (col("size_a") + col("size_b") - col("inter_size")).cast("double")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** The shared candidate+intersection core of the exact pair family:
    * (id_a < id_b, exact inter_size over the FULL shingle sets, both set
    * sizes) for every pair sharing at least one COLD shingle — the
    * hot-df guard and exact-score correction documented at
    * [[ngramJaccardPairsFromShingles]]. Scorers
    * ([[ngramJaccardPairsFromShingles]], [[containmentPairsFromShingles]])
    * differ only in the formula over these columns.
    */
  private def pairIntersections(sh: DataFrame, maxDf: Int): DataFrame = {
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("set_size"))
    val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf).select(col("shingle"))
    val cold = sh.join(hot, Seq("shingle"), "left_anti")
    val interCold = cold.as("l")
      .join(cold.as("r"), col("l.shingle") === col("r.shingle") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("__inter_cold"))
    // exact-score correction: count the shared hot shingles per candidate
    // pair (each doc holds at most a handful of hot shingles, so this is
    // |candidates| × small)
    val hotSh = sh.join(hot, Seq("shingle"), "left_semi")
    val interHot = interCold.select(col("id_a"), col("id_b"))
      .join(hotSh.select(col("id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(hotSh.select(col("id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("__inter_hot"))
    interCold
      .join(interHot, Seq("id_a", "id_b"), "left")
      .withColumn("inter_size", col("__inter_cold") + coalesce(col("__inter_hot"), lit(0L)))
      .join(sizes.select(col("id").as("id_a"), col("set_size").as("size_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("set_size").as("size_b")), Seq("id_b"))
  }

  /** Asymmetric CONTAINMENT pairs — the quote/boilerplate-mining shape
    * Jaccard structurally misses: a short document embedded verbatim in
    * a long one scores `jaccard ≈ |A|/|B| → 0` however exact the copy,
    * while its containment `|A∩B| / min(|A|,|B|)` reads 1.0 (Broder '97
    * distinguishes resemblance from containment for exactly this). For
    * each qualifying pair the directional fractions ride along
    * (`containment_a_in_b = inter/|A|`, `containment_b_in_a = inter/|B|`
    * — round4, engine-portable), so callers can keep the container and
    * cut the contained. Candidates, the df cap and the exact-score
    * correction are [[ngramJaccardPairs]]'s own (the shared
    * [[pairIntersections]] core): one shuffle, no all-pairs, hot
    * boilerplate shingles star-degrade instead of exploding the join.
    */
  def containmentPairs(docs: DataFrame, idCol: String, text: Column, n: Int,
      threshold: Double, maxDf: Int = DefaultMaxBucket): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), explode(shingles(text, n)).as("shingle"))
      .localCheckpoint()
    containmentPairsFromShingles(sh, threshold, maxDf)
  }

  /** The cutting form of [[containmentPairs]]: drop every document
    * contained in another, keep the containers — the dedup pass quote
    * farms and template mirrors actually need (hard dedup misses them:
    * the pair is not a near-dup by resemblance). Loser rule, per
    * qualifying pair, deterministic: the CONTAINED side loses (fewer
    * shingles); mutual containment (near-identical sets) keeps the
    * smaller id. The relation is transitive over shingle sets (A ⊆ B ⊆ C
    * ⇒ the (A, C) pair exists too), so a container that itself loses to
    * a bigger one cannot resurrect its contained documents — one pass
    * suffices, no component closure. Returns the caller's schema.
    */
  def removeContained(docs: DataFrame, idCol: String, text: Column, n: Int,
      threshold: Double, maxDf: Int = DefaultMaxBucket): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), explode(shingles(text, n)).as("shingle"))
      .localCheckpoint()
    val p = pairIntersections(sh, maxDf)
      .withColumn("__ca",
        graft.Canonical.round4(col("inter_size").cast("double") / col("size_a").cast("double")))
      .withColumn("__cb",
        graft.Canonical.round4(col("inter_size").cast("double") / col("size_b").cast("double")))
    val losers = p
      .withColumn("__loser",
        when(col("__ca") >= threshold && col("__cb") >= threshold,
          greatest(col("id_a"), col("id_b")))
          .when(col("__ca") >= threshold, col("id_a"))
          .when(col("__cb") >= threshold, col("id_b")))
      .filter(col("__loser").isNotNull)
      .select(col("__loser").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** [[containmentPairs]] over a prebuilt [[shingleTable]]. */
  def containmentPairsFromShingles(sh: DataFrame, threshold: Double,
      maxDf: Int = DefaultMaxBucket): DataFrame =
    pairIntersections(sh, maxDf)
      .withColumn("containment_a_in_b",
        graft.Canonical.round4(col("inter_size").cast("double") / col("size_a").cast("double")))
      .withColumn("containment_b_in_a",
        graft.Canonical.round4(col("inter_size").cast("double") / col("size_b").cast("double")))
      .withColumn("containment",
        greatest(col("containment_a_in_b"), col("containment_b_in_a")))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"),
        col("containment_a_in_b"), col("containment_b_in_a"))

  /** Connected components over a near-duplicate pair list — the step that
    * turns pairwise matches into per-cluster keep/drop decisions (pairs
    * chain: a~b and b~c must collapse into ONE cluster even when a and c
    * never matched directly). Returns (id, comp) for every id appearing in
    * `pairs`, where `comp` is the smallest id in the component — the
    * canonical survivor.
    *
    * Algorithm: alternating large-star / small-star contraction (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC '14).
    * Each round rewires every node toward the minimum of its neighborhood:
    *
    *   - large-star: per node u with neighborhood Γ(u), every neighbor
    *     v > u re-attaches to m = min(Γ(u) ∪ {u});
    *   - small-star: per node u over its smaller neighbors Γ⁻(u), all of
    *     Γ⁻(u) ∪ {u} attach to their minimum.
    *
    * The edge set converges to a union of stars whose centers are the
    * component minima in O(log n) rounds on ANY graph — unlike min-label
    * propagation, whose round count is the graph DIAMETER (a 10⁶-edge
    * chain needs 10⁶ rounds; star contraction needs ~20). Every round is
    * two keyed aggregates + two equi-joins — all shuffle-partitioned,
    * nothing driver-side except the 1-row convergence count.
    * `localCheckpoint` truncates the lineage each round (same discipline
    * as the IVF Lloyd loop, Ivf.scala) and superseded checkpoints are
    * released so at most two edge copies are ever pinned. The loop THROWS
    * if it exits unconverged — silently returning split clusters would
    * hand a dedup pipeline two "canonical" copies of one document.
    */
  def components(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val prevDesc = sc.getLocalProperty("spark.job.description")
    val nodes = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
      .localCheckpoint()
    // canonical orientation (u > v); self-pairs carry no linkage
    var edgesCp = pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var edges = edgesCp.select(col("u"), col("v"))
    var edgeCount = edgesCp.count()
    var converged = edgeCount == 0L
    var i = 0
    while (!converged && i < maxIter) {
      sc.setJobDescription(s"components: round $i")
      // large-star: neighbors above each center re-attach to the
      // neighborhood minimum. ONE exchange establishes the per-center
      // partitioning; the min aggregate AND the re-attach join both reuse
      // it (guide §2.4: operations keyed the same way share an exchange —
      // the groupBy and the join each paid their own before round 15)
      val sym = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
        .select(col("u").as("x"), col("v").as("nbr"))
        .repartition(col("x"))
      val mins = sym.groupBy(col("x")).agg(min(col("nbr")).as("__mn"))
        .select(col("x"), least(col("__mn"), col("x")).as("m"))
      // NOT deduped here: duplicate (u, m) rows (one per neighborhood the
      // pair co-occurs in) are absorbed map-side by the min aggregate
      // below and by the output distinct — the intermediate distinct was
      // a full exchange per round buying nothing (round 15, guide §2.4)
      val large = sym.filter(col("nbr") > col("x"))
        .join(mins, Seq("x"))
        .select(col("nbr").as("u"), col("m").as("v"))
        .repartition(col("u")) // shared by the small-star agg + join below
      // small-star: each center and its smaller neighbors attach to their
      // minimum (input/output both keep the u > v orientation)
      val mins2 = large.groupBy(col("u")).agg(min(col("v")).as("m"))
      val out = mins2.select(col("u"), col("m").as("v"))
        .unionByName(large.join(mins2, Seq("u"))
          .filter(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
      // convergence = set equality (out == edges), decomposed as
      // |out ∩ edges| = |out| = |edges|: the membership flag rides the
      // round's OWN checkpoint (a left join on the keys the distinct just
      // partitioned by), so the check is one tiny scan-aggregate of the
      // checkpointed frame — the former symmetric-difference action
      // re-shuffled BOTH already-checkpointed sets every round (round 15,
      // guide §2.4/§1.2: same exchanges, fewer; job count per round drops
      // with it)
      val ann = out
        .join(edgesCp.select(col("u"), col("v"), lit(1).as("__old")),
          Seq("u", "v"), "left")
        .localCheckpoint()
      val row = ann.agg(count(lit(1)), count(col("__old"))).head()
      val (nOut, nOverlap) = (row.getLong(0), row.getLong(1))
      converged = nOut == nOverlap && nOverlap == edgeCount
      edgesCp.unpersist() // superseded checkpoint — keep at most 2 copies pinned
      edgesCp = ann
      edges = ann.select(col("u"), col("v"))
      edgeCount = nOut
      i += 1
    }
    sc.setJobDescription(prevDesc)
    if (!converged) {
      edgesCp.unpersist() // release the checkpoint: a catch-and-retry loop must not accumulate them
      throw new IllegalStateException(
        s"components() did not converge in $maxIter rounds — star contraction needs " +
          s"O(log n) rounds on any graph, so this indicates maxIter far below log₂(nodes)")
    }
    // fixpoint edges are stars (u, componentMin); nodes without an edge
    // (self-pairs only / singleton inputs) label themselves
    nodes
      .join(edges.select(col("u").as("id"), col("v").as("__comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("__comp"), col("id")).as("comp"))
  }

  /** Incremental [[components]]: fold a DELTA pair batch into existing
    * (id, comp) labels WITHOUT replaying history. Label edges (id → comp)
    * carry the old connectivity exactly — every old member appears as an
    * id and every old component is a star around its min — so star
    * contraction over `labelEdges ∪ delta` equals the one-shot result
    * over the full pair history (components that the delta bridges merge
    * to the global min). Per-fold cost is O(|labels| + |delta|), not
    * O(every pair ever); untouched singletons (self-labelled, absent
    * from the union's node set) are re-added unchanged. IDEMPOTENT: the
    * same delta folded twice is a fixpoint, so replays need no ledger.
    */
  def componentsIncremental(labels: DataFrame, newPairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val labelEdges = labels.filter(col("id") =!= col("comp"))
      .select(col("id").as("id_a"), col("comp").as("id_b"))
    val merged = components(
      labelEdges.unionByName(newPairs.select(col("id_a"), col("id_b"))), maxIter)
    val singles = labels.filter(col("id") === col("comp"))
      .join(merged.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    merged.unionByName(singles)
  }

  /** Persist component labels — the cluster state a daily dedup pipeline
    * carries between runs (`path/labels` + the shared staging+marker
    * protocol; single-table swap, the LM-counts-index shape — and no
    * replay ledger because [[componentsIncremental]] is idempotent).
    */
  def writeCcIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      labels: DataFrame): Unit =
    labels.select(col("id"), col("comp"))
      .write.mode("overwrite").parquet(s"$path/labels")

  /** Load persisted component labels (healing an interrupted fold first). */
  def readCcIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    finishBatchCompaction(spark, path)
    spark.read.parquet(s"$path/labels")
  }

  /** Fold a delta pair batch into the persisted labels: compute the
    * merged labels, stage, publish the marker, swap. A crash between
    * staging+marker and the swap self-heals on the next read; a crash
    * before the marker leaves the old labels intact and the replayed
    * fold recomputes the identical merge.
    */
  def appendToCcIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newPairs: DataFrame, maxIter: Int = 20): Unit = {
    val cur = readCcIndex(spark, path)
    componentsIncremental(cur, newPairs, maxIter)
      .write.mode("overwrite").parquet(s"$path/labels.staging")
    publishBatchMarker(spark, path, Seq("labels"))
    finishBatchCompaction(spark, path)
  }

  /** End-to-end near-dup REMOVAL: pairs → clusters → keep one canonical
    * document (the min id) per cluster — the composition every dedup
    * pipeline actually ships: exact n-gram Jaccard pairs (so the whole
    * result is value-oracled) + [[components]] + one broadcast-able
    * anti-join of the drop set against the corpus. Swap the pair stage
    * for the MinHash path at scale; the cluster/drop tail is identical.
    *
    * Cache lifecycle: the exploded shingle table (the job's largest
    * intermediate) and the label checkpoint are BOTH released before
    * returning; only the drop set — one id per non-canonical duplicate —
    * stays cached to feed the returned anti-join.
    */
  def dedupCorpusExact(docs: DataFrame, idCol: String, text: Column,
      n: Int, threshold: Double, maxIter: Int = 20): DataFrame = {
    val sh = shingleTable(docs, idCol, text, n).persist()
    sh.count() // eager: feeds the self-join, set sizes, and hot correction
    val pairs = ngramJaccardPairsFromShingles(sh, threshold)
    val result = dropNonCanonical(docs, idCol, pairs, quality = None, maxIter)
    sh.unpersist() // the drop set is checkpointed — shingles no longer needed
    result
  }

  /** Shared cluster/drop tail of every corpus near-dup removal: pairs →
    * [[components]] → canonical election (min id, or argmax `quality`
    * with min-id tiebreak) → one anti-join of the id-only drop set.
    * The drop set is `localCheckpoint`ed, not persisted: it must survive
    * into the returned lazy anti-join without staying registered in the
    * SQL cache manager (ContextCleaner releases it when the result is
    * dropped); the intermediate labels are released before returning.
    */
  private def dropNonCanonical(docs: DataFrame, idCol: String, pairs: DataFrame,
      quality: Option[Column], maxIter: Int): DataFrame = {
    // components() consumes the pair frame twice (node set + initial
    // edges); without this pin an LSH/semantic pair stage — candidate
    // self-join plus full verification — would execute twice per call.
    // Both consumers are materialized inside components(), so the pin is
    // released as soon as it returns.
    val p = pairs.localCheckpoint()
    val labels = components(p, maxIter)
    p.unpersist()
    val drop = quality match {
      case None =>
        labels.filter(col("id") =!= col("comp"))
          .select(col("id").as(idCol))
          .localCheckpoint()
      case Some(q) =>
        // only clustered ids need a quality lookup — labels' nodes are
        // exactly the ids that appeared in a pair, small after
        // contraction. Checkpointed: it feeds both the election aggregate
        // and the drop join (docs would otherwise re-scan per consumer).
        // NULL quality ranks LAST via an explicit isNull field (false <
        // true, so every SCORED member — even -Infinity — beats every
        // unscored one; a sentinel value would tie or lose against
        // extreme scores), matching the oracle's ORDER BY q DESC NULLS
        // LAST.
        val member = labels.join(
          docs.select(col(idCol).as("id"), q.cast("double").as("__q")), Seq("id"))
          .localCheckpoint()
        val keep = member.groupBy(col("comp"))
          .agg(min(struct(col("__q").isNull.as("nu"), (-col("__q")).as("nq"),
            col("id").as("kid"))).as("__k"))
          .select(col("comp"), col("__k").getField("kid").as("__keep"))
        val d = member.join(keep, Seq("comp"))
          .filter(col("id") =!= col("__keep"))
          .select(col("id").as(idCol))
          .localCheckpoint()
        member.unpersist()
        d
    }
    labels.unpersist()
    docs.join(drop, Seq(idCol), "left_anti")
  }

  /** Corpus near-dup removal with the MINHASH+LSH pair stage — the
    * 100-TB arm of [[dedupCorpusExact]]/[[dedupCorpusKeepBest]] (whose
    * exact-pair stage is the value-oracle arm; the round-8 32× pilot
    * measured it 8.2× at 32× data while every LSH-family query stayed
    * ≤3×). Candidates come from banded signature buckets (hot buckets
    * star-degrade, never drop), every candidate verifies with EXACT
    * Jaccard over full shingle sets, and the cluster/drop tail is
    * byte-identical to the exact arm — so the only semantic difference
    * is pair RECALL: a true near-dup pair at jaccard j surfaces with
    * probability 1-(1-j^rowsPerBand)^bands (identical documents always
    * collide). `quality = Some(...)` elects argmax-quality canonicals.
    *
    * The corpus is tokenized and exploded ONCE: a single persisted
    * [[shingleTable]] feeds both the signature aggregation and the exact
    * verification (the same sharing discipline as [[dedupCorpusExact]] /
    * [[dedupCorpusKeepBest]]) — tokenize+explode is the dominant CPU of
    * the pair stage, and rebuilding it for verification would double it.
    */
  def dedupCorpusLsh(docs: DataFrame, idCol: String, text: Column,
      n: Int, numPerm: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      quality: Option[Column] = None,
      maxBucket: Int = DefaultMaxBucket, maxIter: Int = 20): DataFrame = {
    require(bands * rowsPerBand <= numPerm,
      s"bands*rowsPerBand = ${bands * rowsPerBand} exceeds numPerm = $numPerm")
    val sh = shingleTable(docs, idCol, text, n).persist()
    sh.count() // eager: feeds signatures AND verification
    val sig = minhashFromShingles(sh, numPerm)
    val cand = lshCandidates(sig, "id", bands, rowsPerBand, maxBucket)
    val pairs = jaccardFromShingles(sh, cand, threshold)
    val result = dropNonCanonical(docs, idCol, pairs, quality, maxIter)
    sh.unpersist() // the drop set is checkpointed — shingles no longer needed
    result
  }

  /** [[dedupCorpusExact]] with QUALITY-RANKED canonical selection: each
    * near-dup cluster keeps its highest-`quality` member (ties → min id)
    * instead of the min id. This is the composition pipelines ship when
    * ingest order is not preference order — near-dup clusters routinely
    * span sources (the same article on a mirror and on the origin site),
    * and keep-first would keep whichever shard happened to sort lower.
    *
    * The election is one aggregate per cluster — `min(struct(-q, id))`
    * orders by quality descending then id ascending, so the canonical
    * member costs a single map-side-combinable shuffle on the (already
    * contracted) component key, never a content-wide window. Cache
    * lifecycle mirrors [[dedupCorpusExact]]: shingles and labels are
    * released before returning; only the id-only drop set stays
    * checkpointed to feed the returned anti-join.
    *
    * `quality` is any expression over `docs`' columns (a planted score, a
    * [[TextStats.qualityScore]], a model score); `-0.0` scores are the
    * caller's hazard (negation distinguishes ±0.0 under IEEE ordering).
    */
  def dedupCorpusKeepBest(docs: DataFrame, idCol: String, text: Column,
      quality: Column, n: Int, threshold: Double, maxIter: Int = 20): DataFrame = {
    val sh = shingleTable(docs, idCol, text, n).persist()
    sh.count() // eager: feeds the self-join, set sizes, and hot correction
    val pairs = ngramJaccardPairsFromShingles(sh, threshold)
    val result = dropNonCanonical(docs, idCol, pairs, Some(quality), maxIter)
    sh.unpersist()
    result
  }

  /** End-to-end SEMANTIC near-dup removal over an embedding column — the
    * SemDeDup shape (Abbas et al. '23): embedding-cosine pairs →
    * [[components]] → keep the component-minimum id. `exact = true` swaps
    * in the quadratic all-pairs verifier ([[Similarity.cosinePairsExact]])
    * so the whole result can be value-oracled; the default LSH-bucketed
    * pair stage ([[Similarity.cosinePairs]]) is the 100-TB path (pair work
    * bounded by bucket mates, recall gated by the planted-neighbor probe).
    * Cache lifecycle mirrors [[dedupCorpusExact]]: only the drop set stays
    * checkpointed to feed the returned anti-join.
    */
  def dedupCorpusSemantic(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 8, dim: Int = 64,
      exact: Boolean = false, maxIter: Int = 20): DataFrame = {
    val pairs =
      if (exact) Similarity.cosinePairsExact(emb, idCol, vecCol, threshold)
      else Similarity.cosinePairs(emb, idCol, vecCol, threshold, numPlanes, dim)
    dropNonCanonical(emb, idCol, pairs, quality = None, maxIter)
  }

  /** Cluster-bounded semantic near-dup removal — SemDeDup as published
    * (Abbas et al. '23): quantize the corpus with the caller's centroid
    * table, compare embeddings only WITHIN each cluster
    * ([[Similarity.clusterCosinePairs]]), connect the ≥`threshold` pairs,
    * keep each component's minimum id. Differs from
    * [[dedupCorpusSemantic]] in the candidate bound: learned clusters
    * (Σ|cluster|² pair work, misses cross-cluster pairs — the paper's
    * accepted trade) instead of random-hyperplane sign buckets. With a
    * deterministic quantizer ([[Ivf.seedCentroids]]) the whole result is
    * value-oracle-checkable; with [[Ivf.train]] it is the production
    * path. Cache lifecycle mirrors [[dedupCorpusExact]]: only the drop
    * set stays checkpointed to feed the returned anti-join.
    */
  def dedupCorpusSemanticClustered(emb: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, threshold: Double, clusterCap: Long = 100000L,
      maxIter: Int = 20): DataFrame = {
    val pairs = Similarity.clusterCosinePairs(emb, idCol, vecCol, cents, threshold, clusterCap)
    dropNonCanonical(emb, idCol, pairs, quality = None, maxIter)
  }

  /** Incremental dedup: a NEW batch of documents against an EXISTING
    * (already-deduped) corpus — the daily-ingest shape of a training-data
    * pipeline. The critical scale property is asymmetry: the corpus side
    * is only ever *probed*, never self-joined, so a 100-TB corpus costs
    * one signature/banding pass (which a real deployment would persist
    * and reuse across batches) and the pair work is bounded by
    * |batch| × bucket-mates — never corpus².
    *
    * Decision per batch doc, in precedence order:
    *   1. `exact_dup`  — content hash already present in the corpus
    *      (hash-equi anti-join semantics; 256-bit hashes shuffle, the
    *      document bodies don't);
    *   2. `near_dup`   — shares an LSH band bucket with ≥1 corpus doc AND
    *      exact n-gram Jaccard ≥ `threshold` (verification is exact, so
    *      every emitted match is a true near-duplicate);
    *   3. `new`        — survives both gates.
    *
    * Returns one row per batch doc: (idCol, status, dup_of) where
    * `dup_of` is the smallest matching corpus id (null for `new`). The
    * result is EAGER — materialized and cached before the internal corpus
    * shingle/hash caches are released (`unpersist()` it when done).
    * Intra-batch duplicates are NOT resolved here — compose with
    * [[exact]] / [[lshCandidates]] over the batch alone for that; keeping
    * the operator batch→corpus keeps its cost profile linear in the batch.
    *
    * Hot-bucket guard: band buckets are capped by occupancy over
    * corpus∪batch — a stop-phrase bucket in a 1M-doc corpus would
    * otherwise fan every batch doc into it. As in [[lshCandidates]], a
    * hot bucket degrades to STAR candidates: each batch doc in it is
    * paired with the bucket's min CORPUS id only (linear in the batch),
    * so a batch doc that duplicates a mass-dup corpus cluster is still
    * found rather than silently classified `new`.
    */
  def incrementalDedup(
      corpus: DataFrame, batch: DataFrame, idCol: String, text: Column,
      n: Int, numPerm: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucket: Int = DefaultMaxBucket,
      corpusIndexBroadcastCap: Long = CorpusIndexBroadcastCap): DataFrame = {
    require(bands * rowsPerBand == numPerm,
      s"bands ($bands) × rowsPerBand ($rowsPerBand) must equal numPerm ($numPerm) — " +
        "anything else silently drops signature permutations from banding")
    def hashOf(df: DataFrame) = df.select(col(idCol).as("id"),
      sha2(tagged(text), 256).as("__h"))
    // 1. exact: batch hash ∈ corpus hashes (min corpus id per hash probes
    //    the join — one shuffle of 64-char hashes). The index is the only
    //    BROADCASTABLE side of this left join (batch preserved), so a
    //    static broadcast from a checkpoint-collapsed corpus estimate
    //    would ship the whole corpus index to the driver at scale —
    //    decide from the materialized index count instead (the cache is
    //    released as soon as the exact statuses are pinned).
    val corpusHashes = hashOf(corpus).groupBy(col("__h")).agg(min(col("id")).as("__exact_of"))
      .persist()
    val corpusHashRows = corpusHashes.count()
    val exactJoined =
      if (corpusHashRows <= corpusIndexBroadcastCap)
        hashOf(batch).join(broadcast(corpusHashes), Seq("__h"), "left")
      else
        hashOf(batch).hint("merge").join(corpusHashes.hint("merge"), Seq("__h"), "left")
    val exactStatus = exactJoined
      .select(col("id"), col("__exact_of"))
      .persist()
    exactStatus.count()
    corpusHashes.unpersist()

    // 2. near: MinHash signatures both sides, band, batch-bands ⋈
    //    corpus-bands (equi), exact-Jaccard verify on the candidates.
    //    Exact-dup batch docs are excluded up front: their near matches are
    //    subsumed by status precedence, and skipping them shrinks the
    //    probe side.
    val survivors = batch.join(
      exactStatus.filter(col("__exact_of").isNotNull).select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
    // persist (not count-pinned): each table feeds signatures AND
    // verification, and the signature checkpoints below materialize the
    // caches as a side effect — the explicit counts were two extra
    // driver-serialized jobs buying nothing (round 15, guide §1.2)
    val shC = shingleTable(corpus, idCol, text, n).persist()
    val shB = shingleTable(survivors, idCol, text, n).persist()
    def banded(sig: DataFrame, side: String) =
      sig.select(col("id").as(side), explode(array(bandExprs(bands, rowsPerBand): _*)).as("band"))
        .select(col(side), col("band.band_idx"), col("band.band_hash"))
    // each banded side feeds the hot-bucket aggregate plus two candidate
    // joins — checkpoint so the signature aggregation runs once per side
    val bandC = banded(minhashFromShingles(shC, numPerm), "corpus_id").localCheckpoint()
    val bandB = banded(minhashFromShingles(shB, numPerm), "batch_id").localCheckpoint()
    val hot = bandC.select(col("band_idx"), col("band_hash"))
      .unionByName(bandB.select(col("band_idx"), col("band_hash")))
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__bs")).filter(col("__bs") > maxBucket)
      .select(col("band_idx"), col("band_hash"))
    val coldCands = bandB.join(hot, Seq("band_idx", "band_hash"), "left_anti")
      .join(bandC, Seq("band_idx", "band_hash"))
      .select(col("batch_id").as("id_a"), col("corpus_id").as("id_b"))
    // hot buckets: each batch member probes only the bucket's min corpus
    // id (star candidates — linear, and exact verification still decides)
    val hotHubs = bandC.join(hot, Seq("band_idx", "band_hash"), "left_semi")
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(min(col("corpus_id")).as("corpus_id"))
    val starCands = bandB.join(hot, Seq("band_idx", "band_hash"), "left_semi")
      .join(hotHubs, Seq("band_idx", "band_hash"))
      .select(col("batch_id").as("id_a"), col("corpus_id").as("id_b"))
    val cands = coldCands.unionByName(starCands).distinct()
    // exact verification over the union of both shingle tables (ids are
    // disjoint between corpus and batch by contract)
    val shAll = shB.unionByName(shC)
    val sizes = shAll.groupBy(col("id")).agg(count(lit(1)).as("set_size"))
    val nearOf = ngramJaccardForPairs(shAll, sizes, cands, threshold)
      .groupBy(col("id_a").as("id"))
      .agg(min(col("id_b")).as("__near_of"))

    // materialize the (batch-sized) result, then release the big caches —
    // the exploded corpus shingle table is the largest intermediate in the
    // job and must not outlive the call. The returned frame stays cached;
    // unpersist() it when done.
    val result = exactStatus
      .join(nearOf, Seq("id"), "left")
      .select(col("id").as(idCol),
        when(col("__exact_of").isNotNull, "exact_dup")
          .when(col("__near_of").isNotNull, "near_dup")
          .otherwise("new").as("status"),
        coalesce(col("__exact_of"), col("__near_of")).as("dup_of"))
      .persist()
    result.count()
    shC.unpersist(); shB.unpersist(); exactStatus.unpersist()
    result
  }

  /** Incremental SEMANTIC dedup: a new batch of embeddings against an
    * EXISTING (already-deduped) embedding corpus — the embedding twin of
    * [[incrementalDedup]], with the same asymmetry contract: the corpus is
    * only ever PROBED (hash join + one sign-bucket equi-join), never
    * self-joined, so corpus cost is one bucketing pass (persistable across
    * batches in a real deployment) and pair work is |batch| × bucket-mates.
    *
    * Decision per batch vector, precedence:
    *   1. `exact_dup` — a corpus vector with identical contents exists.
    *      Detected by `xxhash64` equi-join, then verified by array
    *      equality against the min-id representative of the hash group (a
    *      64-bit collision can thus theoretically hide a true exact match
    *      behind an unequal representative — vanishingly unlikely and the
    *      pair still falls through to the cosine gate);
    *   2. `near_dup`  — shares the LSH sign-bucket with ≥1 corpus vector
    *      AND exact cosine ≥ `threshold` (every emitted match is
    *      verified; recall is the LSH bucket-collision probability —
    *      gated by the planted-neighbor probe family);
    *   3. `new`.
    *
    * A vector has exactly ONE sign bucket, so each (batch, corpus) pair
    * arises at most once — no candidate dedup pass is needed. Hot buckets
    * (> maxBucket members over corpus∪batch) degrade to star candidates
    * against the bucket's min-id corpus hub, keeping the fan-out linear
    * in the batch while a batch vector that duplicates a mass-dup corpus
    * direction is still found. Returns one eager cached row per batch id:
    * (idCol, status, dup_of) — `unpersist()` when done.
    */
  def incrementalSemanticDedup(corpus: DataFrame, batch: DataFrame, idCol: String,
      vecCol: String, threshold: Double, numPlanes: Int, dim: Int,
      maxBucket: Int = DefaultMaxBucket,
      batchBroadcastCap: Long = BatchBroadcastCap): DataFrame = {
    val planes = Similarity.hyperplanes(numPlanes, dim)
    // 1. exact: hash probe + byte-equality verify against the hash group's
    //    min-id representative (hashes shuffle, corpus vectors stay put).
    //    The hash index is the BROADCASTABLE side of this left join (the
    //    batch is preserved, so only the corpus side can build) — and it
    //    carries full corpus vectors, so a static broadcast decided from
    //    a checkpoint-collapsed corpus estimate is a driver OOM at scale
    //    (the same hazard class as the band frame below, one join up).
    //    Decide from the MATERIALIZED index count: truly small index →
    //    broadcast it; big → sort-merge on the hash, neither side builds.
    val cHash = corpus
      .select(xxhash64(col(vecCol)).as("__h"), col(idCol).as("__cid"), col(vecCol).as("__cvec"))
      .groupBy(col("__h"))
      .agg(min(col("__cid")).as("__exact_of"), min_by(col("__cvec"), col("__cid")).as("__rvec"))
      .persist()
    val cHashRows = cHash.count()
    // byte-aware license: every index row carries a full dim-sized vector
    // (__rvec), so the row cap shrinks with dim — a 1M-row cap justified
    // for short strings would ship a multi-GB broadcast at dim ≥ 512
    val vecCap = math.min(batchBroadcastCap, Similarity.vecBroadcastRows(dim))
    val keyedB = batch
      .select(col(idCol).as("id"), col(vecCol).as("__bvec"), xxhash64(col(vecCol)).as("__h"))
    val exactJoined =
      if (cHashRows <= vecCap) keyedB.join(broadcast(cHash), Seq("__h"), "left")
      else keyedB.hint("merge").join(cHash.hint("merge"), Seq("__h"), "left")
    val exactStatus = exactJoined
      .select(col("id"),
        when(col("__exact_of").isNotNull && col("__bvec") === col("__rvec"),
          col("__exact_of")).as("__exact_of"))
      .persist()
    exactStatus.count()
    cHash.unpersist() // exactStatus is materialized — the index is done

    // 2. near: sign-bucket probe, exact cosine verify on bucket-mates
    val survivors = batch.join(
      exactStatus.filter(col("__exact_of").isNotNull).select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
    val bC = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cvec"),
      Similarity.bucketId(col(vecCol), planes).as("__bucket")).localCheckpoint()
    val bB = survivors.select(col(idCol).as("batch_id"), col(vecCol).as("__bvec"),
      Similarity.bucketId(col(vecCol), planes).as("__bucket")).localCheckpoint()
    val hot = bC.select(col("__bucket")).unionByName(bB.select(col("__bucket")))
      .groupBy(col("__bucket")).agg(count(lit(1)).as("__bs"))
      .filter(col("__bs") > maxBucket).select(col("__bucket"))
    // Both band frames are checkpoint-backed (LogicalRDD) and their size
    // estimates are unreliable — the static planner has been observed
    // broadcast-building the CORPUS side of the cold candidate join
    // (driver OOM at real corpus scale). Decide the side from the
    // MATERIALIZED batch count instead (bB is checkpointed — the count is
    // a cached-block scan, and the eager pin already paid the compute):
    // bounded batch → broadcast it; oversized batch → sort-merge join
    // (hinted on BOTH sides, as Decontaminate.overlaps degrades): a
    // shuffled hash join would still build a per-partition hash relation
    // from whichever side the same unreliable checkpoint-backed estimates
    // call smaller — which can be the corpus (executor OOM at scale).
    // Merge builds no hash relation from either unbounded side.
    val coldB = bB.join(hot, Seq("__bucket"), "left_anti")
    val cold =
      if (bB.count() <= vecCap) bC.join(broadcast(coldB), Seq("__bucket"))
      else bC.hint("merge").join(coldB.hint("merge"), Seq("__bucket"))
    val hubs = bC.join(hot, Seq("__bucket"), "left_semi")
      .groupBy(col("__bucket"))
      .agg(min(col("corpus_id")).as("corpus_id"), min_by(col("__cvec"), col("corpus_id")).as("__cvec"))
    val star = bB.join(hot, Seq("__bucket"), "left_semi")
      .join(hubs, Seq("__bucket"))
    val pairCols = Seq(col("batch_id"), col("__bvec"), col("corpus_id"), col("__cvec"))
    val nearOf = cold.select(pairCols: _*).unionByName(star.select(pairCols: _*))
      .withColumn("__cos", round(Similarity.cosine(col("__bvec"), col("__cvec")), 6))
      .filter(col("__cos") >= threshold)
      .groupBy(col("batch_id").as("id"))
      .agg(min(col("corpus_id")).as("__near_of"))

    val result = exactStatus
      .join(nearOf, Seq("id"), "left")
      .select(col("id").as(idCol),
        when(col("__exact_of").isNotNull, "exact_dup")
          .when(col("__near_of").isNotNull, "near_dup")
          .otherwise("new").as("status"),
        coalesce(col("__exact_of"), col("__near_of")).as("dup_of"))
      .persist()
    result.count()
    bC.unpersist(); bB.unpersist(); exactStatus.unpersist()
    result
  }

  /** Bloom-pruned incremental EXACT dedup: classify a new batch against an
    * existing corpus without joining the whole batch — the daily-ingest
    * shape where the batch is overwhelmingly NEW content and an equi-join
    * of every batch row against the corpus hash index wastes a shuffle on
    * rows that match nothing.
    *
    *   1. Build a [[org.apache.spark.util.sketch.BloomFilter]] over
    *      `xxhash64` content keys of the corpus (distributed tree-
    *      aggregate; the finished sketch lives on the driver and ships to
    *      executors once per task — `-n·ln(fpp)/ln²2` bits ≈ 1.2 GiB for
    *      10⁹ items at 1% fpp, so size `expectedItems` to the corpus and
    *      keep an eye on driver memory). This variant rebuilds both
    *      corpus artifacts per call — the one-shot shape; a standing
    *      daily ingest should [[writeHashIndex]] once and classify each
    *      batch with [[incrementalExactIndexed]] +
    *      [[appendToHashIndex]], paying no corpus scan per batch.
    *   2. Bloom-NEGATIVE batch rows are certainly new (no false
    *      negatives) — they bypass the join entirely, costing one codegen'd
    *      [[graft.functions.BloomMightContain]] probe per row.
    *   3. Bloom-POSITIVE rows (true matches + fpp·|new|) verify against
    *      the corpus sha256 hash index with the usual equi-join, so the
    *      final classification is EXACT — the sketch only prunes.
    *
    * Returns one eager cached row per batch doc: (idCol, status ∈
    * {exact_dup, new}, dup_of = min matching corpus id or null) —
    * `unpersist()` when done. Compose with [[incrementalDedup]] when the
    * near-dup gate is also needed.
    */
  def incrementalExactBloom(corpus: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    // one corpus pass feeds both the sketch and the verify index
    val corpusHashes = corpus
      .select(sha2(tagged(col(textCol)), 256).as("__h"), col(idCol).as("__cid"))
      .groupBy(col("__h")).agg(min(col("__cid")).as("__exact_of"))
      .persist()
    val keyed = batch.select(col(idCol).as("id"),
      sha2(tagged(col(textCol)), 256).as("__h"))
    // try/finally: a throw from the sketch build, the verify join, or the
    // eager count must not leak the cached corpus hash index
    try {
      if (corpusHashes.isEmpty) { // stat.bloomFilter NPEs on zero rows
        val result = keyed.select(col("id").as(idCol), lit("new").as("status"),
          lit(null).cast(corpus.schema(idCol).dataType).as("dup_of")).persist()
        result.count()
        return result
      }
      val bf = corpusHashes.select(xxhash64(col("__h")).as("__k"))
        .stat.bloomFilter("__k", expectedItems, fpp)
      classifyExactWithBloom(corpusHashes, bf, keyed, idCol,
        corpus.schema(idCol).dataType)
    } finally corpusHashes.unpersist()
  }

  /** The shared verify-join core of the Bloom-pruned exact classifiers:
    * Bloom-negative rows bypass the hash-index join entirely (certainly
    * new — the sketch has no false negatives); positives verify against
    * the sha256 index so the classification stays exact. `keyed` must be
    * (id, __h); `hashes` must be (__h, __exact_of).
    */
  private def classifyExactWithBloom(
      hashes: DataFrame, bf: org.apache.spark.util.sketch.BloomFilter,
      keyed: DataFrame, idCol: String,
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val positive = keyed
      .filter(graft.functions.BloomFunctions.mightContain(xxhash64(col("__h")), bf))
      .join(hashes, Seq("__h"), "left")
    val negative = keyed
      .filter(!graft.functions.BloomFunctions.mightContain(xxhash64(col("__h")), bf))
      .withColumn("__exact_of", lit(null).cast(idType))
    val result = positive.unionByName(negative)
      .select(col("id").as(idCol),
        when(col("__exact_of").isNotNull, "exact_dup").otherwise("new").as("status"),
        col("__exact_of").as("dup_of"))
      .persist()
    result.count()
    result
  }

  // — persisted incremental-dedup state ———————————————————————————————————
  //   [[incrementalExactBloom]]'s scaladoc admits the per-batch rebuild:
  //   every call pays one full corpus scan for the hash index plus one
  //   for the sketch. A daily 100-TB ingest must pay that ONCE — the
  //   index persists alongside the corpus (the deployment shape
  //   [[Ivf.writeIndex]] already has for ANN lists) and each batch costs
  //   only |batch| probe work plus a parquet scan of the compact
  //   (64-char hash, id) index on the verify join.

  /** A loaded persistent exact-dedup index: the sha256→min-id hash table
    * (parquet-backed — executors scan it, the driver never holds it) and
    * the driver-resident Bloom sketch over `xxhash64` of the hashes.
    * `expectedItems`/`fpp` are the sketch's creation parameters, kept so
    * [[appendToHashIndex]] can build mergeable (bit-compatible) deltas.
    */
  final case class HashIndex(
      hashes: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter,
      expectedItems: Long,
      fpp: Double)

  private[graft] def hadoopFs(spark: org.apache.spark.sql.SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** An "empty" sketch that stays BIT-COMPATIBLE with the data-built ones:
    * `BloomFilter.create(n, fpp)` and `DataFrame.stat.bloomFilter(_, n,
    * fpp)` can disagree on the bit count for large `n` (the SQL aggregate
    * caps its bits), and `mergeInPlace` refuses mismatched sizes — so
    * every sketch that might later merge is built through the SAME stat
    * path, seeded with one sentinel key (an fpp epsilon: a real key
    * colliding with it just probes and verify-fails, like any false
    * positive).
    */
  private[graft] def emptyBloom(spark: org.apache.spark.sql.SparkSession,
      expectedItems: Long, fpp: Double): org.apache.spark.util.sketch.BloomFilter =
    spark.range(1).select(xxhash64(lit("__graft_empty_bloom")).as("__k"))
      .stat.bloomFilter("__k", expectedItems, fpp)

  private def writeBloomFile(spark: org.apache.spark.sql.SparkSession, path: String,
      bf: org.apache.spark.util.sketch.BloomFilter, expectedItems: Long, fpp: Double): Unit = {
    val (fs, p) = hadoopFs(spark, path)
    val out = fs.create(p, true)
    // header carries the creation params (they are not recoverable from
    // the serialized bits) so append-time deltas stay bit-compatible
    try {
      val dos = new java.io.DataOutputStream(out)
      dos.writeLong(expectedItems)
      dos.writeDouble(fpp)
      bf.writeTo(dos)
      dos.flush()
    } finally out.close()
  }

  /** Persist the corpus-side state of [[incrementalExactBloom]]:
    * `path/hashes` (parquet: `__h` sha256 hex, `__exact_of` min corpus
    * id) plus `path/bloom.bin` (the serialized sketch with its creation
    * params). One corpus scan total; the sketch is rebuilt from the
    * written index (a compact re-read, not a second corpus pass) so the
    * two artifacts can never disagree about membership.
    */
  def writeHashIndex(corpus: DataFrame, idCol: String, textCol: String, path: String,
      expectedItems: Long, fpp: Double = 0.01): Unit = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    val spark = corpus.sparkSession
    corpus
      .select(sha2(tagged(col(textCol)), 256).as("__h"), col(idCol).as("__cid"))
      .groupBy(col("__h")).agg(min(col("__cid")).as("__exact_of"))
      .write.mode("overwrite").parquet(s"$path/hashes")
    val persisted = spark.read.parquet(s"$path/hashes")
    val bf =
      if (persisted.isEmpty) // stat.bloomFilter NPEs on zero rows
        emptyBloom(spark, expectedItems, fpp)
      else persisted.select(xxhash64(col("__h")).as("__k"))
        .stat.bloomFilter("__k", expectedItems, fpp)
    writeBloomFileAtomic(spark, path, bf, expectedItems, fpp)
  }

  /** Load a persisted index. The hash table is a lazy parquet frame; only
    * the sketch (sized by `expectedItems` at write time) is driver-held.
    */
  def readHashIndex(spark: org.apache.spark.sql.SparkSession, path: String): HashIndex = {
    finishBatchCompaction(spark, path) // complete an interrupted dir swap first
    val (bf, items, fpp) = readBloomFile(spark, path)
    HashIndex(spark.read.parquet(s"$path/hashes"), bf, items, fpp)
  }

  /** Read a `<dir>/bloom.bin` written by [[writeBloomFileAtomic]]: the
    * header's creation params ride back so later deltas stay
    * bit-compatible (`mergeInPlace` refuses mismatched sizes).
    */
  private[graft] def readBloomFile(spark: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.util.sketch.BloomFilter, Long, Double) = {
    val (fs, p) = hadoopFs(spark, s"$dir/bloom.bin")
    val in = fs.open(p)
    try {
      val dis = new java.io.DataInputStream(in)
      val items = dis.readLong()
      val fpp = dis.readDouble()
      (org.apache.spark.util.sketch.BloomFilter.readFrom(dis), items, fpp)
    } finally in.close()
  }

  /** [[incrementalExactBloom]] against a persisted [[HashIndex]]: same
    * exact classification, but the corpus is never scanned — per-batch
    * cost drops to the Bloom probe per row plus the verify join of the
    * (pruned) positives against the compact on-disk hash table. Returns
    * the same eager cached (idCol, status, dup_of) frame.
    */
  def incrementalExactIndexed(index: HashIndex, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val idType = index.hashes.schema("__exact_of").dataType
    val keyed = batch.select(col(idCol).as("id"),
      sha2(tagged(col(textCol)), 256).as("__h"))
    classifyExactWithBloom(index.hashes, index.bloom, keyed, idCol, idType)
  }

  /** Fold a batch's accepted documents into a persisted index without
    * rebuilding it: new hash rows are anti-joined against the existing
    * table (idempotent re-ingest; intra-batch duplicates elect min id)
    * and appended as new parquet parts, and their keys merge into the
    * sketch (a delta filter built with the SAME creation params is
    * bit-compatible with the stored one — `mergeInPlace` is a bitwise
    * OR). The sketch saturates past `expectedItems` total inserts (fpp
    * degrades, correctness doesn't — positives always verify); rewrite
    * with [[writeHashIndex]] when the corpus outgrows it. Once the table
    * accumulates `autoCompactAt` part files the append folds it in place
    * ([[maybeAutoCompact]] — crash-safe via the compaction marker).
    */
  def appendToHashIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      autoCompactAt: Int = AutoCompactDefault): Unit = {
    val index = readHashIndex(spark, path)
    val fresh = newDocs
      .select(sha2(tagged(col(textCol)), 256).as("__h"), col(idCol).as("__cid"))
      .groupBy(col("__h")).agg(min(col("__cid")).as("__exact_of"))
      .join(index.hashes, Seq("__h"), "left_anti")
      .localCheckpoint() // pin BEFORE the append below rewrites the dir it reads
    val delta =
      if (fresh.isEmpty) emptyBloom(spark, index.expectedItems, index.fpp)
      else fresh.select(xxhash64(col("__h")).as("__k"))
        .stat.bloomFilter("__k", index.expectedItems, index.fpp)
    // sketch BEFORE table: a crash between the two writes must leave keys
    // in the sketch without rows (harmless false positives — the verify
    // join is exact, and the retry's anti-join still sees the rows as
    // missing and re-appends them), never rows without keys — the retry
    // anti-joins the TABLE, so a sketch that missed its delta would stay
    // stale forever and every later probe of those keys would false-
    // NEGATIVE (a duplicate classified new, silently admitted)
    index.bloom.mergeInPlace(delta)
    writeBloomFileAtomic(spark, path, index.bloom, index.expectedItems, index.fpp)
    fresh.write.mode("append").parquet(s"$path/hashes")
    maybeAutoCompact(spark, path, HashIndexTables, autoCompactAt)
  }

  // — persisted PARAGRAPH index (FineWeb incremental deployment shape) —————
  //   [[paragraphDedup]] is corpus-wide: every call pays the full corpus
  //   explode + election. The deployment shape FineWeb actually runs is
  //   incremental — today's crawl batch dedups paragraph-by-paragraph
  //   against everything already ingested, and the corpus side must cost
  //   a COLUMN SCAN of a compact digest index, never a corpus re-explode
  //   (let alone corpus²). The paragraph index is the sub-document twin of
  //   [[writeHashIndex]]: one (sha256 → min corpus id) row per DISTINCT
  //   corpus paragraph, plus the Bloom sketch that lets the common case
  //   (a genuinely new paragraph) skip the verify join entirely.

  /** A loaded persistent paragraph index: the digest→min-corpus-id table
    * (parquet-backed, executor-scanned) and the driver-resident Bloom
    * sketch over `xxhash64` of the digests. `sep` rides in meta.json so a
    * batch can never silently split on a different separator than the
    * corpus was indexed with.
    */
  final case class ParagraphIndex(
      paras: DataFrame, // (__h sha256 of paragraph, __para_of min corpus id)
      bloom: org.apache.spark.util.sketch.BloomFilter,
      expectedItems: Long, fpp: Double, sep: String)

  /** One corpus paragraph row per (id, pos): explode on `sep`, drop
    * blank-after-trim paragraphs — the EXACT same grain as
    * [[paragraphDedup]], shared so the live and indexed paths can never
    * disagree about what a paragraph is.
    */
  private def paragraphTable(docs: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame =
    docs.withColumn(idCol, idNotNull(idCol))
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .toDF(idCol, "__pos", "__para")
      .filter(length(trim(col("__para"))) > 0)

  /** Persist the corpus-side state of incremental paragraph dedup:
    * `path/paras` parquet (`__h` sha256 of the paragraph body, `__para_of`
    * min corpus id) + `path/bloom.bin` (creation params in the header) +
    * `path/meta.json` (the separator — deleted FIRST on rebuild and
    * written LAST, so its presence marks a complete index even when a
    * rebuild over an existing index crashes mid-rewrite).
    *
    * 100-TB plan shape: one corpus explode, then `groupBy(digest).agg(min
    * (id))` — MAP-SIDE combine collapses a boilerplate paragraph repeated
    * 10⁸ times to one row per input partition before the shuffle (same
    * skew armor as [[paragraphDedup]]'s election); the sketch builds from
    * the PERSISTED table (a compact re-read, not a second corpus pass) so
    * the two artifacts can never disagree about membership.
    */
  def writeParagraphIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, expectedItems: Long, fpp: Double = 0.01,
      sep: String = "\n"): Unit = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    val spark = corpus.sparkSession
    locally { // invalidate the completeness marker before touching tables
      val (fs, metaP) = hadoopFs(spark, s"$path/meta.json")
      if (fs.exists(metaP)) fs.delete(metaP, false)
    }
    paragraphTable(corpus, idCol, textCol, sep)
      .select(sha2(col("__para"), 256).as("__h"), col(idCol).as("__cid"))
      .groupBy(col("__h")).agg(min(col("__cid")).as("__para_of"))
      .write.mode("overwrite").parquet(s"$path/paras")
    val persisted = spark.read.parquet(s"$path/paras")
    val bf =
      if (persisted.isEmpty) emptyBloom(spark, expectedItems, fpp)
      else persisted.select(xxhash64(col("__h")).as("__k"))
        .stat.bloomFilter("__k", expectedItems, fpp)
    writeBloomFileAtomic(spark, path, bf, expectedItems, fpp)
    writeTextFile(spark, s"$path/meta.json",
      // sep as JSON code points — exact round-trip for any separator
      s"""{"sep_cps":[${sep.codePoints().toArray.mkString(",")}]}""")
  }

  /** Load a persisted paragraph index. The digest table is a lazy parquet
    * frame; only the sketch is driver-held.
    */
  def readParagraphIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): ParagraphIndex = {
    finishBatchCompaction(spark, path) // complete an interrupted dir swap first
    val meta = readTextFile(spark, s"$path/meta.json")
    val sep = new String("""\"sep_cps\":\[([0-9,\s]*)\]""".r.findFirstMatchIn(meta)
      .map(_.group(1)).getOrElse(throw new IllegalStateException(
        s"paragraph index at $path has no sep_cps in meta.json"))
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt)
      .foldLeft(new java.lang.StringBuilder()) { (b, cp) => b.appendCodePoint(cp) })
    val (fs, p) = hadoopFs(spark, s"$path/bloom.bin")
    val in = fs.open(p)
    val (bf, items, fpp) =
      try {
        val dis = new java.io.DataInputStream(in)
        val items = dis.readLong()
        val fpp = dis.readDouble()
        (org.apache.spark.util.sketch.BloomFilter.readFrom(dis), items, fpp)
      } finally in.close()
    ParagraphIndex(spark.read.parquet(s"$path/paras"), bf, items, fpp, sep)
  }

  /** [[paragraphDedup]] against a persisted [[ParagraphIndex]] — the
    * incremental contract of the whole index family: a batch paragraph
    * whose content already exists ANYWHERE in the indexed corpus is cut
    * (arrival order wins — the corpus was there first); among the batch's
    * own paragraphs, the min `(id, pos)` occurrence survives (the same
    * election [[paragraphDedup]] runs corpus-wide). Documents left with
    * zero surviving paragraphs drop out; survivors reassemble in original
    * order. Returns (idCol, textCol).
    *
    * Per-batch cost at 100 TB: batch explode + batch-keyed election (map-
    * side combined), a Bloom probe per distinct batch paragraph, and ONE
    * verify join of the sketch-positive digests against the compact
    * on-disk table — the corpus is never re-exploded, never self-joined,
    * and certainly-new paragraphs (the overwhelming majority of a crawl)
    * cost zero index I/O beyond the scan the positives share.
    */
  def incrementalParagraphIndexed(index: ParagraphIndex, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val paras = paragraphTable(batch, idCol, textCol, index.sep)
      .localCheckpoint() // pin: feeds election, survivor join AND reassembly
    val keyed = paras.select(sha2(col("__para"), 256).as("__h"), col(idCol), col("__pos"))
    // in-batch election (map-side combine collapses hot digests pre-shuffle).
    // Pinned: both Bloom branches below consume it, and WITHOUT the pin
    // Catalyst pushes each branch's sketch filter below the aggregate
    // (the filter is on the group key), splitting the exchange into two
    // subtrees that each re-scan the batch and re-run the election —
    // verified by the PlanSpec listener sweep, which pins the partial
    // election to exactly ONE executed aggregate. The pinned frame is
    // batch-distinct-paragraph-sized, bounded by the batch contract.
    val batchWin = keyed
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__slot"))
      .localCheckpoint()
    // corpus check: Bloom-negative winners are certainly new (no false
    // negatives) and bypass the verify join; positives verify against the
    // digest table so the classification stays exact
    val positive = batchWin
      .filter(graft.functions.BloomFunctions.mightContain(xxhash64(col("__h")), index.bloom))
      .join(index.paras.select(col("__h"), col("__para_of")), Seq("__h"), "left")
      .filter(col("__para_of").isNull).drop("__para_of")
    val negative = batchWin
      .filter(!graft.functions.BloomFunctions.mightContain(xxhash64(col("__h")), index.bloom))
    val surv = positive.unionByName(negative)
      .select(col("__slot")(idCol).as(idCol), col("__slot")("__pos").as("__pos"))
    paras.join(surv, Seq(idCol, "__pos"), "left_semi")
      .groupBy(col(idCol))
      .agg(concat_ws(index.sep,
        transform(array_sort(collect_list(struct(col("__pos"), col("__para")))),
          s => s.getField("__para"))).as(textCol))
  }

  /** Fold a batch's ACCEPTED documents' paragraphs into a persisted
    * paragraph index without rebuilding it — the [[appendToHashIndex]]
    * twin: new digest rows anti-join the existing table (idempotent
    * re-ingest; intra-batch duplicates elect min id) and append as new
    * parquet parts; their keys merge into the sketch via a bit-compatible
    * delta. The sketch saturates past `expectedItems` total inserts (fpp
    * degrades, correctness doesn't — positives always verify); rewrite
    * with [[writeParagraphIndex]] when the corpus outgrows it.
    */
  def appendToParagraphIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      autoCompactAt: Int = AutoCompactDefault): Unit = {
    val index = readParagraphIndex(spark, path)
    val fresh = paragraphTable(newDocs, idCol, textCol, index.sep)
      .select(sha2(col("__para"), 256).as("__h"), col(idCol).as("__cid"))
      .groupBy(col("__h")).agg(min(col("__cid")).as("__para_of"))
      .join(index.paras, Seq("__h"), "left_anti")
      .localCheckpoint() // pin BEFORE the append below rewrites the dir it reads
    val delta =
      if (fresh.isEmpty) emptyBloom(spark, index.expectedItems, index.fpp)
      else fresh.select(xxhash64(col("__h")).as("__k"))
        .stat.bloomFilter("__k", index.expectedItems, index.fpp)
    // sketch BEFORE table — see [[appendToHashIndex]]: rows-without-keys
    // false-negative forever (the retry anti-join hides them from the
    // delta), keys-without-rows just verify-fail
    index.bloom.mergeInPlace(delta)
    writeBloomFileAtomic(spark, path, index.bloom, index.expectedItems, index.fpp)
    fresh.write.mode("append").parquet(s"$path/paras")
    maybeAutoCompact(spark, path, ParagraphIndexTables, autoCompactAt)
  }

  // — persisted SPAN index (Lee '21 exact-substring incremental shape) —————
  //   [[substringDedup]] is corpus-wide: every call re-windows the whole
  //   corpus. The deployment shape is incremental — today's batch cuts
  //   any k-token span that already exists ANYWHERE in the ingested
  //   corpus (the corpus was there first), and among its own windows runs
  //   the same min-(id, pos) election the live operator runs. The index
  //   is the sub-document twin of [[writeHashIndex]] at the window grain:
  //   one (sha256 → min corpus id) row per DISTINCT corpus window plus
  //   the Bloom sketch that lets a certainly-new window (the crawl
  //   common case) skip the verify join entirely. The window table is
  //   corpus-token-scale — that is inherent to the Lee '21 grain (their
  //   suffix array is the same order); the sketch and the digest-keyed
  //   layout keep the per-batch cost at batch explode + column scans.

  /** A loaded persistent span index. `k` rides in meta.json so a batch
    * can never window at a different grain than the corpus was indexed
    * with.
    */
  final case class SpanIndex(
      spans: DataFrame, // (__h sha256 of k-token window, __span_of min corpus id)
      bloom: org.apache.spark.util.sketch.BloomFilter,
      expectedItems: Long, fpp: Double, k: Int)

  /** Persist the corpus-side state of incremental substring dedup:
    * `path/spans` parquet + `path/bloom.bin` (creation params in the
    * header) + `path/meta.json` (the window grain — deleted FIRST on
    * rebuild and written LAST, so its presence marks a complete index).
    * One corpus explode, map-side-combined digest election; the sketch
    * builds from the PERSISTED table so the artifacts can never disagree.
    */
  def writeSpanIndex(corpus: DataFrame, idCol: String, textCol: String,
      path: String, expectedItems: Long, fpp: Double = 0.01, k: Int = 8): Unit = {
    require(k >= 2, s"window must span at least 2 tokens, got $k")
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    val spark = corpus.sparkSession
    locally { // invalidate the completeness marker before touching tables
      val (fs, metaP) = hadoopFs(spark, s"$path/meta.json")
      if (fs.exists(metaP)) fs.delete(metaP, false)
    }
    spanWindows(spanBase(corpus, idCol, textCol), idCol, k)
      .groupBy(col("__h")).agg(min(col(idCol)).as("__span_of"))
      .write.mode("overwrite").parquet(s"$path/spans")
    val persisted = spark.read.parquet(s"$path/spans")
    val bf =
      if (persisted.isEmpty) emptyBloom(spark, expectedItems, fpp)
      else persisted.select(xxhash64(col("__h")).as("__k"))
        .stat.bloomFilter("__k", expectedItems, fpp)
    writeBloomFileAtomic(spark, path, bf, expectedItems, fpp)
    writeTextFile(spark, s"$path/meta.json",
      s"""{"k":$k,"expectedItems":$expectedItems,"fpp":$fpp}""")
  }

  /** Load a persisted span index (completing an interrupted compaction
    * swap first, like every index reader).
    */
  def readSpanIndex(spark: org.apache.spark.sql.SparkSession, path: String): SpanIndex = {
    finishBatchCompaction(spark, path)
    val meta = readTextFile(spark, s"$path/meta.json")
    val k = """"k":\s*([0-9]+)""".r.findFirstMatchIn(meta)
      .getOrElse(throw new IllegalStateException(s"span index at $path has no k in meta.json"))
      .group(1).toInt
    val (fs, p) = hadoopFs(spark, s"$path/bloom.bin")
    val in = fs.open(p)
    val (bf, items, fpp) =
      try {
        val dis = new java.io.DataInputStream(in)
        val items = dis.readLong()
        val fpp = dis.readDouble()
        (org.apache.spark.util.sketch.BloomFilter.readFrom(dis), items, fpp)
      } finally in.close()
    SpanIndex(spark.read.parquet(s"$path/spans"), bf, items, fpp, k)
  }

  /** [[substringDedup]] against a persisted [[SpanIndex]] — the
    * incremental contract at the window grain: a batch window whose
    * content exists ANYWHERE in the indexed corpus loses (the corpus was
    * there first); among the batch's own windows the min (id, pos)
    * occurrence survives (the same election [[substringDedup]] runs
    * corpus-wide). Tokens covered by losing windows are cut; fully
    * covered documents drop; survivors reassemble through the SAME
    * [[cutSpanLosers]] the live operator uses. Returns (idCol, textCol).
    *
    * Per-batch cost at 100 TB: batch explode + batch-keyed election
    * (map-side combined), a Bloom probe per distinct batch window, ONE
    * verify join of the sketch positives against the compact on-disk
    * digest table — the corpus is never re-windowed, never self-joined.
    */
  def incrementalSubstringIndexed(index: SpanIndex, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val base = spanBase(batch, idCol, textCol)
      .localCheckpoint() // pin: feeds the window explode AND the reassembly
    val wins = spanWindows(base, idCol, index.k)
      .localCheckpoint() // pin: feeds the election AND the loser anti-join
    // in-batch election, pinned — the x94 lesson: unpinned, Catalyst
    // pushes each Bloom branch's sketch filter below the aggregate and
    // re-runs the election per branch (PlanSpec pins the paragraph twin
    // to ONE executed aggregate; this path rides the same shape)
    val batchWin = wins
      .groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("__wpos"))).as("__slot"))
      .localCheckpoint()
    val positive = batchWin
      .filter(graft.functions.BloomFunctions.mightContain(xxhash64(col("__h")), index.bloom))
      .join(index.spans.select(col("__h"), col("__span_of")), Seq("__h"), "left")
      .filter(col("__span_of").isNull).drop("__span_of")
    val negative = batchWin
      .filter(!graft.functions.BloomFunctions.mightContain(xxhash64(col("__h")), index.bloom))
    val winners = positive.unionByName(negative)
      .select(col("__slot")(idCol).as(idCol), col("__slot")("__wpos").as("__wpos"))
    cutSpanLosers(base, spanLoserLists(wins, winners, idCol), idCol, textCol, index.k)
  }

  /** Fold a batch's accepted documents' windows into a persisted span
    * index without rebuilding it — the [[appendToHashIndex]] twin at the
    * window grain: new digest rows anti-join the existing table
    * (idempotent re-ingest; intra-batch duplicates elect min id), the
    * sketch merges its bit-compatible delta BEFORE the table append
    * (rows-without-keys would false-negative forever — see
    * [[appendToHashIndex]]), and the rows append as new parquet parts.
    * Pass the documents' FINAL (post-cut) text — indexing spans the batch
    * itself just cut would resurrect them as corpus content.
    */
  def appendToSpanIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      autoCompactAt: Int = AutoCompactDefault): Unit = {
    val index = readSpanIndex(spark, path)
    val fresh = spanWindows(spanBase(newDocs, idCol, textCol), idCol, index.k)
      .groupBy(col("__h")).agg(min(col(idCol)).as("__span_of"))
      .join(index.spans, Seq("__h"), "left_anti")
      .localCheckpoint() // pin BEFORE the append below rewrites the dir it reads
    val delta =
      if (fresh.isEmpty) emptyBloom(spark, index.expectedItems, index.fpp)
      else fresh.select(xxhash64(col("__h")).as("__k"))
        .stat.bloomFilter("__k", index.expectedItems, index.fpp)
    index.bloom.mergeInPlace(delta)
    writeBloomFileAtomic(spark, path, index.bloom, index.expectedItems, index.fpp)
    fresh.write.mode("append").parquet(s"$path/spans")
    maybeAutoCompact(spark, path, Seq("spans"), autoCompactAt)
  }

  /** [[compactBatchIndex]] over [[writeSpanIndex]]'s layout. */
  def compactSpanIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFiles: Int = 1): Unit =
    compactBatchIndex(spark, path, Seq("spans"), targetFiles)

  // — persisted NEAR-dup probe state (band index) ——————————————————————————
  //   The banding twin of [[writeHashIndex]]: [[incrementalDedup]] pays a
  //   full corpus tokenize + shingle explode + 64-permutation MinHash per
  //   batch — the dominant CPU of the incremental path, and pure rebuild
  //   (the corpus didn't change). The band index persists the corpus
  //   shingle table, set sizes, banded signatures and per-bucket
  //   (count, hub) aggregates; a batch then classifies with batch-sized
  //   compute plus COLUMN SCANS of the compact index tables (the per-
  //   batch corpus cost drops from hash CPU to I/O — and the scans join
  //   against broadcast batch-sized frames, so nothing corpus-scale ever
  //   shuffles per batch).

  /** A loaded persistent band index. All frames are lazy parquet scans;
    * `buckets` carries the per-bucket corpus occupancy and min-id hub so
    * hot-bucket detection and star degradation need no corpus band
    * aggregate per batch.
    */
  final case class BandIndex(
      bands: DataFrame,    // (corpus_id, band_idx, band_hash)
      buckets: DataFrame,  // (band_idx, band_hash, __ccnt, __hub)
      shingles: DataFrame, // (id, shingle)
      sizes: DataFrame,    // (id, set_size)
      n: Int, numPerm: Int, numBands: Int, rowsPerBand: Int)

  /** Write a small text file ATOMICALLY-ish: content lands whole in
    * `<path>.__tmp` first and swaps in via rename (the
    * [[writeBloomFileAtomic]] discipline). A crash mid-write can never
    * leave a TRUNCATED destination — the hazard became live in round 14
    * when `meta.json` turned into a PER-FOLD rewrite on the BM25 index
    * (truncated JSON loses `id_col` and bricks the index). Worst case
    * (crash inside the delete→rename window) leaves the file MISSING,
    * which every reader treats as "incomplete": it fails loud with
    * rebuild guidance, or self-heals where a sibling artifact carries
    * the lost fields (the BM25 family reconstructs meta.json from the
    * `stats.dirty` marker + the doclen table).
    */
  private[graft] def writeTextFile(spark: org.apache.spark.sql.SparkSession, path: String,
      content: String): Unit = {
    val (fs, p) = hadoopFs(spark, path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".__tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"text-file swap $tmp -> $p failed")
  }

  private[graft] def readTextFile(spark: org.apache.spark.sql.SparkSession, path: String): String = {
    val (fs, p) = hadoopFs(spark, path)
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val arr = new Array[Byte](8192)
      var r = in.read(arr)
      while (r >= 0) { buf.write(arr, 0, r); r = in.read(arr) }
      buf.toString("UTF-8")
    } finally in.close()
  }

  /** Persist the corpus-side state of [[incrementalDedup]]'s near stage:
    * `path/{shingles,sizes,bands,buckets}` parquet plus `path/meta.json`
    * (the shingle width and banding geometry — written LAST, so its
    * presence marks a complete index). One corpus pass builds the
    * shingle table; everything downstream derives from the persisted
    * copy, so the artifacts can never disagree.
    */
  def writeBandIndex(corpus: DataFrame, idCol: String, text: Column, path: String,
      n: Int, numPerm: Int, numBands: Int, rowsPerBand: Int): Unit = {
    require(numBands * rowsPerBand == numPerm,
      s"numBands ($numBands) × rowsPerBand ($rowsPerBand) must equal numPerm ($numPerm)")
    val spark = corpus.sparkSession
    shingleTable(corpus, idCol, text, n)
      .write.mode("overwrite").parquet(s"$path/shingles")
    val shP = spark.read.parquet(s"$path/shingles")
    shP.groupBy(col("id")).agg(count(lit(1)).as("set_size"))
      .write.mode("overwrite").parquet(s"$path/sizes")
    minhashFromShingles(shP, numPerm)
      .select(col("id").as("corpus_id"),
        explode(array(bandExprs(numBands, rowsPerBand): _*)).as("band"))
      .select(col("corpus_id"), col("band.band_idx"), col("band.band_hash"))
      .write.mode("overwrite").parquet(s"$path/bands")
    spark.read.parquet(s"$path/bands")
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__ccnt"), min(col("corpus_id")).as("__hub"))
      .write.mode("overwrite").parquet(s"$path/buckets")
    writeTextFile(spark, s"$path/meta.json",
      s"""{"n":$n,"numPerm":$numPerm,"numBands":$numBands,"rowsPerBand":$rowsPerBand}""")
  }

  /** Load a persisted band index (lazy parquet frames + parsed meta). */
  def readBandIndex(spark: org.apache.spark.sql.SparkSession, path: String): BandIndex = {
    finishBatchCompaction(spark, path) // complete an interrupted dir swap first
    val meta = readTextFile(spark, s"$path/meta.json")
    def intOf(k: String): Int =
      s""""$k":\\s*(\\d+)""".r.findFirstMatchIn(meta)
        .getOrElse(throw new IllegalArgumentException(s"band index meta missing $k: $meta"))
        .group(1).toInt
    BandIndex(
      bands = spark.read.parquet(s"$path/bands"),
      buckets = spark.read.parquet(s"$path/buckets"),
      shingles = spark.read.parquet(s"$path/shingles"),
      sizes = spark.read.parquet(s"$path/sizes"),
      n = intOf("n"), numPerm = intOf("numPerm"),
      numBands = intOf("numBands"), rowsPerBand = intOf("rowsPerBand"))
  }

  /** [[incrementalDedup]] against persisted indexes: the exact stage
    * probes the [[HashIndex]] (Bloom-pruned — negatives skip the verify
    * join), the near stage probes the [[BandIndex]]. Classification is
    * IDENTICAL to the live operator (probe x59 shares x21's oracle); the
    * per-batch corpus cost drops from tokenize+shingle+MinHash CPU to
    * column scans of the index tables, each joined against a broadcast
    * batch-sized frame — nothing corpus-scale shuffles per batch.
    *
    * Hot buckets: per-batch occupancy = persisted corpus count + batch
    * count for every bucket the batch TOUCHES (corpus-hot buckets the
    * batch never probes generate no candidates in the live operator
    * either); star degradation pairs hot-bucket batch members with the
    * bucket's persisted min-id hub.
    */
  def incrementalDedupIndexed(hashIndex: HashIndex, bandIndex: BandIndex,
      batch: DataFrame, idCol: String, textCol: String, threshold: Double,
      maxBucket: Int = DefaultMaxBucket,
      batchBroadcastCap: Long = BatchBroadcastCap): DataFrame = {
    import bandIndex.{numPerm, numBands, rowsPerBand}
    // 1. exact via the persisted hash index
    val exact = incrementalExactIndexed(hashIndex, batch, idCol, textCol)
    val exactStatus = exact
      .select(col(idCol).as("id"),
        when(col("status") === "exact_dup", col("dup_of")).as("__exact_of"))
      .persist()
    exactStatus.count()
    exact.unpersist()

    // 2. near: batch-side shingles + signatures only; corpus side comes
    //    from the index
    val survivors = batch.join(
      exactStatus.filter(col("__exact_of").isNotNull).select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
    val shB = shingleTable(survivors, idCol, col(textCol), bandIndex.n).localCheckpoint()
    val bandB = minhashFromShingles(shB, numPerm)
      .select(col("id").as("batch_id"),
        explode(array(bandExprs(numBands, rowsPerBand): _*)).as("band"))
      .select(col("batch_id"), col("band.band_idx"), col("band.band_hash"))
      .localCheckpoint()
    // hot detection: persisted corpus occupancy + batch occupancy, for
    // touched buckets only. batchCnt is batch-bounded → broadcast side of
    // the buckets scan; batch-only buckets (absent from the corpus) are
    // recovered with an anti-join against the (small) touched set.
    val batchCnt = bandB.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__bcnt")).localCheckpoint()
    val touched = bandIndex.buckets
      .join(broadcast(batchCnt), Seq("band_idx", "band_hash"))
    val batchOnly = batchCnt.join(touched.select(col("band_idx"), col("band_hash")),
      Seq("band_idx", "band_hash"), "left_anti")
    val hot = touched.filter(col("__ccnt") + col("__bcnt") > maxBucket)
      .select(col("band_idx"), col("band_hash"), col("__hub"))
      .unionByName(batchOnly.filter(col("__bcnt") > maxBucket)
        .select(col("band_idx"), col("band_hash"), lit(null).cast("long").as("__hub")))
      .localCheckpoint()
    val hotKeys = hot.select(col("band_idx"), col("band_hash"))
    // cold candidates: batch bands (hot excluded) against the persisted
    // corpus bands — bounded batch side broadcasts (measured), else merge
    val coldB = bandB.join(hotKeys, Seq("band_idx", "band_hash"), "left_anti")
    val coldCands =
      (if (bandB.count() <= batchBroadcastCap)
        bandIndex.bands.join(broadcast(coldB), Seq("band_idx", "band_hash"))
      else bandIndex.bands.hint("merge").join(coldB.hint("merge"), Seq("band_idx", "band_hash")))
        .select(col("batch_id").as("id_a"), col("corpus_id").as("id_b"))
    // star candidates: hot-bucket batch members against the persisted hub
    val starCands = bandB.join(hotKeys, Seq("band_idx", "band_hash"), "left_semi")
      .join(broadcast(hot.filter(col("__hub").isNotNull)), Seq("band_idx", "band_hash"))
      .select(col("batch_id").as("id_a"), col("__hub").as("id_b"))
    val cands = coldCands.unionByName(starCands).distinct().localCheckpoint()

    // 3. exact-Jaccard verify: corpus shingles/sizes restricted to the
    //    candidate corpus docs (semi-join against the bounded candidate
    //    id set → index scans, no corpus shuffle)
    val candB = cands.select(col("id_b").as("id")).distinct()
    val shC = bandIndex.shingles.join(broadcast(candB), Seq("id"), "left_semi")
    val sizesC = bandIndex.sizes.join(broadcast(candB), Seq("id"), "left_semi")
    val shAll = shB.unionByName(shC)
    val sizesAll = shB.groupBy(col("id")).agg(count(lit(1)).as("set_size"))
      .unionByName(sizesC)
    val nearOf = ngramJaccardForPairs(shAll, sizesAll, cands, threshold)
      .groupBy(col("id_a").as("id"))
      .agg(min(col("id_b")).as("__near_of"))

    val result = exactStatus
      .join(nearOf, Seq("id"), "left")
      .select(col("id").as(idCol),
        when(col("__exact_of").isNotNull, "exact_dup")
          .when(col("__near_of").isNotNull, "near_dup")
          .otherwise("new").as("status"),
        coalesce(col("__exact_of"), col("__near_of")).as("dup_of"))
      .persist()
    result.count()
    exactStatus.unpersist()
    result
  }

  /** Fold a batch's accepted documents into a persisted band index:
    * shingles, sizes and bands for the new ids append as parquet parts
    * (ids must be new — idempotence is the caller's [[appendToHashIndex]]
    * anti-join contract); the bucket aggregate is recomputed from the
    * appended band table into a staging dir and swapped in (it is an
    * aggregate — appending would double-count). Meta is unchanged.
    */
  def appendToBandIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      autoCompactAt: Int = AutoCompactDefault): Unit = {
    val idx = readBandIndex(spark, path)
    // idempotence is THIS function's job (the hash-index twin anti-joins
    // the same way): a replayed/retried batch must not double-insert —
    // duplicate shingle rows would inflate every later verification's
    // intersection counts and duplicate sizes rows would double set_size,
    // corrupting Jaccard for the re-appended ids. The guard is PER TABLE
    // (each append drops ids already present in ITS OWN target), so a
    // retry after a crash BETWEEN the three appends completes exactly the
    // missing tables: a single up-front guard on one table would either
    // re-insert into already-written tables or permanently skip the
    // unwritten ones, depending on which side of the crash the guard
    // table sat. All three fresh sets are pinned before any write
    // rewrites the directories they read.
    def freshVs(existing: DataFrame, existingId: String): DataFrame =
      newDocs.join(existing.select(col(existingId).as(idCol)), Seq(idCol), "left_anti")
        .localCheckpoint()
    val freshSh = freshVs(idx.shingles, "id")
    val freshSz = freshVs(idx.sizes, "id")
    val freshBd = freshVs(idx.bands, "corpus_id")
    shingleTable(freshSh, idCol, col(textCol), idx.n)
      .write.mode("append").parquet(s"$path/shingles")
    shingleTable(freshSz, idCol, col(textCol), idx.n)
      .groupBy(col("id")).agg(count(lit(1)).as("set_size"))
      .write.mode("append").parquet(s"$path/sizes")
    minhashFromShingles(shingleTable(freshBd, idCol, col(textCol), idx.n), idx.numPerm)
      .select(col("id").as("corpus_id"),
        explode(array(bandExprs(idx.numBands, idx.rowsPerBand): _*)).as("band"))
      .select(col("corpus_id"), col("band.band_idx"), col("band.band_hash"))
      .write.mode("append").parquet(s"$path/bands")
    // buckets: recompute from the appended band table via staging + swap
    // (cannot overwrite a path feeding the plan being written). NOTE:
    // this aggregate scans the FULL band table per append — amortized for
    // the low-frequency batch-ingest shape this index serves; for
    // high-frequency (per-micro-batch) appends use the streaming
    // IngestIndex below, whose appends are pure partition writes and
    // whose probe derives touched-bucket occupancy per batch instead
    spark.read.parquet(s"$path/bands")
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__ccnt"), min(col("corpus_id")).as("__hub"))
      .write.mode("overwrite").parquet(s"$path/buckets.staging")
    val (fs, bp) = hadoopFs(spark, s"$path/buckets")
    val staging = new org.apache.hadoop.fs.Path(s"$path/buckets.staging")
    if (fs.exists(bp)) fs.delete(bp, true)
    if (!fs.rename(staging, bp))
      throw new java.io.IOException(s"band index bucket swap $staging -> $bp failed")
    maybeAutoCompact(spark, path, BandIndexTables, autoCompactAt)
  }

  // — persisted SEMANTIC incremental-dedup state (vec index) ———————————————
  //   The embedding twin of the hash/band indexes above:
  //   [[incrementalSemanticDedup]] rebuilds the corpus xxhash index AND the
  //   sign-bucket frame every batch — a daily embedding ingest pays a full
  //   corpus scan per batch for state that did not change. The vec index
  //   persists both (plus a Bloom sketch over the content hashes, so
  //   certainly-new batch vectors skip the exact verify join entirely) and
  //   each batch classifies with batch-sized compute plus column scans of
  //   the compact index tables joined against broadcast batch-sized frames
  //   — nothing corpus-scale shuffles per batch.

  /** A loaded persistent vec index. All frames are lazy parquet scans;
    * `buckets` carries per-bucket corpus occupancy, min-id hub AND the
    * hub's vector, so hot-bucket detection + star verification need no
    * corpus aggregate per batch. The hyperplane geometry (numPlanes, dim,
    * seed) rides in meta so batch bucketing can never silently
    * desynchronize from the persisted corpus bucketing.
    */
  final case class VecIndex(
      hashes: DataFrame,  // (__h xxhash64(vec), __exact_of min id, __rvec rep vector)
      vecs: DataFrame,    // (corpus_id, __cvec, __bucket)
      buckets: DataFrame, // (__bucket, __ccnt, __hub, __hubvec)
      bloom: org.apache.spark.util.sketch.BloomFilter,
      expectedItems: Long, fpp: Double,
      numPlanes: Int, dim: Int, seed: Long)

  /** Persist the corpus-side state of [[incrementalSemanticDedup]]:
    * `path/{vecs,hashes,buckets}` parquet + `path/bloom.bin` (sketch over
    * the xxhash64 content keys, creation params in the header) +
    * `path/meta.json` (hyperplane geometry — deleted FIRST on rebuild and
    * written LAST, so its presence marks a complete index even when a
    * rebuild over an existing index crashes mid-rewrite). One corpus pass
    * builds the
    * bucketed vector table; hashes and buckets derive from the persisted
    * copy, so the artifacts can never disagree.
    */
  def writeVecIndex(corpus: DataFrame, idCol: String, vecCol: String, path: String,
      numPlanes: Int, dim: Int, expectedItems: Long, fpp: Double = 0.01,
      seed: Long = 42L): Unit = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    val spark = corpus.sparkSession
    // Invalidate the completeness marker BEFORE touching any table: a
    // rebuild over an existing index that crashes mid-rewrite (vecs done,
    // hashes/buckets stale) must not leave the old meta.json vouching for
    // mutually inconsistent tables.
    locally {
      val (fs, metaP) = hadoopFs(spark, s"$path/meta.json")
      if (fs.exists(metaP)) fs.delete(metaP, false)
    }
    val planes = Similarity.hyperplanes(numPlanes, dim, seed)
    corpus
      .select(col(idCol).as("corpus_id"), col(vecCol).as("__cvec"),
        Similarity.bucketId(col(vecCol), planes).as("__bucket"))
      .write.mode("overwrite").parquet(s"$path/vecs")
    val vecsP = spark.read.parquet(s"$path/vecs")
    vecsP
      .groupBy(xxhash64(col("__cvec")).as("__h"))
      .agg(min(col("corpus_id")).as("__exact_of"),
        min_by(col("__cvec"), col("corpus_id")).as("__rvec"))
      .write.mode("overwrite").parquet(s"$path/hashes")
    vecsP
      .groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__ccnt"), min(col("corpus_id")).as("__hub"),
        min_by(col("__cvec"), col("corpus_id")).as("__hubvec"))
      .write.mode("overwrite").parquet(s"$path/buckets")
    val hashesP = spark.read.parquet(s"$path/hashes")
    val bf =
      if (hashesP.isEmpty) // stat.bloomFilter NPEs on zero rows
        emptyBloom(spark, expectedItems, fpp)
      else hashesP.stat.bloomFilter("__h", expectedItems, fpp)
    writeBloomFileAtomic(spark, path, bf, expectedItems, fpp)
    writeTextFile(spark, s"$path/meta.json",
      s"""{"numPlanes":$numPlanes,"dim":$dim,"seed":$seed}""")
  }

  /** Load a persisted vec index (lazy parquet frames + sketch + meta). */
  def readVecIndex(spark: org.apache.spark.sql.SparkSession, path: String): VecIndex = {
    finishBatchCompaction(spark, path) // complete an interrupted dir swap first
    val meta = readTextFile(spark, s"$path/meta.json")
    def longOf(k: String): Long =
      s""""$k":\\s*(-?\\d+)""".r.findFirstMatchIn(meta)
        .getOrElse(throw new IllegalArgumentException(s"vec index meta missing $k: $meta"))
        .group(1).toLong
    val (fs, p) = hadoopFs(spark, s"$path/bloom.bin")
    val in = fs.open(p)
    val (bf, items, fpp) =
      try {
        val dis = new java.io.DataInputStream(in)
        val items = dis.readLong()
        val fpp = dis.readDouble()
        (org.apache.spark.util.sketch.BloomFilter.readFrom(dis), items, fpp)
      } finally in.close()
    VecIndex(
      hashes = spark.read.parquet(s"$path/hashes"),
      vecs = spark.read.parquet(s"$path/vecs"),
      buckets = spark.read.parquet(s"$path/buckets"),
      bloom = bf, expectedItems = items, fpp = fpp,
      numPlanes = longOf("numPlanes").toInt, dim = longOf("dim").toInt,
      seed = longOf("seed"))
  }

  /** [[incrementalSemanticDedup]] against a persisted [[VecIndex]]:
    * classification is IDENTICAL to the live operator (the x84 probe
    * shares x47's per-row value oracle), but the corpus is never
    * re-hashed or re-bucketed — per-batch corpus cost drops to column
    * scans of the index tables. The exact stage is additionally
    * Bloom-pruned: certainly-new vectors (no false negatives) skip the
    * hash verify join entirely; positives verify by array equality
    * against the persisted hash group's min-id representative, so the
    * classification stays exact (same 64-bit-collision fine print as the
    * live operator). Hot buckets: persisted corpus occupancy + batch
    * occupancy for buckets the batch TOUCHES; star degradation pairs
    * hot-bucket batch members with the persisted min-id hub, verified
    * against the persisted hub vector. Returns the same eager cached
    * (idCol, status, dup_of) frame — `unpersist()` when done.
    */
  def incrementalSemanticIndexed(index: VecIndex, batch: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      maxBucket: Int = DefaultMaxBucket,
      batchBroadcastCap: Long = BatchBroadcastCap): DataFrame = {
    val planes = Similarity.hyperplanes(index.numPlanes, index.dim, index.seed)
    val idType = index.hashes.schema("__exact_of").dataType
    val keyedB = batch.select(col(idCol).as("id"), col(vecCol).as("__bvec"),
      xxhash64(col(vecCol)).as("__h"))
    // 1. exact: Bloom prune, then verify positives against the persisted
    //    hash index (rep-vector equality keeps it exact)
    val positive = keyedB
      .filter(graft.functions.BloomFunctions.mightContain(col("__h"), index.bloom))
      .join(index.hashes, Seq("__h"), "left")
      .select(col("id"), col("__bvec"),
        when(col("__exact_of").isNotNull && col("__bvec") === col("__rvec"),
          col("__exact_of")).as("__exact_of"))
    val negative = keyedB
      .filter(!graft.functions.BloomFunctions.mightContain(col("__h"), index.bloom))
      .select(col("id"), col("__bvec"), lit(null).cast(idType).as("__exact_of"))
    val exactStatus = positive.unionByName(negative).persist()
    exactStatus.count()

    // 2. near: batch-side bucketing only; corpus side comes from the index
    val bB = exactStatus.filter(col("__exact_of").isNull)
      .select(col("id").as("batch_id"), col("__bvec"),
        Similarity.bucketId(col("__bvec"), planes).as("__bucket"))
      .localCheckpoint()
    // hot detection: persisted corpus occupancy + batch occupancy for
    // touched buckets only (corpus-hot buckets the batch never probes
    // generate no candidates in the live operator either); batch-only
    // buckets are recovered with an anti-join against the touched set
    val batchCnt = bB.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__bcnt")).localCheckpoint()
    val touched = index.buckets.join(broadcast(batchCnt), Seq("__bucket"))
    val batchOnly = batchCnt.join(touched.select(col("__bucket")),
      Seq("__bucket"), "left_anti")
    val vecType = index.vecs.schema("__cvec").dataType
    val hot = touched.filter(col("__ccnt") + col("__bcnt") > maxBucket)
      .select(col("__bucket"), col("__hub"), col("__hubvec"))
      .unionByName(batchOnly.filter(col("__bcnt") > maxBucket)
        .select(col("__bucket"), lit(null).cast(idType).as("__hub"),
          lit(null).cast(vecType).as("__hubvec")))
      .localCheckpoint()
    val hotKeys = hot.select(col("__bucket"))
    // cold candidates: persisted corpus vectors against the (bounded)
    // batch side — byte-aware broadcast license, merge-join degrade on
    // BOTH sides past it (same discipline as the live operator)
    val vecCap = math.min(batchBroadcastCap, Similarity.vecBroadcastRows(index.dim))
    val coldB = bB.join(hotKeys, Seq("__bucket"), "left_anti")
    val cold =
      if (bB.count() <= vecCap) index.vecs.join(broadcast(coldB), Seq("__bucket"))
      else index.vecs.hint("merge").join(coldB.hint("merge"), Seq("__bucket"))
    // star candidates: hot-bucket batch members vs the persisted hub (a
    // null hub = batch-only hot bucket — no corpus member to match)
    val star = bB.join(hotKeys, Seq("__bucket"), "left_semi")
      .join(broadcast(hot.filter(col("__hub").isNotNull)), Seq("__bucket"))
      .select(col("batch_id"), col("__bvec"),
        col("__hub").as("corpus_id"), col("__hubvec").as("__cvec"))
    val pairCols = Seq(col("batch_id"), col("__bvec"), col("corpus_id"), col("__cvec"))
    val nearOf = cold.select(pairCols: _*).unionByName(star.select(pairCols: _*))
      .withColumn("__cos", round(Similarity.cosine(col("__bvec"), col("__cvec")), 6))
      .filter(col("__cos") >= threshold)
      .groupBy(col("batch_id").as("id"))
      .agg(min(col("corpus_id")).as("__near_of"))

    val result = exactStatus
      .join(nearOf, Seq("id"), "left")
      .select(col("id").as(idCol),
        when(col("__exact_of").isNotNull, "exact_dup")
          .when(col("__near_of").isNotNull, "near_dup")
          .otherwise("new").as("status"),
        coalesce(col("__exact_of"), col("__near_of")).as("dup_of"))
      .persist()
    result.count()
    exactStatus.unpersist()
    result
  }

  /** Fold a batch's accepted vectors into a persisted vec index: bucketed
    * vector rows for the new ids append as parquet parts, new hash rows
    * anti-join the existing table on the content key (keep-first: an
    * existing hash group's representative survives; intra-batch
    * duplicates elect min id) and merge into the sketch, and the bucket
    * aggregate is recomputed from the appended vector table via staging +
    * swap (it is an aggregate — appending would double-count). Guards
    * are PER TABLE, so a retry after a crash between the appends
    * completes exactly the missing tables (same idempotence contract as
    * [[appendToBandIndex]]). Meta is unchanged; the sketch saturates past
    * `expectedItems` total inserts (fpp degrades, correctness doesn't —
    * positives always verify); rewrite with [[writeVecIndex]] when the
    * corpus outgrows it.
    */
  def appendToVecIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newVecs: DataFrame, idCol: String, vecCol: String,
      autoCompactAt: Int = AutoCompactDefault): Unit = {
    val idx = readVecIndex(spark, path)
    val planes = Similarity.hyperplanes(idx.numPlanes, idx.dim, idx.seed)
    // all fresh sets are pinned BEFORE any write rewrites the dirs they read
    val freshVecRows = newVecs
      .select(col(idCol).as("corpus_id"), col(vecCol).as("__cvec"),
        Similarity.bucketId(col(vecCol), planes).as("__bucket"))
      .join(idx.vecs.select(col("corpus_id")), Seq("corpus_id"), "left_anti")
      .localCheckpoint()
    val freshHashes = newVecs
      .select(xxhash64(col(vecCol)).as("__h"), col(idCol).as("__cid"),
        col(vecCol).as("__v"))
      .groupBy(col("__h"))
      .agg(min(col("__cid")).as("__exact_of"), min_by(col("__v"), col("__cid")).as("__rvec"))
      .join(idx.hashes.select(col("__h")), Seq("__h"), "left_anti")
      .localCheckpoint()
    val delta =
      if (freshHashes.isEmpty)
        emptyBloom(spark, idx.expectedItems, idx.fpp)
      else freshHashes.stat.bloomFilter("__h", idx.expectedItems, idx.fpp)
    // sketch BEFORE tables — see [[appendToHashIndex]]: rows-without-keys
    // false-negative forever (the retry anti-join hides them from the
    // delta), keys-without-rows just verify-fail
    idx.bloom.mergeInPlace(delta)
    writeBloomFileAtomic(spark, path, idx.bloom, idx.expectedItems, idx.fpp)
    freshVecRows.write.mode("append").parquet(s"$path/vecs")
    freshHashes.write.mode("append").parquet(s"$path/hashes")
    // buckets: recompute from the appended vector table via staging + swap
    // (cannot overwrite a path feeding the plan being written); same
    // full-table-aggregate-per-append trade as [[appendToBandIndex]] —
    // see the streaming IngestIndex for the high-frequency-append shape
    spark.read.parquet(s"$path/vecs")
      .groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__ccnt"), min(col("corpus_id")).as("__hub"),
        min_by(col("__cvec"), col("corpus_id")).as("__hubvec"))
      .write.mode("overwrite").parquet(s"$path/buckets.staging")
    val (fs, bp) = hadoopFs(spark, s"$path/buckets")
    val staging = new org.apache.hadoop.fs.Path(s"$path/buckets.staging")
    if (fs.exists(bp)) fs.delete(bp, true)
    if (!fs.rename(staging, bp))
      throw new java.io.IOException(s"vec index bucket swap $staging -> $bp failed")
    maybeAutoCompact(spark, path, VecIndexTables, autoCompactAt)
  }

  // — duplication-aware SOFT dedup —————————————————————————————————————————

  /** Per-document duplication weights: near-dup cluster size `k` and
    * sampling weight `round4(1/k)`. Hard dedup (keep-first) discards
    * every non-canonical cluster member — and with them the
    * intra-cluster variation (edits, formatting variants, quote
    * contexts) that still carries signal; the soft alternative keeps
    * EVERY member at `1/k` sampling weight, so each cluster contributes
    * one EXPECTED document while the surviving choice varies across the
    * corpus instead of always electing the min id. The pair stage here
    * is the exact n-gram arm (value-oracled); swap in [[lshCandidates]]
    * for the 100-TB path — the component labeling and weighting
    * downstream are pair-stage-agnostic. Returns
    * (idCol, cluster_size, weight) for every input document
    * (singletons: k = 1, weight 1.0).
    */
  def duplicationWeights(docs: DataFrame, idCol: String, text: Column, n: Int,
      threshold: Double): DataFrame =
    weightsFromPairs(docs, idCol,
      ngramJaccardPairs(docs, idCol, text, n, threshold))

  /** [[duplicationWeights]] with the MINHASH+LSH pair stage — the 100-TB
    * arm (the [[dedupCorpusLsh]] relationship, applied to soft dedup):
    * candidates come from banded signature buckets (hot buckets
    * star-degrade, never drop), every candidate verifies with EXACT
    * Jaccard over full shingle sets, and the component/weight tail is
    * byte-identical to the exact arm — the only semantic difference is
    * pair RECALL (1-(1-j^rowsPerBand)^bands; identical documents always
    * collide, so planted-copy clusters weight identically to the exact
    * arm). One persisted shingle table feeds both the signatures and the
    * verification.
    */
  def duplicationWeightsLsh(docs: DataFrame, idCol: String, text: Column, n: Int,
      numPerm: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(bands * rowsPerBand <= numPerm,
      s"bands*rowsPerBand = ${bands * rowsPerBand} exceeds numPerm = $numPerm")
    val sh = shingleTable(docs, idCol, text, n).persist()
    sh.count() // eager: feeds signatures AND verification
    val sig = minhashFromShingles(sh, numPerm)
    val cand = lshCandidates(sig, "id", bands, rowsPerBand, maxBucket)
    val result = weightsFromPairs(docs, idCol, jaccardFromShingles(sh, cand, threshold))
    sh.unpersist() // the label set is checkpointed — shingles no longer needed
    result
  }

  /** Shared tail of both weight arms: pairs → [[components]] → cluster
    * size → `round4(1/k)` weight, singletons at k = 1 / weight 1.
    */
  private def weightsFromPairs(docs: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val p = pairs.localCheckpoint()
    val labels = components(p)
    val lab = labels.join(
        labels.groupBy(col("comp")).agg(count(lit(1)).as("__k")), Seq("comp"))
      .select(col("id").as(idCol), col("__k"))
      .localCheckpoint() // pin before the pair/label checkpoints go unreferenced
    docs.select(col(idCol))
      .join(lab, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__k"), lit(1L)).as("cluster_size"),
        graft.Canonical.round4(lit(1.0) / coalesce(col("__k"), lit(1L))).as("weight"))
  }

  /** The portable per-document coin of the soft arm: keep iff
    * `slot(id) · k < 10000`, where `slot` is the
    * [[Sampling.mixturePortable]] fingerprint coin — an EXACT integer
    * comparison realizing probability `⌈10000/k⌉/10000 ≈ 1/k` with no
    * per-row rate quantization, replayable in any engine.
    */
  def softDedupKeep(id: Column, clusterSize: Column): Column =
    pmod(pmod(graft.functions.TextFunctions.fingerprint(
      concat(lit("softdedup:"), id.cast("string"))), lit(100000L))
      * lit(2654435761L), lit(10000L)) * clusterSize < lit(10000L)

  /** Soft-dedup sampled corpus: the documents whose coin keeps them —
    * one expected survivor per near-dup cluster, position-uniform rather
    * than min-id-biased. Semi-join on the unskewed id, so a mass-dup
    * cluster's bodies never converge on one reducer.
    */
  def softDedupSample(docs: DataFrame, idCol: String, text: Column, n: Int,
      threshold: Double): DataFrame = {
    val kept = duplicationWeights(docs, idCol, text, n, threshold)
      .filter(softDedupKeep(col(idCol), col("cluster_size")))
      .select(col(idCol))
    docs.join(kept, Seq(idCol), "left_semi")
  }

  // — streaming-maintained ingest index ————————————————————————————————————
  //   The STREAMING twin of the hash/band indexes above, designed for a
  //   sink that must be exactly-once under micro-batch replay. Two deltas
  //   from [[writeHashIndex]]/[[writeBandIndex]]:
  //
  //   1. BATCH PROVENANCE. Every table row lives in a Hive-style
  //      `__ingest=<batchId>` partition owned by the batch that appended
  //      it, so (a) an append is a plain partition OVERWRITE — a replayed
  //      batch rewrites its own partition byte-for-byte, no anti-join
  //      guards needed — and (b) a probe can EXCLUDE the current batch id,
  //      so a replay that crashed after its index append still classifies
  //      against exactly the pre-append corpus and reproduces the original
  //      decision. Without the exclusion, a replayed batch would find its
  //      own first-attempt rows and classify every doc as a duplicate of
  //      itself, emptying the corpus partition it is about to rewrite.
  //   2. NO PERSISTED BUCKET AGGREGATE. [[appendToBandIndex]] recomputes
  //      the bucket table from the FULL band table per append — a
  //      corpus-scale aggregate per micro-batch. Here occupancy and hub
  //      are computed per batch for TOUCHED buckets only, from a band-scan
  //      joined against the broadcast batch key set (map-side-combined, so
  //      the shuffled state is touched-bucket counts — batch-bounded).
  //      The probe thus pays two column scans of the compact band table
  //      (occupancy + candidates) instead of one scan each of buckets and
  //      bands, and the append drops to pure parquet partition writes.
  //
  //   Bloom lifecycle: the sketch accumulates every appended content key
  //   (merge = bitwise OR — replay-idempotent) and is rewritten via
  //   tmp+rename; a crash in the rename window self-heals on the next
  //   read by rebuilding from the hash table (a compact re-read). A
  //   replayed batch's own keys being present is harmless: positives
  //   always verify against the provenance-FILTERED hash table.

  /** A loaded streaming ingest index. Frames are lazy parquet scans
    * carrying the `__ingest` partition column (empty-schema frames before
    * the first append); only the Bloom sketch is driver-held.
    */
  final case class IngestIndex(
      hashes: DataFrame,   // (__h sha256 hex, __exact_of min id, __ingest)
      shingles: DataFrame, // (id, shingle, __ingest)
      bands: DataFrame,    // (corpus_id, band_idx, band_hash, __ingest)
      bloom: org.apache.spark.util.sketch.BloomFilter,
      expectedItems: Long, fpp: Double,
      n: Int, numPerm: Int, numBands: Int, rowsPerBand: Int)

  /** Rewrite `path/bloom.bin` via tmp + rename so a crash mid-write never
    * leaves a truncated sketch: the worst case (crash between delete and
    * rename) leaves the file MISSING, which [[readIngestIndex]] self-heals
    * by rebuilding from the persisted hash table.
    */
  private[graft] def writeBloomFileAtomic(spark: org.apache.spark.sql.SparkSession, dir: String,
      bf: org.apache.spark.util.sketch.BloomFilter, expectedItems: Long, fpp: Double): Unit = {
    writeBloomFile(spark, s"$dir/bloom.bin.tmp", bf, expectedItems, fpp)
    val (fs, dst) = hadoopFs(spark, s"$dir/bloom.bin")
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/bloom.bin.tmp")
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"bloom swap $tmp -> $dst failed")
  }

  /** Create an EMPTY ingest index: sketch + `meta.json` (geometry and
    * sketch params — written LAST, so its presence marks a usable index).
    * Tables materialize on first [[appendToIngestIndex]]; probing the
    * empty index classifies everything `new`, so the first batch needs no
    * special casing.
    */
  def initIngestIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      n: Int, numPerm: Int, numBands: Int, rowsPerBand: Int,
      expectedItems: Long, fpp: Double = 0.01): Unit = {
    require(numBands * rowsPerBand == numPerm,
      s"numBands ($numBands) × rowsPerBand ($rowsPerBand) must equal numPerm ($numPerm)")
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    writeBloomFileAtomic(spark, path,
      emptyBloom(spark, expectedItems, fpp), expectedItems, fpp)
    writeTextFile(spark, s"$path/meta.json",
      s"""{"n":$n,"numPerm":$numPerm,"numBands":$numBands,"rowsPerBand":$rowsPerBand,""" +
        s""""expectedItems":$expectedItems,"fpp":$fpp}""")
  }

  /** Load a streaming ingest index. `idType` supplies the id column type
    * for the empty-frame fallback (before the first append the table
    * directories have no files to infer a schema from). A missing
    * `bloom.bin` (crash inside [[writeBloomFileAtomic]]'s rename window)
    * is rebuilt from the persisted hash table and rewritten — the rebuilt
    * sketch contains at least every key the lost one did, so
    * classification is unaffected.
    */
  def readIngestIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      idType: org.apache.spark.sql.types.DataType): IngestIndex = {
    import org.apache.spark.sql.types._
    // a published-but-unfinished compaction marker means the staged data
    // is complete and some source partitions may still exist — finish it
    // before reading, or the scan would double-count compacted rows
    finishIngestCompaction(spark, path)
    val meta = readTextFile(spark, s"$path/meta.json")
    def numOf(k: String): String =
      s""""$k":\\s*([0-9.eE+-]+)""".r.findFirstMatchIn(meta)
        .getOrElse(throw new IllegalArgumentException(s"ingest index meta missing $k: $meta"))
        .group(1)
    val (n, numPerm) = (numOf("n").toInt, numOf("numPerm").toInt)
    val (numBands, rowsPerBand) = (numOf("numBands").toInt, numOf("rowsPerBand").toInt)
    val expectedItems = numOf("expectedItems").toLong
    val fpp = numOf("fpp").toDouble
    val ing = StructField("__ingest", IntegerType)
    def tbl(sub: String, schema: StructType): DataFrame = {
      val (fs, _) = hadoopFs(spark, path)
      val parts = Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$path/$sub/__ingest=*/part-*")))
      if (parts.exists(_.nonEmpty)) spark.read.parquet(s"$path/$sub")
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val hashes = tbl("hashes", StructType(Seq(
      StructField("__h", StringType), StructField("__exact_of", idType), ing)))
    val shingles = tbl("shingles", StructType(Seq(
      StructField("id", idType), StructField("shingle", StringType), ing)))
    val bands = tbl("bands", StructType(Seq(
      StructField("corpus_id", idType), StructField("band_idx", IntegerType),
      StructField("band_hash", LongType), ing)))
    val (fs, bp) = hadoopFs(spark, s"$path/bloom.bin")
    val bloom =
      if (fs.exists(bp)) {
        val in = fs.open(bp)
        try {
          val dis = new java.io.DataInputStream(in)
          dis.readLong(); dis.readDouble() // creation params: meta is authoritative here
          org.apache.spark.util.sketch.BloomFilter.readFrom(dis)
        } finally in.close()
      } else { // self-heal the rename window: rebuild from the hash table
        val bf =
          if (hashes.isEmpty)
            emptyBloom(spark, expectedItems, fpp)
          else hashes.select(xxhash64(col("__h")).as("__k"))
            .stat.bloomFilter("__k", expectedItems, fpp)
        writeBloomFileAtomic(spark, path, bf, expectedItems, fpp)
        bf
      }
    IngestIndex(hashes, shingles, bands, bloom, expectedItems, fpp,
      n, numPerm, numBands, rowsPerBand)
  }

  /** [[incrementalDedup]] against a streaming [[IngestIndex]], excluding
    * rows appended by ingest `excludeIngest` (pass the CURRENT batch id:
    * on a clean first attempt the partition doesn't exist and the filter
    * is a no-op; on a crash replay it hides the first attempt's own
    * appends, so the replay reproduces the original classification).
    * Classification is identical to the live operator — exact via the
    * Bloom-pruned hash probe, near via band candidates (hot buckets
    * star-degrade to the persisted min-id hub) with exact-Jaccard
    * verification.
    *
    * Per-batch corpus cost: the exact verify join of the Bloom positives,
    * plus two column scans of the compact band table — occupancy for
    * TOUCHED buckets (aggregated map-side; shuffled state is
    * batch-bounded) and candidate generation — plus shingle/size scans
    * restricted to candidate ids. Every corpus-side scan joins against a
    * broadcast batch-bounded frame (evidence-gated: past
    * `batchBroadcastCap` the candidate join merge-hints BOTH sides), so
    * nothing corpus-scale shuffles per batch. Returns the eager cached
    * (idCol, status, dup_of) frame — `unpersist()` it when done.
    */
  def probeIngestIndex(index: IngestIndex, batch: DataFrame, idCol: String,
      textCol: String, threshold: Double, excludeIngest: Long,
      maxBucket: Int = DefaultMaxBucket,
      batchBroadcastCap: Long = BatchBroadcastCap): DataFrame = {
    import index.{n, numPerm, numBands, rowsPerBand}
    val idType = batch.schema(idCol).dataType
    def excl(df: DataFrame): DataFrame =
      df.filter(col("__ingest").cast("long") =!= excludeIngest)
    // 1. exact via the provenance-filtered hash table (Bloom-pruned; a
    //    replayed batch's own keys in the sketch just verify-fail)
    val keyed = batch.select(col(idCol).as("id"),
      sha2(tagged(col(textCol)), 256).as("__h"))
    val exact = classifyExactWithBloom(
      excl(index.hashes).select(col("__h"), col("__exact_of")),
      index.bloom, keyed, idCol, idType)
    val exactStatus = exact
      .select(col(idCol).as("id"),
        when(col("status") === "exact_dup", col("dup_of")).as("__exact_of"))
      .persist()
    exactStatus.count()
    exact.unpersist()

    // 2. near: batch-side shingles + signatures; corpus side from the index
    val survivors = batch.join(
      exactStatus.filter(col("__exact_of").isNotNull).select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
    val shB = shingleTable(survivors, idCol, col(textCol), n).localCheckpoint()
    val bandB = minhashFromShingles(shB, numPerm)
      .select(col("id").as("batch_id"),
        explode(array(bandExprs(numBands, rowsPerBand): _*)).as("band"))
      .select(col("batch_id"), col("band.band_idx"), col("band.band_hash"))
      .localCheckpoint()
    val bandsF = excl(index.bands)
      .select(col("corpus_id"), col("band_idx"), col("band_hash"))
    // occupancy scan: corpus count + min-id hub for touched buckets only
    // (a left join covers batch-only buckets — null __ccnt/__hub)
    val batchCnt = bandB.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__bcnt")).localCheckpoint()
    val corpusOcc = bandsF
      .join(broadcast(batchCnt.select(col("band_idx"), col("band_hash"))),
        Seq("band_idx", "band_hash"))
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__ccnt"), min(col("corpus_id")).as("__hub"))
    val hot = batchCnt.join(corpusOcc, Seq("band_idx", "band_hash"), "left")
      .filter(coalesce(col("__ccnt"), lit(0L)) + col("__bcnt") > maxBucket)
      .select(col("band_idx"), col("band_hash"), col("__hub"))
      .localCheckpoint()
    val hotKeys = hot.select(col("band_idx"), col("band_hash"))
    // candidate scan: cold batch bands against the filtered corpus bands
    val coldB = bandB.join(hotKeys, Seq("band_idx", "band_hash"), "left_anti")
    val coldCands =
      (if (bandB.count() <= batchBroadcastCap)
        bandsF.join(broadcast(coldB), Seq("band_idx", "band_hash"))
      else bandsF.hint("merge").join(coldB.hint("merge"), Seq("band_idx", "band_hash")))
        .select(col("batch_id").as("id_a"), col("corpus_id").as("id_b"))
    // star: hot-bucket batch members vs the hub (null hub = batch-only)
    val starCands = bandB.join(hotKeys, Seq("band_idx", "band_hash"), "left_semi")
      .join(broadcast(hot.filter(col("__hub").isNotNull)), Seq("band_idx", "band_hash"))
      .select(col("batch_id").as("id_a"), col("__hub").as("id_b"))
    val cands = coldCands.unionByName(starCands).distinct().localCheckpoint()

    // 3. exact-Jaccard verify: corpus shingles/sizes restricted to the
    //    candidate corpus docs
    val candB = cands.select(col("id_b").as("id")).distinct()
    // the candidate semi-join keeps each candidate doc's FULL shingle set,
    // so set sizes derive from this scan — no separate sizes table (one
    // fewer write per append, one fewer scan per probe); pinned because
    // it feeds both the union and the size aggregate
    val shC = excl(index.shingles).select(col("id"), col("shingle"))
      .join(broadcast(candB), Seq("id"), "left_semi")
      .localCheckpoint()
    val sizesC = shC.groupBy(col("id")).agg(count(lit(1)).as("set_size"))
    val shAll = shB.unionByName(shC)
    val sizesAll = shB.groupBy(col("id")).agg(count(lit(1)).as("set_size"))
      .unionByName(sizesC)
    val nearOf = ngramJaccardForPairs(shAll, sizesAll, cands, threshold)
      .groupBy(col("id_a").as("id"))
      .agg(min(col("id_b")).as("__near_of"))

    val result = exactStatus
      .join(nearOf, Seq("id"), "left")
      .select(col("id").as(idCol),
        when(col("__exact_of").isNotNull, "exact_dup")
          .when(col("__near_of").isNotNull, "near_dup")
          .otherwise("new").as("status"),
        coalesce(col("__exact_of"), col("__near_of")).as("dup_of"))
      .persist()
    result.count()
    exactStatus.unpersist()
    result
  }

  /** Compact the ingest index's per-batch partitions into the reserved
    * base partition `__ingest=-1`. Appends accumulate one partition per
    * micro-batch; after months of daily batches the index is a
    * small-file swamp and file listing itself dominates the probe. The
    * reserved id is negative because stream batch ids are non-negative:
    * no probe's own-batch exclusion can ever hide the base partition,
    * and no future append can collide with it.
    *
    * Run while no stream is writing the index (between restarts, or
    * from a maintenance window). Crash-safe in two stages:
    *
    *   1. [[stageIngestCompaction]] — rewrite every table (ALL current
    *      partitions, base included) into invisible `<table>.staging`
    *      dirs (readers only see `__ingest=*`), then publish the
    *      `_compacting.json` marker (tmp+rename, so it is never
    *      partial) listing the source partition ids;
    *   2. [[finishIngestCompaction]] — delete the listed source
    *      partitions, rename each staging dir to `__ingest=-1`, remove
    *      the marker.
    *
    * A crash before the marker leaves only invisible staging dirs (the
    * next compaction overwrites them); a crash after the marker is
    * completed by [[finishIngestCompaction]], which [[readIngestIndex]]
    * runs automatically when it sees the marker — so a stream restart
    * after a mid-compaction crash self-heals instead of reading
    * duplicated (source + compacted) rows, which would fan out the
    * exact verify join and inflate every Jaccard intersection.
    */
  /** `keepIngest`: leave that batch's partitions OUT of the fold — the
    * in-stream compaction contract. A sink compacting inside its own
    * micro-batch must not fold the CURRENT batch: the exactly-once replay
    * story hides a replayed batch's first-attempt rows by excluding its
    * `__ingest=<id>` partition, and a fold would move those rows into the
    * base partition where the exclusion cannot see them.
    */
  def compactIngestIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      keepIngest: Option[Long] = None): Unit = {
    stageIngestCompaction(spark, path, keepIngest)
    finishIngestCompaction(spark, path)
  }

  private val IngestTables = Seq("hashes", "shingles", "bands")

  /** Stage 1 of [[compactIngestIndex]]: staging dirs + marker. Exposed
    * `private[graft]` so the crash drill can stop exactly here. `tables`
    * parameterizes the protocol over any `__ingest`-partitioned table set
    * (the text index's hashes/shingles/bands, the vec index's
    * hashes/vecs); [[finishIngestCompaction]] needs no matching list — it
    * reads the table names back from the marker itself.
    */
  private[graft] def stageIngestCompaction(spark: org.apache.spark.sql.SparkSession,
      path: String, keepIngest: Option[Long] = None,
      tables: Seq[String] = IngestTables): Unit = {
    val (fs, _) = hadoopFs(spark, path)
    // Complete any compaction a prior run crashed AFTER publishing its
    // marker, BEFORE sweeping staging dirs: the marker lists source
    // partitions whose data may by now live only in staging, so sweeping
    // first and then crashing pre-republish would let a later self-heal
    // delete those sources with nothing to rename over them — data loss.
    // finishIngestCompaction is idempotent and a no-op without a marker.
    finishIngestCompaction(spark, path)
    // Clear EVERY table's staging dir up front — including tables whose
    // sources turn out empty this run. A compaction that crashed before its
    // marker leaves orphan staging dirs; without this sweep, a later run
    // that stages only some tables would let finishIngestCompaction publish
    // the stale orphans over live base partitions.
    tables.foreach { tbl =>
      val stale = new org.apache.hadoop.fs.Path(s"$path/$tbl.staging")
      if (fs.exists(stale)) fs.delete(stale, true)
    }
    val kept = keepIngest.map(id => s"__ingest=$id")
    // source partitions per table, recorded BEFORE writing staging so the
    // marker can only ever name dirs the staged data actually contains
    val sources: Map[String, Seq[String]] = tables.map { tbl =>
      val dirs = Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$path/$tbl/__ingest=*")))
        .map(_.toSeq).getOrElse(Seq.empty)
        .filter(_.isDirectory).map(_.getPath.getName)
        .filterNot(kept.contains).sorted
      tbl -> dirs
    }.toMap
    if (sources.values.forall(_.isEmpty)) return // nothing to compact
    tables.foreach { tbl =>
      if (sources(tbl).nonEmpty)
        // read ONLY the source partitions (the kept batch stays out)
        spark.read.option("basePath", s"$path/$tbl")
          .parquet(sources(tbl).map(d => s"$path/$tbl/$d"): _*)
          .drop("__ingest")
          .write.mode("overwrite").parquet(s"$path/$tbl.staging")
    }
    val marker = sources.map { case (tbl, dirs) =>
      s""""$tbl":[${dirs.map(d => s""""$d"""").mkString(",")}]"""
    }.mkString("{", ",", "}")
    writeTextFile(spark, s"$path/_compacting.json.tmp", marker)
    val dst = new org.apache.hadoop.fs.Path(s"$path/_compacting.json")
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(new org.apache.hadoop.fs.Path(s"$path/_compacting.json.tmp"), dst))
      throw new java.io.IOException(s"compaction marker publish failed at $dst")
  }

  /** Stage 2 of [[compactIngestIndex]] and the self-heal
    * [[readIngestIndex]] runs when the marker is present. Idempotent:
    * every step skips what a previous attempt already did.
    */
  private[graft] def finishIngestCompaction(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val (fs, markerP) = hadoopFs(spark, s"$path/_compacting.json")
    if (!fs.exists(markerP)) return
    val marker = readTextFile(spark, s"$path/_compacting.json")
    // the marker is self-describing: iterate ITS table keys, so one finish
    // implementation serves every __ingest-partitioned index layout
    val tables = """\"([A-Za-z0-9_]+)\":\[""".r.findAllMatchIn(marker).map(_.group(1)).toSeq
    tables.foreach { tbl =>
      val dirs = s""""$tbl":\\[([^\\]]*)\\]""".r.findFirstMatchIn(marker)
        .map(_.group(1)).getOrElse("")
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
      dirs.foreach { d =>
        val p = new org.apache.hadoop.fs.Path(s"$path/$tbl/$d")
        if (fs.exists(p)) fs.delete(p, true)
      }
      val staging = new org.apache.hadoop.fs.Path(s"$path/$tbl.staging")
      val target = new org.apache.hadoop.fs.Path(s"$path/$tbl/__ingest=-1")
      if (fs.exists(staging)) {
        if (fs.exists(target)) fs.delete(target, true) // old base was a listed source
        fs.mkdirs(target.getParent)
        if (!fs.rename(staging, target))
          throw new java.io.IOException(s"compaction publish $staging -> $target failed")
      }
    }
    fs.delete(markerP, false)
  }

  /** Fold a batch's accepted documents into the ingest index under their
    * batch's own `__ingest=<ingestId>` partitions, mode OVERWRITE — the
    * idempotence story in one move: a replayed or crash-retried batch
    * rewrites exactly its own partitions (any subset of the tables a
    * previous attempt managed to write is simply replaced), and no other
    * batch's rows are readable from them. The caller must append only
    * PROBE SURVIVORS (`status = new`), which keeps content hashes unique
    * across partitions — the invariant the exact verify join's fan-out
    * relies on. Pure parquet partition writes: no corpus-scale aggregate
    * per append (contrast [[appendToBandIndex]]'s bucket recompute).
    *
    * Sketch update: for a batch within `deltaCollectCap` distinct hashes
    * the keys are collected (batch-bounded — the same evidence the probe
    * uses to broadcast the batch side) and inserted driver-side, which
    * costs one tiny job; past the cap it degrades to a distributed
    * `stat.bloomFilter` delta + `mergeInPlace` (bitwise OR). Both arms
    * are replay-idempotent, and the rewrite is crash-safe via
    * [[writeBloomFileAtomic]]. `index` may pass the already-loaded
    * [[IngestIndex]] (the sink loads it for the probe) to skip a
    * redundant meta+sketch read.
    */
  def appendToIngestIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String, ingestId: Long,
      index: Option[IngestIndex] = None,
      deltaCollectCap: Long = BatchBroadcastCap): Unit = {
    require(ingestId >= 0,
      s"ingestId must be non-negative (got $ingestId): negative ids are reserved " +
        "for compaction base partitions")
    val idx = index.getOrElse(readIngestIndex(spark, path, newDocs.schema(idCol).dataType))
    val docs = newDocs.select(col(idCol), col(textCol)).localCheckpoint()
    val hashRows = docs
      .select(sha2(tagged(col(textCol)), 256).as("__h"), col(idCol).as("__cid"))
      .groupBy(col("__h")).agg(min(col("__cid")).as("__exact_of"))
      .localCheckpoint()
    val nHashes = hashRows.count()
    hashRows.write.mode("overwrite").parquet(s"$path/hashes/__ingest=$ingestId")
    // one shingle table feeds shingles AND bands (set sizes derive from
    // the shingle scan at probe time — no sizes table)
    val sh = shingleTable(docs, idCol, col(textCol), idx.n).localCheckpoint()
    sh.write.mode("overwrite").parquet(s"$path/shingles/__ingest=$ingestId")
    minhashFromShingles(sh, idx.numPerm)
      .select(col("id").as("corpus_id"),
        explode(array(bandExprs(idx.numBands, idx.rowsPerBand): _*)).as("band"))
      .select(col("corpus_id"), col("band.band_idx"), col("band.band_hash"))
      .write.mode("overwrite").parquet(s"$path/bands/__ingest=$ingestId")
    if (nHashes > 0 && nHashes <= deltaCollectCap) {
      hashRows.select(xxhash64(col("__h")).as("__k")).collect()
        .foreach(r => idx.bloom.putLong(r.getLong(0)))
    } else if (nHashes > 0) {
      idx.bloom.mergeInPlace(
        hashRows.select(xxhash64(col("__h")).as("__k"))
          .stat.bloomFilter("__k", idx.expectedItems, idx.fpp))
    }
    writeBloomFileAtomic(spark, path, idx.bloom, idx.expectedItems, idx.fpp)
  }

  // — batch-index COMPACTION (small-file maintenance for the append
  //   deltas) ———————————————————————————————————————————————————————————
  //   appendToHashIndex / appendToBandIndex / appendToVecIndex /
  //   appendToParagraphIndex each land `mode("append")` parquet parts in
  //   flat table dirs: months of daily appends reproduce the small-file
  //   swamp the streaming IngestIndex already solved for its partitioned
  //   layout. This is the flat-dir twin of that marker protocol — each
  //   table dir is rewritten into few files via invisible `.staging`
  //   dirs, a self-describing `_compacting_batch.json` marker gates the
  //   swap, and every index reader completes an interrupted swap before
  //   scanning. Run while nothing is appending (a maintenance window) —
  //   the same single-writer assumption as [[compactIngestIndex]].

  /** Compact a batch-maintained index's table dirs into `targetFiles`
    * parquet parts each. Crash-safe in two stages: stage (read each
    * table, rewrite into `<table>.staging`, publish the marker via
    * tmp+rename) and finish (swap each staged dir over its table, remove
    * the marker). A crash before the marker leaves only invisible staging
    * dirs (swept by the next run); a crash after it is completed by
    * [[finishBatchCompaction]], which every `read*Index` runs first.
    * `bloom.bin` / `meta.json` / `buckets` (already whole-dir swapped per
    * append) are untouched. Row content is byte-identical — only the
    * file layout changes — so probe classification cannot shift.
    */
  def compactBatchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      tables: Seq[String], targetFiles: Int = 1): Unit = {
    stageBatchCompaction(spark, path, tables, targetFiles)
    finishBatchCompaction(spark, path)
  }

  /** Table sets for the convenience wrappers below. */
  private val HashIndexTables = Seq("hashes")
  private val ParagraphIndexTables = Seq("paras")
  private val BandIndexTables = Seq("shingles", "sizes", "bands")
  private val VecIndexTables = Seq("vecs", "hashes")

  /** Default append-count trigger for [[maybeAutoCompact]]: every batch
    * append adds ~one shuffle's worth of part files, so the threshold is
    * in FILES, not appends — 256 keeps a busy daily-ingest index from
    * degrading into a many-thousand-file scan swamp while folding rarely
    * enough that the fold cost (one table rewrite) stays amortized.
    * Pass `autoCompactAt = 0` on any append to disable.
    */
  val AutoCompactDefault = 256

  /** Append-side auto-compaction policy (r11 verdict task #6: deltas
    * accumulated until someone remembered to call `compact*Index`). After
    * a successful append, if any of the index's table dirs has reached
    * `at` part files, fold the layout via [[compactBatchIndex]] — the
    * staging+marker protocol already makes an in-append fold crash-safe
    * (a crash mid-fold is finished by the next reader). Target file count
    * is sized from the largest table's bytes against
    * `spark.sql.files.maxPartitionBytes`, so a compacted 100-TB-scale
    * index folds to scan-parallel files, not to one giant part.
    */
  private[graft] def maybeAutoCompact(spark: org.apache.spark.sql.SparkSession,
      path: String, tables: Seq[String], at: Int): Unit = {
    if (at <= 0) return
    val (fs, _) = hadoopFs(spark, path)
    def parts(tbl: String): Array[org.apache.hadoop.fs.FileStatus] = {
      val p = new org.apache.hadoop.fs.Path(s"$path/$tbl")
      if (!fs.exists(p)) Array.empty
      else fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    }
    val all = tables.map(parts)
    val maxFiles = all.map(_.length).max
    if (maxFiles >= at) {
      val maxPartBytes = spark.sessionState.conf.filesMaxPartitionBytes
      val maxTableBytes = all.map(_.map(_.getLen).sum).max
      val target = math.max(1L, (maxTableBytes + maxPartBytes - 1) / maxPartBytes).toInt
      System.err.println(
        s"""{"index_auto_compact":${"\"" + path + "\""},"part_files":$maxFiles,"trigger":$at,"target_files":$target}""")
      compactBatchIndex(spark, path, tables, target)
    }
  }

  /** [[compactBatchIndex]] over [[writeHashIndex]]'s layout. */
  def compactHashIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFiles: Int = 1): Unit =
    compactBatchIndex(spark, path, HashIndexTables, targetFiles)

  /** [[compactBatchIndex]] over [[writeParagraphIndex]]'s layout. */
  def compactParagraphIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFiles: Int = 1): Unit =
    compactBatchIndex(spark, path, ParagraphIndexTables, targetFiles)

  /** [[compactBatchIndex]] over [[writeBandIndex]]'s layout (`buckets` is
    * excluded: each append already rewrites it whole via staging+swap).
    */
  def compactBandIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFiles: Int = 1): Unit =
    compactBatchIndex(spark, path, BandIndexTables, targetFiles)

  /** [[compactBatchIndex]] over [[writeVecIndex]]'s layout (`buckets`
    * excluded, same reason as the band index). */
  def compactVecIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFiles: Int = 1): Unit =
    compactBatchIndex(spark, path, VecIndexTables, targetFiles)

  private val BatchMarker = "_compacting_batch.json"

  /** Stage 1 of [[compactBatchIndex]]: staging dirs + marker. Exposed
    * `private[graft]` so the crash drills can stop exactly here.
    */
  private[graft] def stageBatchCompaction(spark: org.apache.spark.sql.SparkSession,
      path: String, tables: Seq[String], targetFiles: Int): Unit = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    val (fs, _) = hadoopFs(spark, path)
    // complete a prior run's published-but-unfinished swap BEFORE sweeping
    // staging: after the marker, staging may hold the only complete copy
    // of a table (its dir is deleted first in the swap) — sweeping it
    // while the marker still lists the table would lose the data
    finishBatchCompaction(spark, path)
    tables.foreach { tbl =>
      val stale = new org.apache.hadoop.fs.Path(s"$path/$tbl.staging")
      if (fs.exists(stale)) fs.delete(stale, true)
    }
    val staged = tables.filter(tbl =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$path/$tbl")))
    if (staged.isEmpty) return // nothing to compact
    staged.foreach { tbl =>
      spark.read.parquet(s"$path/$tbl").coalesce(targetFiles)
        .write.mode("overwrite").parquet(s"$path/$tbl.staging")
    }
    // self-describing marker (same key shape as the ingest protocol's, a
    // distinct file name because the finish semantics differ: whole-dir
    // swap here, partition fold there)
    publishBatchMarker(spark, path, staged)
  }

  /** Publish the batch-swap marker for `tables` (tmp + rename — the point
    * of no return: after this, `<tbl>.staging` dirs are COMMITTED and
    * [[finishBatchCompaction]] will swap them over their tables). Shared
    * by table compaction and by any maintenance op that rewrites whole
    * tables behind the same crash protocol (e.g. [[Ivf.rebalanceIndex]]).
    */
  private[graft] def publishBatchMarker(spark: org.apache.spark.sql.SparkSession,
      path: String, tables: Seq[String]): Unit = {
    val (fs, _) = hadoopFs(spark, path)
    val marker = tables.map(tbl => s""""$tbl":[]""").mkString("{", ",", "}")
    writeTextFile(spark, s"$path/$BatchMarker.tmp", marker)
    val dst = new org.apache.hadoop.fs.Path(s"$path/$BatchMarker")
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(new org.apache.hadoop.fs.Path(s"$path/$BatchMarker.tmp"), dst))
      throw new java.io.IOException(s"batch compaction marker publish failed at $dst")
  }

  /** Stage 2 of [[compactBatchIndex]] and the self-heal every
    * `read*Index` runs first. Idempotent: a table whose staging dir is
    * already gone was swapped by a previous attempt.
    */
  private[graft] def finishBatchCompaction(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val (fs, markerP) = hadoopFs(spark, s"$path/$BatchMarker")
    if (!fs.exists(markerP)) return
    val marker = readTextFile(spark, s"$path/$BatchMarker")
    val tables = """"([A-Za-z0-9_]+)":\[""".r.findAllMatchIn(marker).map(_.group(1)).toSeq
    tables.foreach { tbl =>
      val staging = new org.apache.hadoop.fs.Path(s"$path/$tbl.staging")
      val target = new org.apache.hadoop.fs.Path(s"$path/$tbl")
      if (fs.exists(staging)) {
        if (fs.exists(target)) fs.delete(target, true)
        if (!fs.rename(staging, target))
          throw new java.io.IOException(s"batch compaction swap $staging -> $target failed")
      }
    }
    fs.delete(markerP, false)
  }

  // — streaming VEC ingest index (the EMBEDDING arm of the IngestIndex) ————
  //   [[curatedCorpusIndexedSink]]-shaped streams that carry an embedding
  //   column need the same exactly-once discipline for SEMANTIC dedup
  //   state: batch-owned `__ingest=<id>` partitions written with
  //   OVERWRITE, probe-side exclusion of the current batch id (a crash
  //   replay must not find its own first-attempt appends), a bitwise-OR
  //   Bloom sketch, and the same marker-protocol compaction. The batch
  //   probe mirrors [[incrementalSemanticIndexed]]'s classification
  //   (exact via content-hash + rep-vector verify, near via sign-bucket
  //   candidates + exact-cosine verify) but derives touched-bucket
  //   occupancy per batch from the vector table — appends stay pure
  //   partition writes, no corpus-scale bucket aggregate per append
  //   (contrast [[appendToVecIndex]]'s full-table recompute).

  /** A loaded streaming vec ingest index. Both frames are lazy parquet
    * scans carrying their `__ingest` provenance; the sketch is over the
    * raw `xxhash64` content keys.
    */
  final case class VecIngestIndex(
      hashes: DataFrame, // (__h xxhash64(vec), __exact_of min id, __rvec rep vector, __ingest)
      vecs: DataFrame,   // (corpus_id, __cvec, __bucket, __ingest)
      bloom: org.apache.spark.util.sketch.BloomFilter,
      expectedItems: Long, fpp: Double,
      numPlanes: Int, dim: Int, seed: Long)

  private val VecIngestTables = Seq("hashes", "vecs")

  /** Create an EMPTY vec ingest index: sketch + `meta.json` (hyperplane
    * geometry + sketch params — written LAST, so its presence marks a
    * usable index). Tables materialize on first
    * [[appendToVecIngestIndex]]; probing the empty index classifies
    * everything `new`.
    */
  def initVecIngestIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      numPlanes: Int, dim: Int, expectedItems: Long, fpp: Double = 0.01,
      seed: Long = 42L): Unit = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    writeBloomFileAtomic(spark, path,
      emptyBloom(spark, expectedItems, fpp), expectedItems, fpp)
    writeTextFile(spark, s"$path/meta.json",
      s"""{"numPlanes":$numPlanes,"dim":$dim,"seed":$seed,""" +
        s""""expectedItems":$expectedItems,"fpp":$fpp}""")
  }

  /** Load a streaming vec ingest index. `idType` supplies the id type for
    * the pre-first-append empty-frame fallback. A published-but-unfinished
    * compaction marker is completed first (same self-heal as
    * [[readIngestIndex]]); a missing `bloom.bin` rebuilds from the hash
    * table.
    */
  def readVecIngestIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      idType: org.apache.spark.sql.types.DataType,
      vecType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
      : VecIngestIndex = {
    import org.apache.spark.sql.types._
    finishIngestCompaction(spark, path)
    val meta = readTextFile(spark, s"$path/meta.json")
    def numOf(k: String): String =
      s""""$k":\\s*([0-9.eE+-]+)""".r.findFirstMatchIn(meta)
        .getOrElse(throw new IllegalArgumentException(s"vec ingest index meta missing $k: $meta"))
        .group(1)
    val (numPlanes, dim) = (numOf("numPlanes").toInt, numOf("dim").toInt)
    val seed = numOf("seed").toLong
    val expectedItems = numOf("expectedItems").toLong
    val fpp = numOf("fpp").toDouble
    val ing = StructField("__ingest", IntegerType)
    def tbl(sub: String, schema: StructType): DataFrame = {
      val (fs, _) = hadoopFs(spark, path)
      val parts = Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$path/$sub/__ingest=*/part-*")))
      if (parts.exists(_.nonEmpty)) spark.read.parquet(s"$path/$sub")
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val hashes = tbl("hashes", StructType(Seq(
      StructField("__h", LongType), StructField("__exact_of", idType),
      StructField("__rvec", vecType), ing)))
    val vecs = tbl("vecs", StructType(Seq(
      StructField("corpus_id", idType), StructField("__cvec", vecType),
      StructField("__bucket", LongType), ing)))
    val (fs, bp) = hadoopFs(spark, s"$path/bloom.bin")
    val bloom =
      if (fs.exists(bp)) {
        val in = fs.open(bp)
        try {
          val dis = new java.io.DataInputStream(in)
          dis.readLong(); dis.readDouble() // creation params: meta is authoritative
          org.apache.spark.util.sketch.BloomFilter.readFrom(dis)
        } finally in.close()
      } else { // self-heal the rename window: rebuild from the hash table
        val bf =
          if (hashes.isEmpty) emptyBloom(spark, expectedItems, fpp)
          else hashes.stat.bloomFilter("__h", expectedItems, fpp)
        writeBloomFileAtomic(spark, path, bf, expectedItems, fpp)
        bf
      }
    VecIngestIndex(hashes, vecs, bloom, expectedItems, fpp, numPlanes, dim, seed)
  }

  /** [[incrementalSemanticIndexed]] against a streaming [[VecIngestIndex]],
    * excluding rows appended by ingest `excludeIngest` (pass the CURRENT
    * batch id — the replay contract of [[probeIngestIndex]]). Exact via
    * the Bloom-pruned content-hash probe verified by rep-vector equality;
    * near via sign-bucket candidates with exact-cosine verification, hot
    * buckets star-degrading to the bucket's min-id corpus hub.
    *
    * Per-batch corpus cost: the exact verify join of the Bloom positives,
    * plus two column scans of the compact vector table — occupancy +
    * hub/hub-vector for TOUCHED buckets only (aggregated map-side;
    * shuffled state is batch-bounded) and candidate generation — each
    * joined against a broadcast batch-bounded frame (byte-aware license:
    * the row cap shrinks with `dim`; past it BOTH sides merge-hint).
    * Returns the eager cached (idCol, status, dup_of) frame —
    * `unpersist()` when done.
    */
  def probeVecIngestIndex(index: VecIngestIndex, batch: DataFrame, idCol: String,
      vecCol: String, threshold: Double, excludeIngest: Long,
      maxBucket: Int = DefaultMaxBucket,
      batchBroadcastCap: Long = BatchBroadcastCap): DataFrame = {
    val planes = Similarity.hyperplanes(index.numPlanes, index.dim, index.seed)
    val idType = batch.schema(idCol).dataType
    def excl(df: DataFrame): DataFrame =
      df.filter(col("__ingest").cast("long") =!= excludeIngest)
    val keyedB = batch.select(col(idCol).as("id"), col(vecCol).as("__bvec"),
      xxhash64(col(vecCol)).as("__h"))
    // 1. exact: Bloom prune, then rep-vector verify against the
    //    provenance-filtered hash table (a replayed batch's own keys in
    //    the sketch just verify against zero visible rows)
    val hashesF = excl(index.hashes).select(col("__h"), col("__exact_of"), col("__rvec"))
    val positive = keyedB
      .filter(graft.functions.BloomFunctions.mightContain(col("__h"), index.bloom))
      .join(hashesF, Seq("__h"), "left")
      .select(col("id"), col("__bvec"),
        when(col("__exact_of").isNotNull && col("__bvec") === col("__rvec"),
          col("__exact_of")).as("__exact_of"))
    val negative = keyedB
      .filter(!graft.functions.BloomFunctions.mightContain(col("__h"), index.bloom))
      .select(col("id"), col("__bvec"), lit(null).cast(idType).as("__exact_of"))
    val exactStatus = positive.unionByName(negative).persist()
    exactStatus.count()

    // 2. near: batch-side bucketing; corpus occupancy derived for TOUCHED
    //    buckets only from the provenance-filtered vector table
    val bB = exactStatus.filter(col("__exact_of").isNull)
      .select(col("id").as("batch_id"), col("__bvec"),
        Similarity.bucketId(col("__bvec"), planes).as("__bucket"))
      .localCheckpoint()
    val vecsF = excl(index.vecs).select(col("corpus_id"), col("__cvec"), col("__bucket"))
    val batchCnt = bB.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__bcnt")).localCheckpoint()
    val corpusOcc = vecsF
      .join(broadcast(batchCnt.select(col("__bucket"))), Seq("__bucket"))
      .groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__ccnt"), min(col("corpus_id")).as("__hub"),
        min_by(col("__cvec"), col("corpus_id")).as("__hubvec"))
    val hot = batchCnt.join(corpusOcc, Seq("__bucket"), "left")
      .filter(coalesce(col("__ccnt"), lit(0L)) + col("__bcnt") > maxBucket)
      .select(col("__bucket"), col("__hub"), col("__hubvec"))
      .localCheckpoint()
    val hotKeys = hot.select(col("__bucket"))
    val vecCap = math.min(batchBroadcastCap, Similarity.vecBroadcastRows(index.dim))
    val coldB = bB.join(hotKeys, Seq("__bucket"), "left_anti")
    val cold =
      if (bB.count() <= vecCap) vecsF.join(broadcast(coldB), Seq("__bucket"))
      else vecsF.hint("merge").join(coldB.hint("merge"), Seq("__bucket"))
    // star: hot-bucket batch members vs the hub (null hub = batch-only)
    val star = bB.join(hotKeys, Seq("__bucket"), "left_semi")
      .join(broadcast(hot.filter(col("__hub").isNotNull)), Seq("__bucket"))
      .select(col("batch_id"), col("__bvec"),
        col("__hub").as("corpus_id"), col("__hubvec").as("__cvec"))
    val pairCols = Seq(col("batch_id"), col("__bvec"), col("corpus_id"), col("__cvec"))
    val nearOf = cold.select(pairCols: _*).unionByName(star.select(pairCols: _*))
      .withColumn("__cos", round(Similarity.cosine(col("__bvec"), col("__cvec")), 6))
      .filter(col("__cos") >= threshold)
      .groupBy(col("batch_id").as("id"))
      .agg(min(col("corpus_id")).as("__near_of"))

    val result = exactStatus
      .join(nearOf, Seq("id"), "left")
      .select(col("id").as(idCol),
        when(col("__exact_of").isNotNull, "exact_dup")
          .when(col("__near_of").isNotNull, "near_dup")
          .otherwise("new").as("status"),
        coalesce(col("__exact_of"), col("__near_of")).as("dup_of"))
      .persist()
    result.count()
    exactStatus.unpersist()
    result
  }

  /** Fold a batch's accepted vectors into the vec ingest index under their
    * batch's own `__ingest=<ingestId>` partitions, mode OVERWRITE — the
    * [[appendToIngestIndex]] idempotence story verbatim: a replay rewrites
    * exactly its own partitions. The caller must append only PROBE
    * SURVIVORS (`status = new`), which keeps content hashes unique across
    * partitions. Pure partition writes: no corpus-scale bucket aggregate
    * per append (the probe derives touched-bucket occupancy instead).
    */
  def appendToVecIngestIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, idCol: String, vecCol: String, ingestId: Long,
      index: Option[VecIngestIndex] = None,
      deltaCollectCap: Long = BatchBroadcastCap): Unit = {
    require(ingestId >= 0,
      s"ingestId must be non-negative (got $ingestId): negative ids are reserved " +
        "for compaction base partitions")
    val idx = index.getOrElse(
      readVecIngestIndex(spark, path, newDocs.schema(idCol).dataType,
        newDocs.schema(vecCol).dataType))
    val planes = Similarity.hyperplanes(idx.numPlanes, idx.dim, idx.seed)
    val docs = newDocs.select(col(idCol), col(vecCol)).localCheckpoint()
    val hashRows = docs
      .select(xxhash64(col(vecCol)).as("__h"), col(idCol).as("__cid"),
        col(vecCol).as("__v"))
      .groupBy(col("__h"))
      .agg(min(col("__cid")).as("__exact_of"), min_by(col("__v"), col("__cid")).as("__rvec"))
      .localCheckpoint()
    val nHashes = hashRows.count()
    hashRows.write.mode("overwrite").parquet(s"$path/hashes/__ingest=$ingestId")
    docs.select(col(idCol).as("corpus_id"), col(vecCol).as("__cvec"),
        Similarity.bucketId(col(vecCol), planes).as("__bucket"))
      .write.mode("overwrite").parquet(s"$path/vecs/__ingest=$ingestId")
    if (nHashes > 0 && nHashes <= deltaCollectCap) {
      hashRows.select(col("__h")).collect().foreach(r => idx.bloom.putLong(r.getLong(0)))
    } else if (nHashes > 0) {
      idx.bloom.mergeInPlace(
        hashRows.stat.bloomFilter("__h", idx.expectedItems, idx.fpp))
    }
    writeBloomFileAtomic(spark, path, idx.bloom, idx.expectedItems, idx.fpp)
  }

  /** [[compactIngestIndex]] for the vec ingest index: fold per-batch
    * partitions into the reserved `__ingest=-1` base via the same two-
    * stage marker protocol (the marker is self-describing, so the shared
    * [[finishIngestCompaction]] — and [[readVecIngestIndex]]'s automatic
    * self-heal — complete it regardless of table layout).
    */
  def compactVecIngestIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      keepIngest: Option[Long] = None): Unit = {
    stageIngestCompaction(spark, path, keepIngest, tables = VecIngestTables)
    finishIngestCompaction(spark, path)
  }

  /** 63-bit SimHash per id (bit 63 unused to stay in positive Long range
    * under ANSI overflow checks): per-token `xxhash64`, ±1 vote per bit,
    * sign of the vote sum sets the bit — one pass through the custom
    * [[graft.functions.SimHashAgg]] kernel.
    */
  def simhash(df: DataFrame, idCol: String, text: Column): DataFrame =
    df.select(col(idCol), explode(graft.functions.TextFunctions.wsTokens(text)).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
      .groupBy(col(idCol))
      .agg(graft.functions.HashAggFunctions.simhash_agg(col("h")).as("simhash"))

  /** SimHash near-dup candidate pairs within Hamming distance `maxDist`:
    * split the 63-bit signature into `maxDist+1` chunks — any pair within
    * the distance must agree on at least one chunk (pigeonhole), so a
    * bucket-join per chunk finds all of them; verify with
    * `bit_count(a XOR b)`.
    *
    * Hot chunk buckets (> maxBucket members) degrade to star candidates
    * against the bucket's min-id hub (same rationale and residual risk as
    * [[lshCandidates]] — an oversized chunk bucket is usually a true
    * mass-dup cluster, and every emitted pair is still Hamming-verified).
    * Cache lifecycle: localCheckpoint, not persist (see [[lshCandidates]]).
    */
  /** Chunk geometry SHARED by the live pair op and the persisted
    * [[SimhashIndex]] (one definition, so the two paths cannot silently
    * disagree on slice boundaries): `maxDist+1` unsigned bit-slices of
    * the 63-bit signature — pigeonhole guarantees any pair within
    * `maxDist` agrees on at least one slice.
    */
  private[graft] def simhashChunkCols(sigCol: Column, maxDist: Int): Seq[Column] = {
    val chunks = maxDist + 1
    val width = 63 / chunks + 1
    (0 until chunks).map { c =>
      struct(lit(c).as("chunk_idx"),
        shiftright(sigCol, c * width).bitwiseAND((1L << width) - 1).as("chunk_val"))
    }
  }

  def simhashPairs(sig: DataFrame, idCol: String, maxDist: Int,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val chunkCols = simhashChunkCols(col("simhash"), maxDist)
    // bucket-size guard — same agg + anti/semi-join design as [[lshCandidates]]
    val chunked = sig.select(col(idCol), col("simhash"), explode(array(chunkCols: _*)).as("ch"))
      .select(col(idCol), col("simhash"), col("ch.chunk_idx"), col("ch.chunk_val"))
      .localCheckpoint()
    val hotChunks = chunked.groupBy(col("chunk_idx"), col("chunk_val"))
      .agg(count(lit(1)).as("__bs")).filter(col("__bs") > maxBucket)
      .select(col("chunk_idx"), col("chunk_val"))
    val bucketed = chunked.join(hotChunks, Seq("chunk_idx", "chunk_val"), "left_anti")
    val coldPairs = bucketed.as("l")
      .join(bucketed.as("r"),
        col("l.chunk_idx") === col("r.chunk_idx") &&
          col("l.chunk_val") === col("r.chunk_val") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
    val hotRows = chunked.join(hotChunks, Seq("chunk_idx", "chunk_val"), "left_semi")
    val hubs = hotRows.groupBy(col("chunk_idx"), col("chunk_val"))
      .agg(min(struct(col(idCol), col("simhash"))).as("__hub"))
    val starPairs = hotRows.join(hubs, Seq("chunk_idx", "chunk_val"))
      .filter(col(idCol) =!= col(s"__hub.$idCol"))
      .select(col(s"__hub.$idCol").as("id_a"), col(idCol).as("id_b"),
        bit_count(col(s"__hub.simhash").bitwiseXOR(col("simhash"))).as("hamming"))
    coldPairs.unionByName(starPairs)
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // — persisted SIMHASH index (Hamming near-dup state for 64-bit
  //   signatures) ————————————————————————————————————————————————————————
  //   ONE index family serves every 64-bit perceptual signature — text
  //   SimHash, image aHash/dHash/pHash, audio fingerprints, video frame
  //   hashes — because [[simhashPairs]]' chunk machinery is hash-agnostic.
  //   Without it, a daily media-ingest pipeline re-chunks the WHOLE
  //   signature corpus per batch; with it, a batch probes column scans of
  //   the persisted chunk table against broadcast batch-sized frames.

  /** A loaded persistent simhash index. `buckets` carries per-bucket
    * corpus occupancy plus the min-id hub AND the hub's signature, so
    * hot-bucket detection and star verification need no corpus aggregate
    * per batch (the [[VecIndex]] convention). `maxDist` rides in meta —
    * probing with a different distance than the index was chunked for
    * would silently lose the pigeonhole guarantee.
    */
  final case class SimhashIndex(sigs: DataFrame, chunks: DataFrame,
      buckets: DataFrame, maxDist: Int)

  private def rebuildSimhashBuckets(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    // recompute from the persisted chunk table via the shared
    // staging+MARKER swap (cannot overwrite a path feeding the plan being
    // written; and a bare delete-then-rename has a crash window — between
    // the delete and the rename — that leaves NO buckets dir at all.
    // ADVICE r12: this sits on the streaming hot path via
    // mediaCorpusIndexedSink's per-micro-batch append, so that window
    // would brick the sink's replay loop until manual repair; under the
    // marker protocol the next readSimhashIndex heals the swap instead)
    spark.read.parquet(s"$path/chunks")
      .groupBy(col("chunk_idx"), col("chunk_val"))
      .agg(count(lit(1)).as("__ccnt"),
        min(struct(col("corpus_id"), col("simhash"))).as("__hub"))
      .write.mode("overwrite").parquet(s"$path/buckets.staging")
    publishBatchMarker(spark, path, Seq("buckets"))
    finishBatchCompaction(spark, path)
  }

  /** Persist the corpus side of Hamming near-dup state:
    * `path/{sigs,chunks,buckets}` parquet + `path/meta.json` (the chunk
    * geometry's `maxDist` — deleted FIRST on rebuild and written LAST, so
    * its presence marks a complete, mutually consistent index).
    */
  def writeSimhashIndex(sig: DataFrame, idCol: String, sigCol: String,
      path: String, maxDist: Int): Unit = {
    val spark = sig.sparkSession
    val (fs, metaP) = hadoopFs(spark, s"$path/meta.json")
    if (fs.exists(metaP)) fs.delete(metaP, false)
    sig.select(col(idCol).as("corpus_id"), col(sigCol).cast("long").as("simhash"))
      .write.mode("overwrite").parquet(s"$path/sigs")
    val sigsP = spark.read.parquet(s"$path/sigs")
    sigsP.select(col("corpus_id"), col("simhash"),
        explode(array(simhashChunkCols(col("simhash"), maxDist): _*)).as("ch"))
      .select(col("corpus_id"), col("simhash"), col("ch.chunk_idx"), col("ch.chunk_val"))
      .write.mode("overwrite").parquet(s"$path/chunks")
    rebuildSimhashBuckets(spark, path)
    writeTextFile(spark, s"$path/meta.json", s"""{"maxDist":$maxDist}""")
  }

  /** Load a persisted simhash index (lazy parquet frames + parsed meta). */
  def readSimhashIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): SimhashIndex = {
    finishBatchCompaction(spark, path) // complete an interrupted dir swap first
    val meta = readTextFile(spark, s"$path/meta.json")
    val maxDist = """"maxDist":\s*(\d+)""".r.findFirstMatchIn(meta)
      .getOrElse(throw new IllegalArgumentException(s"simhash index meta missing maxDist: $meta"))
      .group(1).toInt
    SimhashIndex(
      sigs = spark.read.parquet(s"$path/sigs"),
      chunks = spark.read.parquet(s"$path/chunks"),
      buckets = spark.read.parquet(s"$path/buckets"),
      maxDist = maxDist)
  }

  /** Append a signature batch. Idempotent under replay: each table
    * anti-joins the ids it already holds, with both fresh sets pinned
    * BEFORE any write rewrites the directories they read (the band-index
    * lesson — a per-table guard completes exactly the missing tables
    * after a crash between the two appends). Buckets recompute from the
    * appended chunk table via staging + swap.
    */
  def appendToSimhashIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      newSigs: DataFrame, idCol: String, sigCol: String,
      autoCompactAt: Int = AutoCompactDefault): Unit = {
    val idx = readSimhashIndex(spark, path)
    val batch = newSigs.select(col(idCol).as("corpus_id"),
      col(sigCol).cast("long").as("simhash"))
    def freshVs(existing: DataFrame): DataFrame =
      batch.join(existing.select(col("corpus_id")), Seq("corpus_id"), "left_anti")
        .localCheckpoint()
    val freshSigs = freshVs(idx.sigs)
    val freshChunks = freshVs(idx.chunks)
    freshSigs.write.mode("append").parquet(s"$path/sigs")
    freshChunks.select(col("corpus_id"), col("simhash"),
        explode(array(simhashChunkCols(col("simhash"), idx.maxDist): _*)).as("ch"))
      .select(col("corpus_id"), col("simhash"), col("ch.chunk_idx"), col("ch.chunk_val"))
      .write.mode("append").parquet(s"$path/chunks")
    rebuildSimhashBuckets(spark, path)
    maybeAutoCompact(spark, path, SimhashIndexTables, autoCompactAt)
  }

  /** Probe a signature batch against the index: every corpus item within
    * Hamming `maxDist` of a batch item (batch-INTERNAL pairs are the live
    * [[simhashPairs]]' job — same split as the band/vec index probes).
    * Candidates are exact by pigeonhole on the cold path; hot buckets
    * (persisted corpus occupancy + batch occupancy > maxBucket, counted
    * for TOUCHED buckets only) star-degrade against the persisted min-id
    * hub. Per-batch cost: batch-sized chunking + column scans of the
    * index tables joined against broadcast batch-sized frames — nothing
    * corpus-scale shuffles per batch.
    */
  def probeSimhashIndex(idx: SimhashIndex, batch: DataFrame, idCol: String,
      sigCol: String, maxBucket: Int = DefaultMaxBucket,
      batchBroadcastCap: Long = BatchBroadcastCap): DataFrame = {
    val chB = batch
      .select(col(idCol).as("batch_id"), col(sigCol).cast("long").as("simhash"))
      .select(col("batch_id"), col("simhash"),
        explode(array(simhashChunkCols(col("simhash"), idx.maxDist): _*)).as("ch"))
      .select(col("batch_id"), col("simhash"), col("ch.chunk_idx"), col("ch.chunk_val"))
      .localCheckpoint()
    val batchCnt = chB.groupBy(col("chunk_idx"), col("chunk_val"))
      .agg(count(lit(1)).as("__bcnt")).localCheckpoint()
    val touched = idx.buckets.join(broadcast(batchCnt), Seq("chunk_idx", "chunk_val"))
    val hot = touched.filter(col("__ccnt") + col("__bcnt") > maxBucket)
      .select(col("chunk_idx"), col("chunk_val"), col("__hub"))
      .localCheckpoint()
    val hotKeys = hot.select(col("chunk_idx"), col("chunk_val"))
    // batch side renamed pre-join: both sides carry a `simhash` column and
    // the Hamming xor must pair the BATCH signature with the CORPUS one
    val coldB = chB.join(hotKeys, Seq("chunk_idx", "chunk_val"), "left_anti")
      .withColumnRenamed("simhash", "__bsig")
    val cold =
      (if (chB.count() <= batchBroadcastCap)
        idx.chunks.join(broadcast(coldB), Seq("chunk_idx", "chunk_val"))
      else idx.chunks.hint("merge").join(coldB.hint("merge"), Seq("chunk_idx", "chunk_val")))
        .select(col("batch_id"), col("corpus_id"),
          bit_count(col("__bsig").bitwiseXOR(col("simhash"))).as("hamming"))
    val star = chB.join(hotKeys, Seq("chunk_idx", "chunk_val"), "left_semi")
      .join(broadcast(hot), Seq("chunk_idx", "chunk_val"))
      .select(col("batch_id"), col("__hub.corpus_id").as("corpus_id"),
        bit_count(col("simhash").bitwiseXOR(col("__hub.simhash"))).as("hamming"))
    cold.unionByName(star)
      .filter(col("batch_id") =!= col("corpus_id"))
      .distinct()
      .filter(col("hamming") <= idx.maxDist)
  }

  private val SimhashIndexTables = Seq("sigs", "chunks")

  /** [[compactBatchIndex]] over [[writeSimhashIndex]]'s layout (`buckets`
    * excluded — each append already rewrites it whole via staging+swap).
    */
  def compactSimhashIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFiles: Int = 1): Unit =
    compactBatchIndex(spark, path, SimhashIndexTables, targetFiles)
}
