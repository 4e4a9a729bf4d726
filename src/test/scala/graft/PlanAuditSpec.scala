package graft

/** Catalog-wide physical-plan sweep: no probe may plan a cartesian product
  * or a broadcast-nested-loop join unless it is on the explicit whitelist
  * of deliberately-quadratic exact baselines (the oracles the scalable
  * variants are verified against). A new operator that silently degenerates
  * to an O(n²) join fails here before it ever reaches a benchmark.
  */
class PlanAuditSpec extends SparkSpec {

  // exact all-pairs baselines: quadratic BY DESIGN, kept as oracles for the
  // LSH/IVF scale paths (x03/x06/x12 are their scalable twins)
  private val quadraticByDesign = Set(
    "x05_sim_topk_bruteforce", // brute-force cosine: the exact ANN baseline
    "x06_sim_topk_lsh",        // bucketed, but per-bucket pairing is a theta join
    "x07_cosine_near_dup",     // exact pair verify (LSH variant is the scale path)
    "x12_sim_topk_ivf",        // probe×centroid scoring is a small cross product
    "x22_sim_topk_quantized",  // candidate scan IS corpus×queries by design —
                               // the win is int8 bytes/FLOPs, not asymptotics
    "x37_sim_topk_ivf_quantized", // probe×centroid scoring, like x12; PlanSpec
                                  // separately pins BNL count ≤ 2 (centroids only)
    "x38_ann_planted_recall",  // embeds the x05 brute-force pass as its ground truth
    "x44_semantic_dedup",      // probes the exact=true variant so the surviving set
                               // is value-oracled; the LSH pair stage is the scale path
    "x75_semantic_decontaminate", // probes the exact=true arm (bench×corpus broadcast
                                 // nested-loop, linear in corpus) so every flagged
                                 // pair is value-oracled; the sign-bucket arm is the
                                 // wide-bench scale path, recall-gated in OpsSpec
    "x81_semantic_decontaminate_clean", // the anti-join tail over the same exact arm
    "x77_sim_topk_pq_adc",     // ADC candidate scan IS corpus×queries by design,
                               // like x22 — the win is m byte-lookups per pair
                               // (32× less I/O than float), not asymptotics;
                               // compose with IVF lists for the sublinear path
    "x79_sim_topk_ivf_pq",     // probe×centroid scoring is a small cross
                               // product, exactly like x12/x37; the candidate
                               // stage itself is a list-id equi-join
    "x98_cluster_temperature", // the Ivf.assign argmax is corpus×centroids
                               // against a broadcast-sized centroid table,
                               // exactly the x12 shape; everything after it
                               // is a scan-side literal-map filter
    "x99_classifier_train",    // the class-total join is counts×(ONE-row
                               // aggregate) broadcast — the standard
                               // scalar-broadcast shape; the corpus-sized
                               // stage is the single count shuffle
    "x106_leakage_safe_split", // the probe's final assembly cross-joins
                               // its TWO one-row invariant aggregates
                               // (fraction checks × leak counts) — a 1×1
                               // product; the corpus-sized stages (pairs,
                               // components, coin) are all equi-keyed
    "x114_pagerank",           // the dangling-mass term is a 1-row total
                               // broadcast onto the rank update each
                               // iteration — the x99 scalar-broadcast
                               // shape; contributions are an equi-join
    "x116_sim_topk_projected", // brute force in PROJECTED space BY DESIGN
                               // (the x05 shape at outDim cost) — the JL
                               // win is per-pair FLOPs, not asymptotics;
                               // compose with IVF for the sublinear path
    "x117_sim_topk_projected_rerank", // embeds x05 exact ground truth +
                               // the projected shortlist scan (both
                               // whitelisted shapes above)
    "x118_quote_authority",    // the pageRank tail's 1-row dangling
                               // broadcast (x114); the containment pair
                               // stage is shingle-equi-keyed
    "x121_host_authority",     // same pageRank tail at host grain; the
                               // host-map joins are id-equi-keyed
    "x122_pagerank_weighted",  // the x114 scalar-broadcast dangling tail
    "x123_trustrank",          // ditto, with the seed teleport vector
    "x128_host_authority_weighted", // the weighted pageRank tail (x122)
                               // over host-grain quote counts
    "x135_bm25",               // the N/avgdl corpus statistics are a 1-row
                               // aggregate broadcast onto the query-term
                               // postings — the x99 scalar-broadcast
                               // shape; tf/df/score joins are term- and
                               // id-equi-keyed
    "x136_domain_balance",     // the water-fill bound C = min(T_s/f_s) is
                               // a 1-row aggregate crossed back onto the
                               // dictionary-sized source table — scalar
                               // broadcast again
    "x144_domain_balance_indexed", // the same water-fill tail (shared
                               // code) over the dictionary-sized
                               // source-token index read
    "x145_streaming_domain_balance", // ditto, over the stream-folded
                               // index
    "x137_bm25_indexed",       // the x135 scoring tail (1-row N/avgdl
                               // scalar broadcast) over the pruned
                               // postings scan
    "x138_streaming_bm25_index", // the same scoring tail over the
                               // stream-folded index
    "x139_bm25_topk",          // the x135 scoring tail + a per-query
                               // rank window (WindowGroupLimit)
    "x141_bm25_decontaminate", // the x139 retrieval (same 1-row scalar
                               // broadcast) + a tiny-hit-set anti-join
    "x146_bm25_decontaminate_indexed", // x141's shape over the pruned
                               // postings probe (same stats broadcast)
    "x143_hybrid_rrf_indexed", // x142's shape with the lexical arm on
                               // the persisted index (same 1-row stats
                               // broadcast, same semantic arm)
    "x142_hybrid_rrf_topk",    // the x05 brute-force semantic arm
                               // (corpus × broadcast queries, the exact
                               // baseline by design) + the x139 lexical
                               // arm's 1-row stats broadcast; the fusion
                               // itself is an equi-keyed union+window
                               // over two already-cut top-k lists
    "x149_hybrid_pruned_recall", // the x147 shapes at the approximate
                               // nprobe point + the x38-style planted
                               // gate joins (tiny per-query id maps)
    "x147_hybrid_indexed"      // both arms on persisted indexes: the
                               // lexical arm's 1-row stats broadcast
                               // (x137) + the IVF probe's queries ×
                               // broadcast CENTROID table (dictionary-
                               // sized by the √N contract — the x12
                               // shape); the list join is centroid-
                               // equi-keyed over pruned partitions
  )

  // streaming probes execute a query at construction time; plan-audited
  // via their own batch twins instead (x89's probe internals are swept
  // stage-by-stage in PlanSpec through a QueryExecutionListener)
  private val streaming = Set("x13_stream_counts", "x17_stream_stateful", "x18_stream_dedup",
    "x89_streaming_indexed_ingest")

  test("no probe plans Cartesian/BroadcastNestedLoop joins (whitelist: exact baselines)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => streaming.contains(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        val bad = plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")
        if (bad && !quadraticByDesign.contains(name)) Some(name)
        else if (!bad && quadraticByDesign.contains(name)) None // tightened: fine
        else None
      }
    assert(offenders.isEmpty, s"unexpected quadratic join in: ${offenders.mkString(", ")}")
  }
}
