package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph authority scoring — the domain/host quality prior large
  * web-corpus curations weight documents by (Common-Crawl-style rankings
  * compute exactly this over the host graph; the per-document quality
  * score then mixes the host's centrality with the text features
  * [[TextStats]] already produces).
  *
  * The operator is classic power-iteration PageRank (Page et al. '99,
  * public), expressed as the join–aggregate loop Spark executes well:
  * each iteration is ONE shuffle join of the edge list against the
  * current rank vector plus one keyed aggregate — no adjacency matrix,
  * no driver-side graph, no vertex program framework. At 100 TB the edge
  * list dwarfs the rank vector, so the join is planned as a shuffle on
  * `src` with the rank side small enough for AQE to broadcast once the
  * host graph collapses (distinct hosts ≪ distinct edges); the rank
  * frame is `localCheckpoint`ed per iteration with the superseded copy
  * released, so at most two O(|V|) frames are ever pinned (the
  * [[Dedup.components]] discipline).
  *
  * Reference: the notebook's analytics layer stops at flat KPI
  * aggregates (`notebooks/report.ipynb:173-202`); graph centrality is an
  * extension operator in the SURVEY §2 "beyond the reference" set.
  */
object Graph {

  /** Power-iteration PageRank over a directed edge list.
    *
    * Semantics, pinned (the DuckDB twin [[pageRankSql]] replays them
    * exactly):
    *   - edges are DISTINCT (src, dst) pairs; self-loops are legal edges
    *     (a self-linking host feeds its own rank back);
    *   - the node set is every id appearing on either side;
    *   - ranks start uniform at 1/N;
    *   - per iteration, with damping d:
    *       rank'(v) = (1-d)/N + d·(Σ_{u→v} rank(u)/outdeg(u) + dangling/N)
    *     where `dangling` is the summed rank of nodes with no out-edges
    *     (their mass redistributes uniformly — dropping it would leak
    *     total mass below 1 and make ranks incomparable across graphs);
    *   - output ranks are [[graft.Canonical.round6]]ed (pure-IEEE
    *     round-half-up, so both engines emit bit-identical decimals; the
    *     iteration itself runs full double precision in BOTH engines —
    *     per-step float error ~1e-15 relative stays ~8 orders below the
    *     rounding grain over any sane iteration count).
    *
    * Driver-side state: exactly one `count()` (N) — scalar, bounded. The
    * per-iteration dangling mass stays distributed: a 1-row aggregate
    * crossJoin-broadcast onto the rank update (the catalog-wide cartesian
    * audit whitelists broadcast 1-row totals).
    *
    * Fixed iteration count, not a convergence test: curation wants a
    * reproducible score column, and K is chosen by the caller (10 ≈
    * ranks stable to 1e-4 on web-shaped graphs; the probe uses 5 so the
    * oracle's unrolled CTE chain stays readable).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"pageRank needs iters >= 1, got $iters")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    val outDeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    // (node, out_deg) is the loop-invariant frame every iteration joins
    val deg = nodes.join(outDeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("out_deg"), lit(0L)).as("out_deg"))
      .localCheckpoint()
    val n = deg.count() // the one driver scalar
    if (n == 0) return deg.select(col("node"), lit(0.0).as("pagerank"))
    var rank = deg.select(col("node"), col("out_deg"),
      (lit(1.0) / lit(n.toDouble)).as("rank")).localCheckpoint()
    var i = 0
    while (i < iters) {
      val dangling = rank.filter(col("out_deg") === 0)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dang"))
      // filter BEFORE dividing: a dangling node's `rank / 0` is an ANSI
      // divide-by-zero whenever Catalyst evaluates the projection below
      // the join (plan-shape dependent — the pilot volume hit it, the
      // probe volume did not); dangling nodes have no out-edges to join
      // anyway, their mass flows through the `dangling` aggregate
      val contrib = e
        .join(rank.filter(col("out_deg") > 0).select(col("node").as("src"),
          (col("rank") / col("out_deg")).as("__share")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__share")).as("__contrib"))
      val next = deg
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"), col("out_deg"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("__contrib"), lit(0.0)) + col("__dang") / lit(n.toDouble)))
            .as("rank"))
        .localCheckpoint()
      rank.unpersist() // superseded checkpoint — keep at most 2 copies pinned
      rank = next
      i += 1
    }
    val out = rank.select(col("node"), graft.Canonical.round6(col("rank")).as("pagerank"))
    e.unpersist()
    deg.unpersist()
    out
  }

  /** Directed citation edges from [[Dedup.containmentPairs]] output: the
    * CONTAINED side points at its container — a quote cites its source,
    * so boilerplate/quote-farm mining turns into a graph problem and
    * [[pageRank]] over these edges scores SOURCE authority (the document
    * everyone copies outranks its copies). Mutual containment
    * (near-identical shingle sets) orients greater → smaller id, so the
    * canonical copy collects the authority; deterministic, value-oracled
    * end-to-end in x118.
    */
  def quoteEdges(pairs: DataFrame, threshold: Double): DataFrame =
    pairs.select(
      when(col("containment_a_in_b") >= threshold && col("containment_b_in_a") >= threshold,
        struct(greatest(col("id_a"), col("id_b")).as("src"),
          least(col("id_a"), col("id_b")).as("dst")))
        .when(col("containment_a_in_b") >= threshold,
          struct(col("id_a").as("src"), col("id_b").as("dst")))
        .otherwise(struct(col("id_b").as("src"), col("id_a").as("dst")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** [[quoteEdges]] aggregated to WEIGHTED host citations: every
    * doc-level quote lifts through the id→host map and host pairs count
    * their multiplicity — the input [[pageRankWeighted]] wants when
    * quote VOLUME should matter (contrast [[hostAuthority]], which
    * deliberately collapses multi-edges so one template mirror cannot
    * dominate; pick per corpus trust model). Self-citations survive as
    * weighted self-loops (PageRank handles them).
    */
  def hostQuoteWeights(edges: DataFrame, hosts: DataFrame, idCol: String,
      hostCol: String): DataFrame = {
    val m = hosts.select(col(idCol), col(hostCol))
    edges
      .join(m.select(col(idCol).as("src"), col(hostCol).as("__hs")), Seq("src"))
      .join(m.select(col(idCol).as("dst"), col(hostCol).as("__hd")), Seq("dst"))
      .groupBy(col("__hs").as("src"), col("__hd").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** [[quoteEdges]] lifted to the HOST graph — the grain production
    * curation actually weights at (a page quotes a page, but the quality
    * prior attaches to the site): join both edge endpoints to an
    * id→host map and rank hosts. Host ids must be NUMERIC (dictionary-
    * encode string hosts first — at 100 TB the dictionary encode is a
    * one-off distinct+zipWithIndex-style pass, and every downstream
    * shuffle moves 8-byte keys instead of strings). Multi-edges collapse
    * ([[pageRank]] dedups): a host pair quoted a thousand times counts
    * once — deliberate, or a single template mirror would dominate the
    * prior.
    */
  def hostAuthority(edges: DataFrame, hosts: DataFrame, idCol: String,
      hostCol: String, iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val m = hosts.select(col(idCol), col(hostCol))
    val he = edges
      .join(m.select(col(idCol).as("src"), col(hostCol).as("__hs")), Seq("src"))
      .join(m.select(col(idCol).as("dst"), col(hostCol).as("__hd")), Seq("dst"))
      .select(col("__hs").as("src"), col("__hd").as("dst"))
    pageRank(he, "src", "dst", iters, damping)
  }

  /** Weighted / personalized PageRank — the generalized form behind two
    * curation staples: edge-weighted authority (a host quoted by many
    * DISTINCT pages outranks one quoted once, when the caller aggregates
    * quote counts into weights) and TrustRank (Gyöngyi '04, public): a
    * teleport vector concentrated on hand-vetted seed hosts propagates
    * trust along links, and low-trust hosts are exactly the spam-farm
    * candidates curation down-weights.
    *
    * Semantics, pinned (DuckDB twin: [[pageRankWeightedSql]]):
    *   - duplicate (src, dst) edges AGGREGATE: w(u,v) = Σ weightCol;
    *     out-weight W(u) = Σ_v w(u,v); weights should be integer-valued
    *     (exact cross-engine aggregation — double weights would make the
    *     w(u,v) sums order-dependent);
    *   - contrib(v) = Σ_u r(u) · w(u,v) / W(u);
    *   - teleport t(v): uniform 1/N when `teleport` is None, else the
    *     caller's (node, t) frame — nodes absent from it get t = 0, and
    *     Σt must be 1 (checked, ±1e-9: a silently unnormalized vector
    *     would leak total mass and make ranks incomparable);
    *   - r'(v) = (1−d)·t(v) + d·(contrib(v) + dangling·t(v)) — dangling
    *     mass redistributes BY THE TELEPORT VECTOR (the standard
    *     personalized form: trust never leaks to unvetted hosts through
    *     dangling pages);
    *   - ranks start at t (the teleport prior) and output round6.
    *
    * Same execution shape as [[pageRank]]: one edge join + one keyed
    * aggregate per iteration, localCheckpoint'ed ranks, superseded
    * copies released, driver state = one count + one normalization
    * check.
    */
  def pageRankWeighted(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int = 10, damping: Double = 0.85,
      teleport: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, s"pageRankWeighted needs iters >= 1, got $iters")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("long").as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("w").isNotNull)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    val outW = e.groupBy(col("src").as("node")).agg(sum(col("w")).as("out_w"))
    val degBase = nodes.join(outW, Seq("node"), "left")
      .select(col("node"), coalesce(col("out_w"), lit(0L)).as("out_w"))
    val n = degBase.count()
    if (n == 0) {
      e.unpersist()
      return degBase.select(col("node"), lit(0.0).as("pagerank"))
    }
    val deg = (teleport match {
      case None => degBase.withColumn("t", lit(1.0) / lit(n.toDouble))
      case Some(tf) =>
        degBase.join(tf.select(col("node").cast("long").as("node"),
          col("t").cast("double").as("t")), Seq("node"), "left")
          .select(col("node"), col("out_w"), coalesce(col("t"), lit(0.0)).as("t"))
    }).localCheckpoint()
    val tSum = deg.agg(sum(col("t"))).head().getDouble(0)
    require(math.abs(tSum - 1.0) < 1e-9,
      s"teleport vector must sum to 1 over the node set, got $tSum — an " +
        "unnormalized vector silently leaks total mass")
    var rank = deg.select(col("node"), col("out_w"), col("t"), col("t").as("rank"))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      val dangling = rank.filter(col("out_w") === 0)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dang"))
      val contrib = e
        .join(rank.filter(col("out_w") > 0).select(col("node").as("src"),
          col("rank"), col("out_w")), Seq("src"))
        .select(col("dst").as("node"),
          (col("rank") * col("w") / col("out_w")).as("__share"))
        .groupBy(col("node")).agg(sum(col("__share")).as("__contrib"))
      val next = deg
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"), col("out_w"), col("t"),
          (lit(1.0 - damping) * col("t") + lit(damping) *
            (coalesce(col("__contrib"), lit(0.0)) + col("__dang") * col("t")))
            .as("rank"))
        .localCheckpoint()
      rank.unpersist()
      rank = next
      i += 1
    }
    val out = rank.select(col("node"), graft.Canonical.round6(col("rank")).as("pagerank"))
    e.unpersist()
    deg.unpersist()
    out
  }

  /** DuckDB twin of [[pageRankWeighted]] — unrolled CTE chain with the
    * identical IEEE update shape. `edgesCte` yields (src, dst, w);
    * `teleportCte` (optional) yields (node, t) and absent nodes read 0.
    */
  def pageRankWeightedSql(edgesCte: String, iters: Int, damping: Double = 0.85,
      teleportCte: Option[String] = None): String = {
    val d = damping.toString
    val tExpr = teleportCte match {
      case None => "1.0 / nn.n"
      case Some(_) => "coalesce(tv.t, 0.0)"
    }
    val tJoin = teleportCte match {
      case None => ""
      case Some(_) => "LEFT JOIN tvec tv ON tv.node = degb.node"
    }
    val tCte = teleportCte.map(c => s"tvec AS ($c),\n").getOrElse("")
    val steps = (1 to iters).map { k =>
      val prev = s"r${k - 1}"
      s"""r$k AS (
         |  SELECT deg.node, deg.out_w, deg.t,
         |    (1.0 - $d) * deg.t + $d *
         |      (coalesce(c.contrib, 0.0) + dang.s * deg.t) AS rank
         |  FROM deg
         |  LEFT JOIN (SELECT ed.dst AS node, sum(r.rank * ed.w / r.out_w) AS contrib
         |             FROM ed JOIN $prev r ON r.node = ed.src WHERE r.out_w > 0 GROUP BY 1) c
         |    ON c.node = deg.node,
         |  (SELECT coalesce(sum(rank), 0.0) AS s FROM $prev WHERE out_w = 0) dang)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS ($edgesCte),
       |ed AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM raw
       |       WHERE src IS NOT NULL AND dst IS NOT NULL AND w IS NOT NULL
       |       GROUP BY 1, 2),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM ed UNION ALL SELECT dst AS node FROM ed)),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |${tCte}deg AS (SELECT degb.node, degb.out_w, $tExpr AS t
       |  FROM (SELECT n.node, coalesce(o.ow, 0) AS out_w
       |        FROM nodes n LEFT JOIN
       |          (SELECT src AS node, CAST(sum(w) AS BIGINT) AS ow FROM ed GROUP BY 1) o
       |          ON o.node = n.node) degb $tJoin, nn),
       |r0 AS (SELECT node, out_w, t, t AS rank FROM deg),
       |$steps
       |SELECT node, ${graft.Canonical.round6Sql("rank")} AS pagerank FROM r$iters""".stripMargin
  }

  /** Dictionary-encode a (string) host column to dense numeric ids for
    * [[hostAuthority]]. Deterministic: ids are 1-based and follow host
    * lexicographic order (nulls first, Spark's ascending default).
    *
    * Scale shape (round 13 — the old form was a `row_number` window with
    * NO partition spec, which funnels the ENTIRE dictionary through one
    * sort task; a 100-TB web corpus has 10⁸–10⁹ distinct hosts, so "the
    * dictionary is small" does not hold at exactly the grain this is
    * built for): a parallel range-partitioned `orderBy` (ascending
    * partitions across `spark.sql.shuffle.partitions` sort tasks) plus
    * `zipWithIndex`, whose per-partition offsets are a distributed prefix
    * count. The assigned id is the global lexicographic rank, so it is
    * bit-identical to the window form and INVARIANT to where the range
    * bounds land — no single-task stage anywhere (OpsSpec pins both the
    * bit-identity and the no-window plan shape).
    */
  def encodeHosts(docs: DataFrame, hostCol: String): DataFrame = {
    val spark = docs.sparkSession
    val dict = docs.select(col(hostCol)).distinct().orderBy(col(hostCol))
    val schema = org.apache.spark.sql.types.StructType(dict.schema.fields :+
      org.apache.spark.sql.types.StructField("host_id",
        org.apache.spark.sql.types.LongType, nullable = false))
    val withId = dict.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(withId, schema)
  }

  /** DuckDB twin of [[pageRank]]: an unrolled CTE chain (r0 … rK), one
    * CTE per iteration, same update expression SHAPE so both engines run
    * the identical IEEE sequence. `edgesCte` must be a CTE body yielding
    * columns (src, dst) — dedup/null-filtering happen here, mirroring the
    * operator.
    */
  def pageRankSql(edgesCte: String, iters: Int, damping: Double = 0.85): String = {
    val d = damping.toString
    val steps = (1 to iters).map { k =>
      val prev = s"r${k - 1}"
      s"""r$k AS (
         |  SELECT deg.node, deg.out_deg,
         |    (1.0 - $d) / nn.n + $d *
         |      (coalesce(c.contrib, 0.0) + dang.s / CAST(nn.n AS DOUBLE)) AS rank
         |  FROM deg
         |  LEFT JOIN (SELECT ed.dst AS node, sum(r.rank / r.out_deg) AS contrib
         |             FROM ed JOIN $prev r ON r.node = ed.src GROUP BY 1) c
         |    ON c.node = deg.node,
         |  (SELECT coalesce(sum(rank), 0.0) AS s FROM $prev WHERE out_deg = 0) dang,
         |  nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS ($edgesCte),
       |ed AS (SELECT DISTINCT src, dst FROM raw
       |       WHERE src IS NOT NULL AND dst IS NOT NULL),
       |nodes AS (SELECT DISTINCT node FROM
       |  (SELECT src AS node FROM ed UNION ALL SELECT dst AS node FROM ed)),
       |deg AS (SELECT n.node, coalesce(o.c, 0) AS out_deg
       |        FROM nodes n LEFT JOIN
       |          (SELECT src AS node, count(*) AS c FROM ed GROUP BY 1) o
       |          ON o.node = n.node),
       |nn AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT node, out_deg, 1.0 / nn.n AS rank FROM deg, nn),
       |$steps
       |SELECT node, ${graft.Canonical.round6Sql("rank")} AS pagerank FROM r$iters""".stripMargin
  }
}
