package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding TRAINER — learns the merge table that
  * [[TextStats.bpeTokenCount]] / [[TextStats.bpeTokenCountFold]] apply, so
  * a pipeline can fit its tokenizer on the corpus it curates instead of
  * shipping a fixed vocabulary (the [[TextStats.BpeMerges]] table stays as
  * the pinned public default).
  *
  * Algorithm (word-level BPE, the GPT-2/SentencePiece pre-tokenized
  * form): compress the corpus to a DISTINCT-WORD frequency table in one
  * pass — after that no round ever touches the corpus again, only the
  * vocabulary (|vocab| ≪ corpus; ~10⁷ rows for web-scale text, flat in
  * corpus size once saturated — the property that makes BPE training
  * tractable at 100 TB). Each round then:
  *
  *   1. explodes every vocab word's CURRENT symbol sequence into adjacent
  *      pairs weighted by word frequency (overlapping occurrences all
  *      count: "aaa" contributes (a,a) twice — the standard convention);
  *   2. takes the global argmax pair — one keyed aggregate on (a, b) and
  *      a 1-ROW driver collect (count desc, then lexicographic (a, b)
  *      binary tie-break, so training is deterministic and
  *      engine-replayable);
  *   3. rewrites the vocabulary: `␟a␟␟b␟ → ␟ab␟` over the bracketed
  *      symbol string — the exact greedy left-to-right, whole-symbol
  *      rewrite the counter's fold applies, so counting with a trained
  *      table reproduces training-time segmentation bit-for-bit. Each
  *      round's vocab is `localCheckpoint`ed (eager) and the superseded
  *      checkpoint released — the same iterative-lineage discipline as
  *      the [[Ivf.train]] Lloyd loop.
  *
  * Driver state is one (pair, count) row per round; everything heavy is
  * a keyed shuffle on (a, b). Rounds are sequential by nature (merge r+1
  * depends on r's rewrite) — production trainers amortize this with
  * driver-local refinement between synchronization points; this
  * implementation keeps one round = one job for replayability.
  *
  * The symbol bracket (U+001F) is scrubbed from input first, exactly as
  * the counter scrubs it — see [[TextStats.bpeTokenCount]].
  */
object Bpe {

  private val Sep = "\u001f"
  private val ScrubChars = "\u001f\u0001"

  /** Learn `numMerges` merge rules. Returns `(rank, lhs, rhs,
    * pair_count)` — rank is 1-based merge order; counts are the weighted
    * adjacent-pair frequencies at election time. Stops early (fewer rows)
    * if the vocabulary runs out of adjacent pairs.
    */
  def train(docs: DataFrame, textCol: Column, numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val sp = docs.sparkSession
    import sp.implicits._
    // one corpus pass: distinct words -> frequencies -> bracketed symbols
    var vocab = docs
      .select(explode(TextStats.tokens(translate(textCol, ScrubChars, ""))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(
        array_join(
          transform(split(col("__w"), ""), c => concat(lit(Sep), c, lit(Sep))), "").as("__sym"),
        col("__f"))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val syms = split(regexp_replace(col("__sym"), s"^$Sep|$Sep$$", ""), Sep + Sep)
      val best = vocab
        .select(col("__f"), syms.as("__s"))
        .filter(size(col("__s")) >= 2)
        .select(col("__f"),
          explode(transform(sequence(lit(1), size(col("__s")) - 1),
            i => struct(element_at(col("__s"), i).as("a"),
              element_at(col("__s"), i + 1).as("b")))).as("__p"))
        .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
        .agg(sum(col("__f")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((r + 1, a, b, cnt))
        val next = vocab.withColumn("__sym",
            replace(col("__sym"), lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep)))
          .localCheckpoint(true)
        vocab.unpersist() // superseded checkpoint
        vocab = next
        r += 1
      }
    }
    vocab.unpersist()
    learned.toSeq.toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** BATCHED BPE training — the path to real vocabulary sizes. [[train]]
    * runs one Spark job (shuffle + 1-row collect) per merge: fine for a
    * probe, infeasible for a 32k-merge production vocabulary. This
    * variant elects up to `batchSize` merges per synchronization point —
    * `rounds` rounds of 2 jobs each (one `TakeOrdered` collect of the
    * top-`batchSize` pair candidates, one checkpointed vocabulary
    * rewrite), so jobs grow with ROUNDS, not merges.
    *
    * Admission rule (deterministic, engine-replayable): candidates rank
    * by (count desc, a, b); walking in rank order, a pair is ADMITTED iff
    * neither of its symbols is blocked, where each admitted pair blocks
    * its operands AND its output (`{a, b, a+b}`). Admitted pairs apply in
    * rank order within the round.
    *
    * Why admitted counts stay exact: an earlier admitted rewrite
    * `␟a␟␟b␟ → ␟ab␟` can change a later pair (c, d)'s adjacency count
    * only by destroying an occurrence it overlaps (requires a or b ∈
    * {c, d}) or creating one through the new symbol (requires ab ∈
    * {c, d}) — both excluded by the block set, so every admitted pair's
    * recorded `pair_count` is its true frequency at application time.
    *
    * This is a documented VARIANT of sequential BPE, not a reordering of
    * it: lower-ranked pairs blocked in round r may be elected in round
    * r+1 with refreshed counts (with `batchSize = 1` the variant
    * degenerates to [[train]] exactly — pinned in PipelineOpsSpec). The
    * x85 probe value-checks the full training run against
    * [[trainBatchedSql]]'s DuckDB replay.
    *
    * Returns `(rank, lhs, rhs, pair_count)` — rank is the 1-based global
    * merge order (round order, then within-round admission order). Fewer
    * than `rounds · batchSize` rows when admission rejects conflicts or
    * the vocabulary runs out of pairs.
    */
  def trainBatched(docs: DataFrame, textCol: Column, rounds: Int,
      batchSize: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val sp = docs.sparkSession
    import sp.implicits._
    var vocab = docs
      .select(explode(TextStats.tokens(translate(textCol, ScrubChars, ""))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(
        array_join(
          transform(split(col("__w"), ""), c => concat(lit(Sep), c, lit(Sep))), "").as("__sym"),
        col("__f"))
      .localCheckpoint()
    // rank is BIGINT (the probe convention for computed integers; the
    // sequential trainer's INT rank predates it and its oracle matches)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val syms = split(regexp_replace(col("__sym"), s"^$Sep|$Sep$$", ""), Sep + Sep)
      // ONE TakeOrdered job: the top-batchSize candidates (not 1 row/merge)
      val top = vocab
        .select(col("__f"), syms.as("__s"))
        .filter(size(col("__s")) >= 2)
        .select(col("__f"),
          explode(transform(sequence(lit(1), size(col("__s")) - 1),
            i => struct(element_at(col("__s"), i).as("a"),
              element_at(col("__s"), i + 1).as("b")))).as("__p"))
        .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
        .agg(sum(col("__f")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(batchSize)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        // greedy driver-side admission over the (tiny) candidate slice
        val blocked = scala.collection.mutable.Set.empty[String]
        val admitted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        top.foreach { row =>
          val (a, b, c) = (row.getString(0), row.getString(1), row.getLong(2))
          if (!blocked(a) && !blocked(b)) {
            admitted += ((a, b, c))
            blocked ++= Seq(a, b, a + b)
          }
        }
        admitted.foreach { case (a, b, c) =>
          learned += ((learned.size + 1L, a, b, c))
        }
        // apply the whole batch in rank order as ONE checkpointed rewrite
        val next = vocab.withColumn("__sym",
            admitted.foldLeft(col("__sym")) { case (acc, (a, b, _)) =>
              replace(acc, lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep))
            })
          .localCheckpoint(true)
        vocab.unpersist() // superseded checkpoint
        vocab = next
        r += 1
      }
    }
    vocab.unpersist()
    learned.toSeq.toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** A trained table in the counter's `Seq[(lhs, rhs)]` form, rank order
    * — `bpeTokenCount(text, mergesOf(trained))` counts with the learned
    * vocabulary. Driver-side by design: merge tables are small.
    */
  def mergesOf(trained: DataFrame): Seq[(String, String)] =
    trained.orderBy("rank").collect()
      .map(row => (row.getAs[String]("lhs"), row.getAs[String]("rhs"))).toSeq

  /** DuckDB replay of [[train]] over table `table`'s column `textExpr`:
    * `numMerges` chained CTE rounds, each recomputing the weighted pair
    * counts, electing the same argmax, and applying the same bracketed
    * whole-symbol rewrite — the full training run is value-checked, not
    * just the final table shape.
    */
  def trainSql(table: String, textExpr: String, numMerges: Int): String = {
    val sep = "chr(31)"
    val v0 =
      s"""v0 AS (
         |  SELECT array_to_string(list_transform(range(1, length(w) + 1),
         |      i -> $sep || w[i] || $sep), '') AS sym,
         |    CAST(count(*) AS BIGINT) AS f
         |  FROM (SELECT unnest(list_filter(regexp_split_to_array(
         |      replace(replace($textExpr, chr(31), ''), chr(1), ''), '\\s+'),
         |      x -> x != '')) AS w
         |    FROM $table)
         |  GROUP BY 1)""".stripMargin
    val rounds = (1 to numMerges).map { r =>
      s"""p$r AS (
         |  SELECT l[i] AS a, l[i + 1] AS b, CAST(sum(f) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT f, l, unnest(generate_series(1, len(l) - 1)) AS i
         |    FROM (SELECT f, string_split(trim(sym, $sep), $sep || $sep) AS l
         |          FROM v${r - 1})
         |    WHERE len(l) >= 2)
         |  GROUP BY 1, 2),
         |b$r AS (SELECT a, b, cnt FROM p$r
         |  ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         |v$r AS (
         |  SELECT replace(sym, $sep || b.a || $sep || $sep || b.b || $sep,
         |      $sep || b.a || b.b || $sep) AS sym, f
         |  FROM v${r - 1}, b$r b)""".stripMargin
    }
    val finalSelect = (1 to numMerges)
      .map(r => s"SELECT $r AS rank, a AS lhs, b AS rhs, cnt AS pair_count FROM b$r")
      .mkString("\nUNION ALL\n")
    (v0 +: rounds).mkString(",\n") + "\n" + finalSelect
  }

  /** DuckDB replay of [[trainBatched]]: per round, the same weighted pair
    * counts and top-`batchSize` candidate rank, the greedy admission walk
    * as a recursive CTE over candidate rank (the blocked-symbol set rides
    * as a ␟-delimited string — symbols cannot contain ␟, it is scrubbed
    * from input, so `position(␟sym␟ IN blk)` is an exact membership
    * test), and the in-rank-order batch rewrite as a recursive CTE over
    * admission index. Heavy CTEs are MATERIALIZED: each `v_r` is consumed
    * twice, and inlining would expand the chain exponentially in rounds.
    * The full training run is value-checked, not just the final shape.
    */
  def trainBatchedSql(table: String, textExpr: String, rounds: Int,
      batchSize: Int): String = {
    val sep = "chr(31)"
    val v0 =
      s"""v0 AS MATERIALIZED (
         |  SELECT array_to_string(list_transform(range(1, length(w) + 1),
         |      i -> $sep || w[i] || $sep), '') AS sym,
         |    CAST(count(*) AS BIGINT) AS f
         |  FROM (SELECT unnest(list_filter(regexp_split_to_array(
         |      replace(replace($textExpr, chr(31), ''), chr(1), ''), '\\s+'),
         |      x -> x != '')) AS w
         |    FROM $table)
         |  GROUP BY 1)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT l[i] AS a, l[i + 1] AS b, CAST(sum(f) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT f, l, unnest(generate_series(1, len(l) - 1)) AS i
         |    FROM (SELECT f, string_split(trim(sym, $sep), $sep || $sep) AS l
         |          FROM v${r - 1})
         |    WHERE len(l) >= 2)
         |  GROUP BY 1, 2),
         |c$r AS MATERIALIZED (SELECT a, b, cnt,
         |    row_number() OVER (ORDER BY cnt DESC, a ASC, b ASC) AS rk
         |  FROM p$r ORDER BY cnt DESC, a ASC, b ASC LIMIT $batchSize),
         |g$r AS (
         |  SELECT 0 AS rk, '' AS blk, '' AS a, '' AS b, CAST(0 AS BIGINT) AS cnt, FALSE AS adm
         |  UNION ALL
         |  SELECT c.rk,
         |    CASE WHEN position($sep || c.a || $sep IN g.blk) = 0
         |          AND position($sep || c.b || $sep IN g.blk) = 0
         |      THEN g.blk || $sep || c.a || $sep || $sep || c.b || $sep
         |             || $sep || c.a || c.b || $sep
         |      ELSE g.blk END,
         |    c.a, c.b, c.cnt,
         |    position($sep || c.a || $sep IN g.blk) = 0
         |      AND position($sep || c.b || $sep IN g.blk) = 0
         |  FROM g$r g JOIN c$r c ON c.rk = g.rk + 1),
         |adm$r AS MATERIALIZED (
         |  SELECT a, b, cnt, row_number() OVER (ORDER BY rk) AS lrk
         |  FROM g$r WHERE adm),
         |rw$r AS (
         |  SELECT 0 AS i, sym, f FROM v${r - 1}
         |  UNION ALL
         |  SELECT rw.i + 1, replace(rw.sym, $sep || m.a || $sep || $sep || m.b || $sep,
         |      $sep || m.a || m.b || $sep), rw.f
         |  FROM rw$r rw JOIN adm$r m ON m.lrk = rw.i + 1),
         |v$r AS MATERIALIZED (SELECT sym, f FROM rw$r WHERE i = (SELECT count(*) FROM adm$r))""".stripMargin
    }
    val finalSelect = (1 to rounds)
      .map(r => s"SELECT $r AS rnd, lrk, a AS lhs, b AS rhs, cnt AS pair_count FROM adm$r")
      .mkString("\nUNION ALL\n")
    "WITH RECURSIVE " + (v0 +: roundCtes).mkString(",\n") +
      ",\nallm AS (\n" + finalSelect + ")\n" +
      "SELECT CAST(row_number() OVER (ORDER BY rnd, lrk) AS BIGINT) AS rank, " +
      "lhs, rhs, pair_count FROM allm ORDER BY rnd ASC NULLS FIRST, lrk ASC NULLS FIRST"
  }
}
