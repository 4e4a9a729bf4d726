package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: turn a document corpus into fixed-token-budget
  * training sequences (GPT-style "concatenate then chunk").
  *
  * Greedy first-fit bin packing is inherently sequential (every placement
  * depends on the previous one), so it cannot scale past one partition.
  * What large pretraining pipelines actually do is simpler and exact:
  * concatenate all documents in a deterministic order and cut the token
  * stream at exact `budget` boundaries, letting a document straddle a cut.
  * That formulation is pure window arithmetic — a running token offset per
  * shard, then each document explodes into the 1..n sequences its
  * `[start, end)` token span overlaps — zero padding waste by construction.
  *
  * Scale shape: ONE hash shuffle on the shard key; each shard's window
  * sorts only 1/`shards` of the corpus (shards are independent streams, so
  * parallelism is a knob, not a semantic change); the explode adds one row
  * per boundary straddle. No driver state, no iteration.
  */
object Packing {

  /** Assign each document its token span inside fixed-`budget` sequences.
    *
    * Output: one row per (document, overlapped sequence) —
    * `(idCol, shard, seq_id, start_in_seq, end_in_seq, n_tokens)`, where
    * `[start_in_seq, end_in_seq)` is the slice of sequence `seq_id` the
    * document fills. Every sequence is exactly `budget` tokens except the
    * last of each shard. Zero-token documents are dropped.
    *
    * @param shardBy independent packing streams (default: hash of id —
    *                `pmod(xxhash64(id), shards)`)
    * @param orderBy concatenation order within a shard (default: hash of
    *                id — a deterministic pseudo-random shuffle, which
    *                pretraining wants anyway; ties broken by id)
    */
  def concatChunk(
      docs: DataFrame,
      idCol: String,
      tokenCount: Column,
      budget: Int,
      shards: Int = 64,
      shardBy: Option[Column] = None,
      orderBy: Option[Column] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val shardC = shardBy.getOrElse(pmod(xxhash64(col(idCol)), lit(shards.toLong)))
    val ordC = orderBy.getOrElse(xxhash64(col(idCol), lit("pack")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__ord").asc, col(idCol).asc)
    docs
      .select(col(idCol), tokenCount.cast("long").as("__t"),
        shardC.cast("long").as("shard"), ordC.as("__ord"))
      .filter(col("__t") > 0)
      .withColumn("__end", sum(col("__t")).over(w))
      .withColumn("__start", col("__end") - col("__t"))
      // the doc's token span [__start, __end) overlaps sequences
      // floor(__start/B) .. floor((__end-1)/B) — explode one row per hit
      .withColumn("seq_id", explode(sequence(
        floor(col("__start") / budget), floor((col("__end") - 1) / budget))))
      .select(col(idCol), col("shard"), col("seq_id").cast("long").as("seq_id"),
        greatest(col("__start") - col("seq_id") * budget, lit(0L)).as("start_in_seq"),
        least(col("__end") - col("seq_id") * budget, lit(budget.toLong)).as("end_in_seq"),
        col("__t").as("n_tokens"))
  }

  /** Sliding-window document chunking (the retrieval/RAG shape): split
    * each document into overlapping token windows of `chunkSize` tokens
    * every `stride` tokens, carrying the reassembled chunk text.
    *
    * Unlike [[concatChunk]] (which crosses document boundaries to fill a
    * training budget), chunks never cross documents and may overlap —
    * `stride < chunkSize` gives `chunkSize - stride` tokens of context
    * overlap between consecutive chunks.
    *
    * Embarrassingly parallel: tokenize → explode one row per window —
    * no shuffle at all, so it scales as a pure map stage.
    */
  def slidingChunks(
      docs: DataFrame,
      idCol: String,
      text: Column,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in [1, chunkSize=$chunkSize], got $stride")
    docs
      .select(col(idCol), TextStats.tokens(text).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0)
      // chunk count: 1 + ceil(max(0, n - chunkSize) / stride)
      .withColumn("chunk_idx", explode(sequence(lit(0L),
        ceil(greatest(col("__n") - chunkSize, lit(0L)).cast("double") / stride).cast("long"))))
      .withColumn("tok_start", col("chunk_idx") * stride)
      .withColumn("tok_end", least(col("tok_start") + chunkSize, col("__n")))
      .select(col(idCol), col("chunk_idx"), col("tok_start"), col("tok_end"),
        array_join(slice(col("__toks"), (col("tok_start") + 1).cast("int"),
          (col("tok_end") - col("tok_start")).cast("int")), " ").as("chunk_text"))
  }

  /** Sentence boundaries of a text column: maximal runs of
    * non-terminator characters plus their trailing `.!?` run (a
    * trailing fragment without a terminator is its own sentence). The
    * pattern avoids lookbehind deliberately — it must run identically
    * under Java regex AND RE2 (DuckDB), like every [[TextStats]]
    * pattern. Punctuation-only text yields no sentences.
    */
  def sentences(text: Column): Column =
    regexp_extract_all(text, lit("[^.!?]+(?:[.!?]+|$)"), lit(0))

  /** Sentence-AWARE chunking — [[slidingChunks]]' sibling for the
    * RAG/packing shape where a chunk must never cut mid-sentence:
    * consecutive sentences group into chunks by cumulative token count.
    *
    * Contract, pinned (the x131 oracle replays it exactly): sentence i
    * joins bucket `floor(tokens_before_i / maxTokens)` — so every chunk
    * starts at a sentence boundary, chunks hold ≥ 1 sentence, and a
    * chunk may OVERFLOW maxTokens by (at most) its final straddling
    * sentence — the standard "never split a sentence" trade; an
    * over-length single sentence becomes its own over-length chunk
    * rather than being cut. `chunk_idx` is densified (an over-length
    * sentence advances the raw bucket by > 1).
    *
    * Plan shape: one explode (bounded by sentences-per-doc), one
    * per-doc window cumsum, one keyed aggregate — partitions are
    * per-document, so no skew beyond document length itself.
    */
  def sentenceChunks(docs: DataFrame, idCol: String, text: Column,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val sel = docs.select(col(idCol),
      posexplode(sentences(text)).as(Seq("pos", "sent")))
    val tk = size(graft.functions.TextFunctions.wsTokens(col("sent"))).cast("long")
    val wCum = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withBucket = sel
      .withColumn("__tk", tk)
      .withColumn("__bucket",
        floor(coalesce(sum(col("__tk")).over(wCum), lit(0L)) / lit(maxTokens.toLong)))
    val withIdx = withBucket.withColumn("chunk_idx",
      (dense_rank().over(Window.partitionBy(col(idCol)).orderBy(col("__bucket"))) - 1)
        .cast("long"))
    withIdx.groupBy(col(idCol), col("chunk_idx"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("sent")))),
          x => x.getField("sent")), "").as("chunk_text"),
        count(lit(1)).as("n_sentences"),
        sum(col("__tk")).as("n_tokens"))
  }

  /** [[sentenceChunks]] with OVERLAP — the standard RAG chunking shape:
    * each chunk additionally carries the last `overlap` sentences of its
    * predecessor, so retrieval context never loses the cross-boundary
    * antecedent. Contract, pinned (x132's oracle replays it): primary
    * assignment is [[sentenceChunks]]' cumulative-token bucketing
    * verbatim; a sentence among the last `overlap` (by position) of
    * chunk c is DUPLICATED into chunk c+1 iff chunk c+1 exists; token
    * counts sum over chunk members, so overlapping sentences count in
    * both chunks (they are shipped in both).
    */
  def sentenceChunksOverlap(docs: DataFrame, idCol: String, text: Column,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 1, s"overlap must be >= 1, got $overlap (use sentenceChunks for 0)")
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val sel = docs.select(col(idCol),
      posexplode(sentences(text)).as(Seq("pos", "sent")))
    val tk = size(graft.functions.TextFunctions.wsTokens(col("sent"))).cast("long")
    val wCum = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withIdx = sel
      .withColumn("__tk", tk)
      .withColumn("__bucket",
        floor(coalesce(sum(col("__tk")).over(wCum), lit(0L)) / lit(maxTokens.toLong)))
      .withColumn("chunk_idx",
        (dense_rank().over(Window.partitionBy(col(idCol)).orderBy(col("__bucket"))) - 1)
          .cast("long"))
      .localCheckpoint() // feeds primary, carried, and the per-doc max
    val maxIdx = withIdx.groupBy(col(idCol))
      .agg(max(col("chunk_idx")).as("__max_idx"))
    val carried = withIdx
      .withColumn("__rnd", row_number().over(
        Window.partitionBy(col(idCol), col("chunk_idx")).orderBy(col("pos").desc)))
      .filter(col("__rnd") <= overlap)
      .join(maxIdx, Seq(idCol))
      .filter(col("chunk_idx") + 1 <= col("__max_idx"))
      .select(col(idCol), (col("chunk_idx") + 1).as("chunk_idx"),
        col("pos"), col("sent"), col("__tk"))
    val members = withIdx.select(col(idCol), col("chunk_idx"), col("pos"),
      col("sent"), col("__tk")).unionByName(carried)
    members.groupBy(col(idCol), col("chunk_idx"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("sent")))),
          x => x.getField("sent")), "").as("chunk_text"),
        count(lit(1)).as("n_sentences"),
        sum(col("__tk")).as("n_tokens"))
  }
}
