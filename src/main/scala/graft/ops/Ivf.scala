package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{vec_dot, vec_norm}

/** IVF-Flat approximate-nearest-neighbor search (the inverted-file
  * counterpart to [[Similarity.lshBucketTopK]]).
  *
  * Index: a small centroid table (the coarse quantizer) partitions the
  * corpus into inverted lists by nearest centroid — one linear scan, one
  * shuffle-free broadcast argmax per vector. Search: each query probes its
  * `nprobe` nearest centroids and exactly reranks only those lists, so the
  * scanned fraction is ≈ nprobe/numCentroids of the corpus.
  *
  * The quantizer is pluggable: [[seedCentroids]] (k lowest-id vectors) is
  * deterministic and oracle-checkable; [[kmeansStep]] is one distributed
  * Lloyd iteration to refine any centroid table (unit-tested; a trained
  * quantizer is the production path at 100 TB — centroids stay broadcast-
  * sized at ~√N).
  */
object Ivf {

  /** Deterministic degenerate quantizer: the k lowest-id vectors. */
  def seedCentroids(corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    corpus.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))

  /** Assign every vector to its max-cosine centroid (broadcast argmax).
    * Norms are hoisted out of the vector×centroid product: one `vec_norm`
    * per row + one per centroid, not one per pair.
    *
    * The argmax is a `min_by` AGGREGATE, not a window `row_number`: a
    * window shuffles and sorts all k rows per vector, while the aggregate
    * map-side-combines them to one row per vector BEFORE the shuffle — at
    * 10⁹ corpus vectors × k centroids that is a k× shuffle-volume cut and
    * no sort. Ordering matches the window form exactly: max cosine first
    * (a NULL cosine — a zero-norm vector or centroid — sorts last, like
    * `desc` NULLS LAST), ties to the smallest centroid id.
    */
  def assign(corpus: DataFrame, idCol: String, vecCol: String, cents: DataFrame): DataFrame = {
    val ord = struct(
      coalesce(negate(col("__sim")), lit(Double.PositiveInfinity)),
      col("centroid_id"))
    corpus.withColumn("__vn", vec_norm(col(vecCol)))
      .crossJoin(broadcast(cents.withColumn("__cn", vec_norm(col("centroid_vec")))))
      .withColumn("__sim",
        round(vec_dot(col(vecCol), col("centroid_vec")) / (col("__vn") * col("__cn")), 6))
      .groupBy(col(idCol))
      .agg(first(col(vecCol)).as(vecCol),
        min_by(col("centroid_id"), ord).as("centroid_id"))
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** One distributed Lloyd iteration: element-wise mean of each cluster's
    * vectors → refined centroid table (posexplode → per-(cluster, pos) avg
    * → re-assembled arrays; all shuffles are on small keys).
    */
  def kmeansStep(assigned: DataFrame, vecCol: String): DataFrame =
    assigned
      .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy(col("centroid_id"), col("__pos"))
      .agg(avg(col("__v")).as("__mean"))
      .groupBy(col("centroid_id"))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__mean")))).as("__pairs"))
      .select(col("centroid_id"),
        expr("transform(__pairs, p -> CAST(p.__mean AS float))").as("centroid_vec"))

  /** Train the coarse quantizer: `iters` Lloyd iterations from the seed.
    *
    * Each iteration's centroid table is `localCheckpoint`ed (eager):
    * without truncation the plan after i iterations nests i assign+step
    * subtrees and re-executes ALL of them every pass — the classic
    * iterative-algorithm lineage explosion. The checkpoint materializes
    * ~k·dim floats per iteration (broadcast-sized by construction), so
    * truncation is effectively free.
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): DataFrame = {
    var cents = seedCentroids(corpus, idCol, vecCol, k)
    for (_ <- 0 until iters) {
      val refined = kmeansStep(assign(corpus, idCol, vecCol, cents), vecCol)
      cents = refined.localCheckpoint(true)
    }
    cents
  }

  /** IVF search with int8-quantized candidate scoring — the composed
    * 100-TB ANN plan: the coarse quantizer restricts each query to
    * `nprobe` inverted lists (scanned fraction ≈ nprobe/numCentroids),
    * and WITHIN the probed lists candidates are scored over the compact
    * int8 representation (¼ the bytes of float32 — in a real deployment
    * the codes are precomputed and stored, so candidate generation never
    * reads full vectors). The top `k·candMult` per query then rerank with
    * EXACT cosine over full vectors — a join touching only
    * |queries|·k·candMult corpus rows.
    *
    * Approximate score: `(qa·qb)·sa·sb / (‖a‖·‖b‖)` — int8 dot is exact
    * integer arithmetic, true norms are precomputed per row
    * ([[Similarity.quantizeInt8]] scaladoc derives the ≤0.4% relative
    * error). All arithmetic is deterministic half-up rounding, so the
    * whole pipeline (assignment → probes → int8 cut → exact rerank) is
    * engine-portable and value-oracled end to end (probe x37).
    */
  def searchQuantized(
      queries: DataFrame, qidCol: String, qvecCol: String,
      corpus: DataFrame, cidCol: String, cvecCol: String,
      cents: DataFrame, k: Int, nprobe: Int, candMult: Int = 4): DataFrame = {
    // one assignment pass; codes + norms hoisted once per corpus row
    val assigned = assign(corpus, cidCol, cvecCol, cents)
      .withColumn("__cq", Similarity.quantizeInt8(col(cvecCol)))
      .withColumn("__cnorm", vec_norm(col(cvecCol)))
      .localCheckpoint() // feeds the candidate join and the exact rerank; not persist — see search()

    val wProbe = Window.partitionBy(col(qidCol)).orderBy(col("__sim").desc, col("centroid_id").asc)
    val probes = queries
      .withColumn("__qq", Similarity.quantizeInt8(col(qvecCol)))
      .withColumn("__qnorm", vec_norm(col(qvecCol)))
      .crossJoin(broadcast(cents.withColumn("__cn", vec_norm(col("centroid_vec")))))
      .withColumn("__sim",
        round(vec_dot(col(qvecCol), col("centroid_vec")) / (col("__qnorm") * col("__cn")), 6))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col(qidCol), col(qvecCol), col("__qq"), col("__qnorm"), col("centroid_id"))

    // candidate cut over int8 codes only (compact columns pruned from the
    // probed lists; full corpus vectors are NOT read here)
    val wCand = Window.partitionBy(col(qidCol)).orderBy(col("__approx").desc, col(cidCol).asc)
    val cands = probes.join(
        assigned.select(col(cidCol), col("centroid_id"), col("__cq"), col("__cnorm")),
        Seq("centroid_id"))
      .filter(col(qidCol) =!= col(cidCol))
      .withColumn("__approx",
        round(vec_dot(col("__qq.q"), col("__cq.q")) * col("__qq.s") * col("__cq.s") /
          (col("__qnorm") * col("__cnorm")), 6))
      .withColumn("__r", row_number().over(wCand))
      .filter(col("__r") <= k * candMult)
      .select(col(qidCol), col(qvecCol), col("__qnorm"), col(cidCol))

    // exact rerank over full vectors, candidates only
    val wRank = Window.partitionBy(col(qidCol)).orderBy(col("cosine_sim").desc, col(cidCol).asc)
    cands.join(assigned.select(col(cidCol), col(cvecCol), col("__cnorm")), Seq(cidCol))
      .withColumn("cosine_sim",
        round(vec_dot(col(qvecCol), col(cvecCol)) / (col("__qnorm") * col("__cnorm")), 6))
      .select(col(qidCol), col(cidCol), col("cosine_sim"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
  }

  /** IVF-PQ search — the fully composed 100-TB ANN plan (the faiss
    * `IVFPQ` shape): the coarse quantizer restricts each query to
    * `nprobe` inverted lists, candidates WITHIN the probed lists score
    * via product-quantization ADC ([[Pq.adcScore]] — `m` byte-table
    * lookups per pair over codes precomputed once per corpus row, 4×
    * less candidate I/O than [[searchQuantized]]'s int8 and 32× less
    * than float), and the top `k·candMult` rerank with EXACT cosine over
    * full vectors. With [[seedCentroids]] + [[Pq.seedCodebooks]] every
    * stage is deterministic and value-oracled (probe x79); with
    * [[train]] + [[Pq.train]] it is the production path.
    */
  def searchPq(
      queries: DataFrame, qidCol: String, qvecCol: String,
      corpus: DataFrame, cidCol: String, cvecCol: String,
      cents: DataFrame, cb: Pq.Codebooks, k: Int, nprobe: Int,
      candMult: Int = 4): DataFrame = {
    // one assignment pass; PQ codes + norms hoisted once per corpus row
    val assigned = assign(corpus, cidCol, cvecCol, cents)
      .withColumn("__codes", Pq.codesColumn(col(cvecCol), cb))
      .withColumn("__cnorm", vec_norm(col(cvecCol)))
      .localCheckpoint() // feeds the candidate join and the exact rerank
    searchPqAssigned(queries, qidCol, qvecCol, assigned, cidCol, cvecCol,
      cents, cb, k, nprobe, candMult)
  }

  /** [[searchPq]] over a pre-assigned, pre-encoded corpus — `assigned`
    * must carry `centroid_id`, `__codes`, and `__cnorm` alongside the id
    * and vector columns, exactly what [[writePqIndex]] stores.
    */
  def searchPqAssigned(
      queries: DataFrame, qidCol: String, qvecCol: String,
      assigned: DataFrame, cidCol: String, cvecCol: String,
      cents: DataFrame, cb: Pq.Codebooks, k: Int, nprobe: Int,
      candMult: Int = 4): DataFrame = {
    val wProbe = Window.partitionBy(col(qidCol)).orderBy(col("__sim").desc, col("centroid_id").asc)
    val probes = queries
      .withColumn("__lut", Pq.lutColumn(col(qvecCol), cb))
      .withColumn("__qnorm", vec_norm(col(qvecCol)))
      .crossJoin(broadcast(cents.withColumn("__cn", vec_norm(col("centroid_vec")))))
      .withColumn("__sim",
        round(vec_dot(col(qvecCol), col("centroid_vec")) / (col("__qnorm") * col("__cn")), 6))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col(qidCol), col(qvecCol), col("__lut"), col("__qnorm"), col("centroid_id"))

    // candidate cut over PQ codes + norms only (full corpus vectors NOT
    // read here). The cut ranks the ADC COSINE — normalizing by the true
    // norms exactly as searchQuantized's int8 cut does; a raw-dot cut
    // would drop small-norm true neighbors before the exact rerank
    val wCand = Window.partitionBy(col(qidCol)).orderBy(col("__adc").desc, col(cidCol).asc)
    val cands = probes.join(
        assigned.select(col(cidCol), col("centroid_id"), col("__codes"), col("__cnorm")),
        Seq("centroid_id"))
      .filter(col(qidCol) =!= col(cidCol))
      .withColumn("__adc",
        Pq.adcCosine(col("__lut"), col("__codes"), cb.length, col("__qnorm"), col("__cnorm")))
      .withColumn("__r", row_number().over(wCand))
      .filter(col("__r") <= k * candMult)
      .select(col(qidCol), col(qvecCol), col("__qnorm"), col(cidCol))

    // exact rerank over full vectors, candidates only (zero norms score
    // NULL → desc default nulls last, same guard as Pq.adcCosine)
    val wRank = Window.partitionBy(col(qidCol)).orderBy(col("cosine_sim").desc, col(cidCol).asc)
    cands.join(assigned.select(col(cidCol), col(cvecCol), col("__cnorm")), Seq(cidCol))
      .withColumn("cosine_sim",
        when(col("__qnorm") <= 0.0 || col("__cnorm") <= 0.0, lit(null).cast("double"))
          .otherwise(round(vec_dot(col(qvecCol), col(cvecCol)) / (col("__qnorm") * col("__cnorm")), 6)))
      .select(col(qidCol), col(cidCol), col("cosine_sim"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
  }

  /** IVF search: probe `nprobe` lists per query, exact-rerank, top-k.
    * Deterministic (6-decimal rounding + id tiebreaks) when `cents` is.
    */
  def search(
      queries: DataFrame, qidCol: String, qvecCol: String,
      corpus: DataFrame, cidCol: String, cvecCol: String,
      cents: DataFrame, k: Int, nprobe: Int): DataFrame = {
    // norms hoisted BEFORE the probe×list join (one per corpus row / query
    // row, not one per candidate pair — O(k·dim) FLOPs saved per pair).
    // localCheckpoint, not persist: the assignment must not stay in the
    // SQL cache manager after the call returns (ContextCleaner releases
    // the blocks once the returned frame is dropped).
    val assigned = assign(corpus, cidCol, cvecCol, cents)
      .withColumn("__cnorm", vec_norm(col(cvecCol)))
      .localCheckpoint()
    searchAssigned(queries, qidCol, qvecCol, assigned, cidCol, cvecCol, cents, k, nprobe)
  }

  /** Persist a trained index: the centroid table plus the norm-annotated
    * assigned corpus, the latter written `partitionBy(centroid_id)` — the
    * on-disk inverted-list layout. A query batch probing `nprobe` of the
    * `numCentroids` lists reads ONLY those Hive partitions (partition
    * pruning), i.e. ≈ nprobe/numCentroids of the index bytes — the
    * build-once / probe-many deployment shape that amortizes assignment
    * and norm computation across every future batch.
    */
  def writeIndex(path: String, corpus: DataFrame, cidCol: String, cvecCol: String,
      cents: DataFrame): Unit = {
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    assign(corpus, cidCol, cvecCol, cents)
      .withColumn("__cnorm", vec_norm(col(cvecCol)))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$path/lists")
  }

  /** Load a persisted index → (centroids, assigned lists). */
  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/centroids"), spark.read.parquet(s"$path/lists"))

  /** Persist a trained IVF-PQ index: centroids, codebooks (as (j, k, t, c)
    * rows), and the assigned corpus with PQ codes + norms precomputed,
    * written `partitionBy(centroid_id)` — the on-disk inverted-list
    * layout where a probe reads ≈ nprobe/numCentroids of the index bytes
    * AND the candidate stage's code column prunes to a fraction of each
    * list's bytes (column pruning inside partition pruning — the
    * build-once / probe-many deployment that amortizes assignment,
    * encoding, and norm computation across every future query batch).
    */
  def writePqIndex(path: String, corpus: DataFrame, cidCol: String, cvecCol: String,
      cents: DataFrame, cb: Pq.Codebooks): Unit = {
    val sp = corpus.sparkSession
    import sp.implicits._
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    cb.zipWithIndex.flatMap { case (cwj, j) =>
      cwj.zipWithIndex.flatMap { case (cw, k) =>
        cw.zipWithIndex.map { case (c, t) => (j, k, t, c) }
      }
    }.toSeq.toDF("j", "k", "t", "c")
      .write.mode("overwrite").parquet(s"$path/codebooks")
    assign(corpus, cidCol, cvecCol, cents)
      .withColumn("__codes", Pq.codesColumn(col(cvecCol), cb))
      .withColumn("__cnorm", vec_norm(col(cvecCol)))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(s"$path/lists")
  }

  /** Load a persisted IVF-PQ index → (centroids, assigned lists,
    * codebooks) — feed straight into [[searchPqAssigned]].
    */
  def readPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (DataFrame, DataFrame, Pq.Codebooks) = {
    val rows = spark.read.parquet(s"$path/codebooks")
      .select(col("j"), col("k"), col("t"), col("c")).collect()
    val m = rows.map(_.getInt(0)).max + 1
    val ks = rows.map(_.getInt(1)).max + 1
    val ds = rows.map(_.getInt(2)).max + 1
    val cb = Array.fill(m, ks, ds)(0.0)
    rows.foreach(r => cb(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
    (spark.read.parquet(s"$path/centroids"), spark.read.parquet(s"$path/lists"), cb)
  }

  /** [[search]] over a pre-assigned (e.g. [[readIndex]]-loaded) corpus —
    * `assigned` must carry `centroid_id` and `__cnorm` alongside the id
    * and vector columns, exactly what [[writeIndex]] stores.
    */
  def searchAssigned(
      queries: DataFrame, qidCol: String, qvecCol: String,
      assigned: DataFrame, cidCol: String, cvecCol: String,
      cents: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val wProbe = Window.partitionBy(col(qidCol)).orderBy(col("__sim").desc, col("centroid_id").asc)
    val probes = queries.withColumn("__qnorm", vec_norm(col(qvecCol)))
      .crossJoin(broadcast(cents.withColumn("__cn", vec_norm(col("centroid_vec")))))
      .withColumn("__sim",
        round(vec_dot(col(qvecCol), col("centroid_vec")) / (col("__qnorm") * col("__cn")), 6))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col(qidCol), col(qvecCol), col("__qnorm"), col("centroid_id"))

    val wRank = Window.partitionBy(col(qidCol)).orderBy(col("cosine_sim").desc, col(cidCol).asc)
    probes.join(assigned, Seq("centroid_id"))
      .filter(col(qidCol) =!= col(cidCol))
      .withColumn("cosine_sim",
        round(vec_dot(col(qvecCol), col(cvecCol)) / (col("__qnorm") * col("__cnorm")), 6))
      .select(col(qidCol), col(cidCol), col("cosine_sim"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
  }
}
