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
    */
  def assign(corpus: DataFrame, idCol: String, vecCol: String, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("centroid_id").asc)
    corpus.withColumn("__vn", vec_norm(col(vecCol)))
      .crossJoin(broadcast(cents.withColumn("__cn", vec_norm(col("centroid_vec")))))
      .withColumn("__sim",
        round(vec_dot(col(vecCol), col("centroid_vec")) / (col("__vn") * col("__cn")), 6))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
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

  /** IVF search: probe `nprobe` lists per query, exact-rerank, top-k.
    * Deterministic (6-decimal rounding + id tiebreaks) when `cents` is.
    */
  def search(
      queries: DataFrame, qidCol: String, qvecCol: String,
      corpus: DataFrame, cidCol: String, cvecCol: String,
      cents: DataFrame, k: Int, nprobe: Int): DataFrame = {
    // norms hoisted BEFORE the probe×list join (one per corpus row / query
    // row, not one per candidate pair — O(k·dim) FLOPs saved per pair)
    val assigned = assign(corpus, cidCol, cvecCol, cents)
      .withColumn("__cnorm", vec_norm(col(cvecCol)))
      .persist()
    assigned.count() // eager: feeds the candidate join after the probe join

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
