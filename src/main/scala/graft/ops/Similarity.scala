package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  *   - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *     set, stream the corpus once. The baseline and the verifier.
  *   - [[lshBucketTopK]]: random-hyperplane LSH (Charikar '02) — corpus is
  *     bucketed by sign-pattern once (linear scan), queries probe only
  *     their bucket. The 100-TB path: bucket assignment is a per-row
  *     expression, the bucket join is an equi-join Catalyst can shuffle or
  *     broadcast as cardinality dictates.
  *   - [[cosinePairs]]: embedding-cosine near-duplicate pairs over LSH
  *     buckets.
  *
  * All arithmetic is `zip_with`/`aggregate` higher-order functions in
  * double precision — no UDFs, stays in codegen.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query row.
    *
    * @param queries (qidCol, qvecCol) — small side, broadcast
    * @param corpus  (cidCol, cvecCol) — streamed once
    * Ties (after 6-decimal rounding) break on corpus id, so results are
    * deterministic and oracle-checkable.
    */
  def bruteForceTopK(
      queries: DataFrame, qidCol: String, qvecCol: String,
      corpus: DataFrame, cidCol: String, cvecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val crossed = corpus.crossJoin(broadcast(queries))
    val withSim = crossed
      .filter(if (excludeSelf) col(qidCol) =!= col(cidCol) else lit(true))
      .withColumn("cosine_sim", round(cosine(col(qvecCol), col(cvecCol)), 6))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("cosine_sim").desc, col(cidCol).asc)
    withSim
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(cidCol), col("cosine_sim"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed → identical across
    * runs/executors/sessions).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-pattern bucket id for a vector column under the given planes. */
  def bucketId(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vec, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-k: only same-bucket (query, corpus) pairs
    * are scored. Recall < 1 by construction; raise `numPlanes` ↓ bucket
    * size, lower it ↑ recall. Multi-probe extension: union over buckets at
    * Hamming distance 1 from the query's bucket.
    */
  def lshBucketTopK(
      queries: DataFrame, qidCol: String, qvecCol: String,
      corpus: DataFrame, cidCol: String, cvecCol: String,
      k: Int, numPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val qb = queries.withColumn("__bucket", bucketId(col(qvecCol), planes))
    val cb = corpus.withColumn("__bucket", bucketId(col(cvecCol), planes))
    val candidates = cb.join(broadcast(qb), Seq("__bucket"))
      .filter(col(qidCol) =!= col(cidCol))
      .withColumn("cosine_sim", round(cosine(col(qvecCol), col(cvecCol)), 6))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("cosine_sim").desc, col(cidCol).asc)
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(cidCol), col("cosine_sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: bucket with LSH, verify with
    * exact cosine ≥ threshold. id_a < id_b canonical orientation.
    */
  def cosinePairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val b = corpus.select(col(idCol), col(vecCol), bucketId(col(vecCol), planes).as("__bucket"))
    b.as("l").join(b.as("r"),
        col("l.__bucket") === col("r.__bucket") && col(s"l.$idCol") < col(s"r.$idCol"))
      .withColumn("cosine_sim", round(cosine(col(s"l.$vecCol"), col(s"r.$vecCol")), 6))
      .filter(col("cosine_sim") >= threshold)
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"), col("cosine_sim"))
  }

  /** Exact all-pairs cosine near-duplicates (the oracle-checkable variant —
    * quadratic, use [[cosinePairs]] at scale).
    */
  def cosinePairsExact(corpus: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val l = corpus.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val r = corpus.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    l.join(r, col("id_a") < col("id_b"))
      .withColumn("cosine_sim", round(cosine(col("__va"), col("__vb")), 6))
      .filter(col("cosine_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine_sim"))
  }
}
