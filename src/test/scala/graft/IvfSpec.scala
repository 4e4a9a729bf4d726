package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.ops.{Ivf, Pq, Similarity}
import graft.sources.Readers

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Readers.table(spark, sf0001, "embeddings")

  test("assign maps every vector to exactly one centroid") {
    val cents = Ivf.seedCentroids(emb, "vec_id", "embedding", 16)
    val assigned = Ivf.assign(emb, "vec_id", "embedding", cents)
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
    assert(assigned.select("centroid_id").distinct().count() <= 16)
  }

  test("IVF search returns true cosines and full probing (nprobe = numCents) equals brute force") {
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val cents = Ivf.seedCentroids(emb, "vec_id", "embedding", 8)
    val full = Ivf.search(queries, "query_id", "qvec", emb, "vec_id", "embedding",
        cents, k = 5, nprobe = 8)
      .select("query_id", "vec_id", "cosine_sim").as[(Long, Long, Double)].collect().toSet
    val brute = Similarity.bruteForceTopK(queries, "query_id", "qvec", emb, "vec_id", "embedding", 5)
      .select("query_id", "vec_id", "cosine_sim").as[(Long, Long, Double)].collect().toSet
    assert(full == brute, "probing every list = exact search")
  }

  test("one Lloyd iteration yields element-wise means with the original dimension") {
    val cents = Ivf.seedCentroids(emb, "vec_id", "embedding", 4)
    val assigned = Ivf.assign(emb, "vec_id", "embedding", cents)
    val refined = Ivf.kmeansStep(assigned, "embedding")
    assert(refined.count() <= 4)
    assert(refined.select(size($"centroid_vec")).as[Int].collect().forall(_ == 64))
    // refined centroid of a cluster must equal the avg of its members (spot-check dim 0)
    val clusterOf = assigned.select($"centroid_id", element_at($"embedding", 1).cast("double").as("d0"))
      .groupBy($"centroid_id").agg(avg($"d0").as("want"))
    val got = refined.select($"centroid_id", element_at($"centroid_vec", 1).cast("double").as("got"))
    val joined = clusterOf.join(got, "centroid_id")
      .select(abs($"want" - $"got").as("err")).as[Double].collect()
    assert(joined.forall(_ < 1e-6), "float re-cast tolerance")
  }

  test("train: iterated Lloyd keeps k centroids, dim intact, and a truncated plan") {
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val trained = Ivf.train(emb, "vec_id", "embedding", k = 4, iters = 3)
    assert(trained.count() <= 4)
    assert(trained.select(size($"centroid_vec")).as[Int].collect().forall(_ == 64))
    // localCheckpoint must have truncated the iterative lineage: the final
    // plan reads the checkpointed RDD, not 3 nested assign+step subtrees
    val plan = trained.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("Scan ExistingRDD"), plan)
    assert(!plan.contains("Window"), s"nested iteration subtree survived:\n$plan")
    // trained quantizer still supports exact-equivalent full probing
    val full = Ivf.search(queries, "query_id", "qvec", emb, "vec_id", "embedding",
        trained, k = 5, nprobe = 4)
      .select("query_id", "vec_id", "cosine_sim").as[(Long, Long, Double)].collect().toSet
    val brute = Similarity.bruteForceTopK(queries, "query_id", "qvec", emb, "vec_id", "embedding", 5)
      .select("query_id", "vec_id", "cosine_sim").as[(Long, Long, Double)].collect().toSet
    assert(full == brute, "probing every trained list = exact search")
  }

  test("persisted index: searchAssigned over readIndex equals live search; probes prune lists") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val cents = Ivf.seedCentroids(emb, "vec_id", "embedding", 8)
    Ivf.writeIndex(dir, emb, "vec_id", "embedding", cents)
    val (loadedCents, lists) = Ivf.readIndex(spark, dir)
    val fromIndex = Ivf.searchAssigned(queries, "query_id", "qvec",
        lists, "vec_id", "embedding", loadedCents, k = 5, nprobe = 2)
      .select("query_id", "vec_id", "cosine_sim").as[(Long, Long, Double)].collect().toSet
    val live = Ivf.search(queries, "query_id", "qvec", emb, "vec_id", "embedding",
        cents, k = 5, nprobe = 2)
      .select("query_id", "vec_id", "cosine_sim").as[(Long, Long, Double)].collect().toSet
    assert(fromIndex == live, "the persisted index must answer identically to the live path")
    // the on-disk inverted-list layout: filtering to probed lists prunes
    // to those Hive partitions (PartitionFilters on centroid_id in the
    // scan — inputFiles() lists the unpruned relation, so read the plan)
    val minCent = lists.select(min("centroid_id")).as[Long].head()
    val plan = lists.filter($"centroid_id" === minCent)
      .queryExecution.executedPlan.toString
    assert(plan.contains(s"PartitionFilters: [isnotnull(centroid_id") &&
      plan.contains(s"= $minCent)"),
      s"a probed-list read must carry a centroid_id partition filter:\n$plan")
  }

  test("persisted IVF-PQ index: searchPqAssigned over readPqIndex equals the live path, " +
      "codebooks roundtrip exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_index").toString
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val cents = Ivf.seedCentroids(emb, "vec_id", "embedding", 8)
    val cb = Pq.seedCodebooks(emb, "vec_id", "embedding", m = 8, ks = 16, dim = 64)
    Ivf.writePqIndex(dir, emb, "vec_id", "embedding", cents, cb)
    val (loadedCents, lists, loadedCb) = Ivf.readPqIndex(spark, dir)
    assert(loadedCb.map(_.map(_.toSeq).toSeq).toSeq == cb.map(_.map(_.toSeq).toSeq).toSeq,
      "codebooks must roundtrip bit-for-bit")
    val fromIndex = Ivf.searchPqAssigned(queries, "query_id", "qvec",
        lists, "vec_id", "embedding", loadedCents, loadedCb, k = 5, nprobe = 2)
      .select("query_id", "vec_id", "cosine_sim").as[(Long, Long, Double)].collect().toSet
    val live = Ivf.searchPq(queries, "query_id", "qvec", emb, "vec_id", "embedding",
        cents, cb, k = 5, nprobe = 2)
      .select("query_id", "vec_id", "cosine_sim").as[(Long, Long, Double)].collect().toSet
    assert(fromIndex == live, "the persisted PQ index must answer identically to the live path")
  }

  test("approx_count_distinct stays within 5% of exact (the documented 100-TB alternative)") {
    val ev = Readers.table(spark, sf0001, "events")
    val (exact, approx) = ev.agg(
      countDistinct($"user_id").cast("double"),
      approx_count_distinct($"user_id").cast("double")
    ).as[(Double, Double)].head()
    assert(math.abs(approx - exact) / exact < 0.05)
  }
}
