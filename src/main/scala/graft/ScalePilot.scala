package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Packing, Scd, Sessionize, Similarity, TextStats}
import graft.sources.Readers

/** Empirical scaling pilot: run the heavy operator families at 1× and N×
  * the sf0.1 data volume and report the wall-clock ratio. Near-linear
  * ratios (≈N on a fixed-core machine) are the local evidence that the
  * plans scale by partitioning — no driver collection, no quadratic
  * blow-up, no shuffle whose cost grows super-linearly with input.
  *
  * The N× tables are key-shifted copies: ids are offset per copy so group
  * cardinality grows N× while per-group size stays constant (the shape a
  * bigger day-range of real data would have). Document text is token-
  * prefixed per copy so near-dup structure is replicated, not crossed —
  * otherwise every doc would near-match its N−1 clones and pair work
  * would grow quadratically in N by construction rather than by data.
  */
object ScalePilot {

  private def buildScaled(spark: SparkSession, sfDir: String, out: String, copies: Int,
      tables: Set[String]): Unit = {
    val fs = java.nio.file.Paths.get(out)
    val marker = fs.resolve(s"_built_${tables.toSeq.sorted.mkString("_")}")
    if (java.nio.file.Files.exists(marker)) return

    def shifted(name: String, shift: (DataFrame, Int) => DataFrame): Unit = {
      if (!tables.contains(name)) return
      val baseDf = Readers.table(spark, sfDir, name)
      val union = (0 until copies).map(i => shift(baseDf, i)).reduce(_ unionByName _)
      union.write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    shifted("lineitem", (df, i) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100000000L)))
    shifted("orders", (df, i) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 100000000L))
      .withColumn("o_custkey", col("o_custkey") + lit(i.toLong * 100000000L)))
    shifted("events", (df, i) => df
      .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L))
      .withColumn("user_id", col("user_id") + lit(i.toLong * 1000000000L)))
    shifted("documents", (df, i) => df
      .withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000000L))
      .withColumn("text", concat_ws(" ",
        transform(split(col("text"), "\\s+"), t => concat(lit(s"c${i}_"), t)))))
    shifted("embeddings", (df, i) => df
      .withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000000L)))
    if (!java.nio.file.Files.exists(marker)) java.nio.file.Files.createFile(marker)
  }

  def main(args: Array[String]): Unit = {
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "8").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // "all" = the round-1 cross-family pilot; "dedup" = the dedup/ANN
    // family only (documents + embeddings), including a capped-vs-uncapped
    // twin that shows the hot-bucket guards cost nothing on unskewed data
    val family = sys.env.getOrElse("SPARK_GRAFT_SCALE_FAMILY", "all")
    val out = s"/root/repo/target/scale_x$copies"
    val spark = Sessions.local("graft-scale-pilot")

    val tables: Set[String] =
      if (family == "dedup") Set("documents", "embeddings")
      else if (family == "pipeline") Set("events", "documents")
      else Set("lineitem", "orders", "events", "documents", "embeddings")
    buildScaled(spark, sfDir, out, copies, tables)
    // 1× read through the same plain-parquet path as the N× tables so the
    // only difference is volume (Readers.table's events ns-shim applies
    // only to the original testdata files)
    val x1Dir = s"/root/repo/target/scale_x1"
    buildScaled(spark, sfDir, x1Dir, 1, tables)

    def tbl(dir: String, n: String) = spark.read.parquet(s"$dir/$n.parquet")

    def dedupQueries(dir: String): Seq[(String, () => DataFrame)] = Seq(
      "minhash_lsh" -> (() => {
        val docs = tbl(dir, "documents")
        val sig = Dedup.minhashSignatures(docs, "doc_id", col("text"), 3, 64)
        val cand = Dedup.lshCandidates(sig, "doc_id", 16, 4)
        Dedup.jaccardVerify(docs, "doc_id", col("text"), 3, cand, 0.5)
      }),
      "minhash_lsh_uncapped" -> (() => {
        val docs = tbl(dir, "documents")
        val sig = Dedup.minhashSignatures(docs, "doc_id", col("text"), 3, 64)
        val cand = Dedup.lshCandidates(sig, "doc_id", 16, 4, maxBucket = Int.MaxValue)
        Dedup.jaccardVerify(docs, "doc_id", col("text"), 3, cand, 0.5)
      }),
      "ngram_jaccard" -> (() => Dedup.ngramJaccardPairs(
        tbl(dir, "documents"), "doc_id", col("text"), 3, 0.5)),
      "simhash_pairs" -> (() => {
        val sig = Dedup.simhash(tbl(dir, "documents"), "doc_id", col("text"))
        Dedup.simhashPairs(sig, "doc_id", 6)
      }),
      "sim_topk" -> (() => Similarity.bruteForceTopK(
        tbl(dir, "embeddings").limit(10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
        "query_id", "qvec",
        tbl(dir, "embeddings"), "vec_id", "embedding", 5)),
      "sim_topk_lsh_mp" -> (() => Similarity.lshBucketTopK(
        tbl(dir, "embeddings").limit(10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
        "query_id", "qvec",
        tbl(dir, "embeddings"), "vec_id", "embedding", 5,
        numPlanes = 3, dim = 64, multiProbe = true)))

    def allQueries(dir: String): Seq[(String, () => DataFrame)] = Seq(
      "group_agg" -> (() => tbl(dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 4).as("rev"),
          round(avg(col("l_quantity")), 4).as("aq"))),
      "join_agg" -> (() => tbl(dir, "lineitem")
        .join(tbl(dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 4).as("rev"))),
      "dedup_keyed" -> (() => Dedup.exactKeepFirst(
        tbl(dir, "lineitem"), Seq("l_orderkey", "l_linenumber"), "l_suppkey")),
      "sessionize" -> (() => Sessionize.bySessionWindow(
        tbl(dir, "events"), "user_id", "ts", "30 minutes", Some("value"))),
      "minhash_lsh" -> (() => {
        val docs = tbl(dir, "documents")
        val sig = Dedup.minhashSignatures(docs, "doc_id", col("text"), 3, 64)
        val cand = Dedup.lshCandidates(sig, "doc_id", 16, 4)
        Dedup.jaccardVerify(docs, "doc_id", col("text"), 3, cand, 0.5)
      }),
      "sim_topk" -> (() => Similarity.bruteForceTopK(
        tbl(dir, "embeddings").limit(10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
        "query_id", "qvec",
        tbl(dir, "embeddings"), "vec_id", "embedding", 5))
    )

    // round-2 pipeline additions: packing / SCD2 / CMS are each one
    // shuffle (or none) so their ratios should sit at the linear floor
    def pipelineQueries(dir: String): Seq[(String, () => DataFrame)] = Seq(
      "seq_pack" -> (() => Packing.concatChunk(
        tbl(dir, "documents"), "doc_id",
        size(TextStats.tokens(col("text"))), budget = 256, shards = 64)),
      "scd2_history" -> (() => Scd.fromHistory(
        tbl(dir, "events").select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
        Seq("user_id"), "ts", Seq("event_type"), Seq("event_id"))),
      "cms_sketch" -> (() => tbl(dir, "documents")
        .select(explode(TextStats.tokens(col("text"))).as("term"))
        .agg(count_min_sketch(col("term"), lit(1e-3), lit(0.99), lit(7)).as("sk"))))

    def queries(dir: String): Seq[(String, () => DataFrame)] =
      if (family == "dedup") dedupQueries(dir)
      else if (family == "pipeline") pipelineQueries(dir)
      else allQueries(dir)

    def timeAll(dir: String): Map[String, Double] = queries(dir).map { case (name, fn) =>
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap

    timeAll(x1Dir) // warm-up: JIT + codegen compile off the clock
    // interleaved passes + per-query min: the shared host has multi-second
    // ambient spikes; min-of-3 isolates the data-volume effect
    val passes = (1 to 3).map(_ => (timeAll(x1Dir), timeAll(out)))
    def minOf(sel: ((Map[String, Double], Map[String, Double])) => Map[String, Double]) =
      passes.map(sel).reduce((a, b) => a.map { case (k, v) => k -> math.min(v, b(k)) })
    val t1 = minOf(_._1)
    val tn = minOf(_._2)
    val names = queries(x1Dir).map(_._1)
    val parts = names.map { n =>
      f""""$n":{"x1":${t1(n)}%.2f,"x$copies":${tn(n)}%.2f,"ratio":${tn(n) / t1(n)}%.2f}"""
    }
    println(s"""{"metric":"scale_pilot","copies":$copies,${parts.mkString(",")}}""")
    spark.stop()
  }
}
