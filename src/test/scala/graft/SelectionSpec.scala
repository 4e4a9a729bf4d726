package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops._
import graft.etl.Export

/** Round-8 selection/ordering operators: per-domain token caps, DSIR
  * importance scoring, deterministic epoch shuffles and token-balanced
  * shard assignment.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  // — groupTokenCap ————————————————————————————————————————————————————————

  test("groupTokenCap: greedy prefix semantics per group — cap <= kept < cap + max doc") {
    val cap = 4000L
    val kept = Sampling.groupTokenCap(docs, $"source", $"doc_id", $"n_chars", cap)
    val perGroup = kept.groupBy($"source")
      .agg(sum($"n_chars").as("kept"), max($"n_chars").as("mx"))
      .as[(String, Long, Long)].collect()
    val totals = docs.groupBy($"source").agg(sum($"n_chars")).as[(String, Long)]
      .collect().toMap
    assert(perGroup.length == totals.size, "every group keeps at least one doc")
    perGroup.foreach { case (src, keptTok, _) =>
      if (totals(src) <= cap) assert(keptTok == totals(src), s"$src under cap kept whole")
      else {
        val mxAll = docs.filter($"source" === src).agg(max($"n_chars")).as[Long].head()
        assert(keptTok >= cap - mxAll + 1 && keptTok < cap + mxAll,
          s"$src kept $keptTok outside greedy band around $cap (max doc $mxAll)")
      }
    }
  }

  test("groupTokenCap: bit-identical to the single-window per-group prefix sum") {
    val cap = 4000L
    val fp = graft.functions.TextFunctions.fingerprint($"doc_id".cast("string"))
    val w = Window.partitionBy($"source")
      .orderBy(pmod(fp, lit(256L)), fp, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = docs
      .withColumn("__bef", coalesce(sum($"n_chars").over(w), lit(0L)))
      .filter($"__bef" < cap).drop("__bef")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val got = Sampling.groupTokenCap(docs, $"source", $"doc_id", $"n_chars", cap)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got == naive)
    // and stable under an adversarial repartition
    val got2 = Sampling.groupTokenCap(docs.repartition(13, $"lang"),
      $"source", $"doc_id", $"n_chars", cap)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got2 == naive)
  }

  // — DSIR ————————————————————————————————————————————————————————————————

  test("dsir: English-target table scores English documents above the rest") {
    val table = Dsir.featureTable(docs.filter($"lang" === "en"), docs)
    assert(table.size == Dsir.Buckets, "dense sketch-sized table")
    val scored = Dsir.annotate(docs, table)
      .select($"lang", $"dsir_centi", $"dsir_n_toks")
    val means = scored.filter($"dsir_n_toks" > 0)
      .withColumn("per_tok", $"dsir_centi".cast("double") / $"dsir_n_toks")
      .groupBy(($"lang" === "en").as("is_en")).agg(avg($"per_tok").as("m"))
      .as[(Boolean, Double)].collect().toMap
    // the synthetic corpus shares most vocabulary across langs, so the
    // separation is small but strictly positive and deterministic
    assert(means(true) > means(false),
      s"per-token centi-llr should separate en (${means(true)}) from rest (${means(false)})")
  }

  test("dsir: annotate is an exact integer sum — stable under repartition") {
    val table = Dsir.featureTable(docs.filter($"lang" === "en"), docs)
    val a = Dsir.annotate(docs, table).select($"doc_id", $"dsir_centi")
      .as[(Long, Long)].collect().sorted.toSeq
    val b = Dsir.annotate(docs.repartition(17), table).select($"doc_id", $"dsir_centi")
      .as[(Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("dsir: resample keeps ~frac of docs, all kept scores above all dropped") {
    val table = Dsir.featureTable(docs.filter($"lang" === "en"), docs)
    val kept = Dsir.resample(docs, table, 0.3)
    val n = docs.count()
    val k = kept.count()
    assert(math.abs(k - 0.3 * n) <= 0.05 * n, s"kept $k of $n at frac 0.3")
    val minKept = kept.agg(min($"dsir_centi")).as[Long].head()
    val scored = Dsir.annotate(docs, table)
    val dropped = scored.join(kept.select($"doc_id"), Seq("doc_id"), "left_anti")
    val maxDropped = dropped.agg(max($"dsir_centi")).as[Long].head()
    assert(minKept > maxDropped || k == n,
      s"threshold cut: min kept $minKept vs max dropped $maxDropped")
  }

  test("dsir: feature table is empty-target-safe (all-smoothed ratios)") {
    val table = Dsir.featureTable(docs.filter($"lang" === "zz"), docs)
    assert(table.size == Dsir.Buckets)
    // with tc=0 everywhere the llr is log10(1/(0+B)) - log10((rc+1)/(R+B)):
    // finite for every bucket (no NaN/overflow), and <= 0 wherever rc >= 0
    assert(table.values.forall(v => v <= 300 && v >= -2000), s"bounded: ${table.values.max}")
  }

  // — trainOrder ——————————————————————————————————————————————————————————

  test("trainOrder: a permutation — ord 1..n once each, shards balanced within 1") {
    val out = Export.trainOrder(docs, "doc_id", "ep0", 8).cache()
    val n = docs.count()
    val ords = out.select($"ord").as[Long].collect().sorted.toSeq
    assert(ords == (1L to n).toSeq, "ord is exactly 1..n")
    val sizes = out.groupBy($"shard").count().as[(Long, Long)].collect().toMap
    assert(sizes.keySet == (0L until 8L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1, s"balanced: $sizes")
    // pos enumerates 0..size-1 within each shard
    val posOk = out.groupBy($"shard").agg(min($"pos"), max($"pos"), count(lit(1)))
      .as[(Long, Long, Long, Long)].collect()
    posOk.foreach { case (s, mn, mx, c) =>
      assert(mn == 0L && mx == c - 1, s"shard $s positions 0..${c - 1}") }
    out.unpersist()
    ()
  }

  test("trainOrder: matches the single-window global rank bit for bit") {
    val fp = graft.functions.TextFunctions.fingerprint(
      concat(lit("ep0"), lit(":"), $"doc_id".cast("string")))
    val naive = docs.withColumn("__fp", fp)
      .withColumn("ord", row_number().over(
        Window.orderBy(pmod($"__fp", lit(256L)), $"__fp", $"doc_id")).cast("long"))
      .select($"doc_id", $"ord").as[(Long, Long)].collect().sorted.toSeq
    val got = Export.trainOrder(docs, "doc_id", "ep0", 8)
      .select($"doc_id", $"ord").as[(Long, Long)].collect().sorted.toSeq
    assert(got == naive)
  }

  test("trainOrder: a new seed is a genuinely different permutation") {
    val a = Export.trainOrder(docs, "doc_id", "ep0", 8)
      .select($"doc_id", $"ord").as[(Long, Long)].collect().toMap
    val b = Export.trainOrder(docs, "doc_id", "ep1", 8)
      .select($"doc_id", $"ord").as[(Long, Long)].collect().toMap
    val moved = a.count { case (id, o) => b(id) != o }
    assert(moved > a.size / 2, s"only $moved of ${a.size} docs moved between epochs")
  }

  test("trainOrderTokenShards: shard token loads within one max-doc of the ideal slice") {
    val out = Export.trainOrderTokenShards(docs, "doc_id", "ep0", 8, $"n_chars").cache()
    val loads = out.groupBy($"shard").agg(sum($"n_chars").as("tok"))
      .as[(Long, Long)].collect().toMap
    assert(loads.keySet == (0L until 8L).toSet)
    val total = docs.agg(sum($"n_chars")).as[Long].head()
    val mxDoc = docs.agg(max($"n_chars")).as[Long].head()
    val ideal = total.toDouble / 8
    loads.values.foreach(l =>
      assert(math.abs(l - ideal) < mxDoc + 1, s"load $l vs ideal $ideal (max doc $mxDoc)"))
    // contiguity: shard is monotone non-decreasing along ord
    val seq = out.orderBy($"ord").select($"shard").as[Long].collect().toSeq
    assert(seq == seq.sorted, "token shards are contiguous ranges of the order")
    out.unpersist()
    ()
  }
}
