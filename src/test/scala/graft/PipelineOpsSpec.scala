package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Round-3 pipeline-bookkeeping operators: paragraph dedup, normalized
  * dedup, Bloom-pruned incremental dedup, snapshot diff.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def sqlCacheEmpty: Boolean = {
    val ss = spark.sharedState
    val cm = ss.getClass.getMethod("cacheManager").invoke(ss)
    cm.getClass.getMethod("isEmpty").invoke(cm).asInstanceOf[Boolean]
  }

  test("nfc normalize: decomposed and precomposed forms hash together after canonical()") {
    val df = Seq((1L, "Café  x"), (2L, "café x"), (3L, "other")).toDF("id", "text")
    val canon = df.select(TextStats.canonical($"text")).as[String].collect().toSeq
    assert(canon(0) == canon(1) && canon(0) == "café x", s"canonical forms: $canon")
    val got = Dedup.exactNormalized(df, "text", "id")
      .orderBy("keep_id").select("keep_id", "dup_count").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (3L, 1L)))
    // keepFirst keeps the ORIGINAL text of the smallest id, not the canonical form
    val kept = Dedup.exactNormalizedKeepFirst(df, "text", "id")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(kept == Seq((1L, "Café  x"), (3L, "other")))
  }

  test("nfc normalize: null flows through, canonical(null) stays null") {
    val df = Seq((1L, null: String), (2L, "a")).toDF("id", "text")
    val canon = df.orderBy("id").select(TextStats.canonical($"text")).collect()
    assert(canon(0).isNullAt(0) && canon(1).getString(0) == "a")
    assert(Dedup.exactNormalized(df, "text", "id").count() == 2,
      "null and 'a' are distinct canonical groups")
  }

  test("paragraph dedup: corpus-wide (id, pos) survivor election and reassembly") {
    val df = Seq(
      (1L, "A\nB"),
      (2L, "B\nC"),
      (3L, "B"),      // every paragraph already seen → doc drops out
      (4L, "\n\nD")   // empty paragraphs filtered before election
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "A\nB"), (2L, "C"), (4L, "D")), s"got: $got")
  }

  test("paragraph dedup: earlier position wins within one document") {
    val df = Seq((1L, "X\nX\nY")).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(df, "doc_id", "text").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "X\nY")), s"intra-doc duplicate paragraph must collapse: $got")
  }

  test("bloom incremental dedup: classification is exact despite sketch false positives") {
    val corpus = (1L to 50L).map(i => (i, s"corpus doc number $i")).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "corpus doc number 7"),   // exact dup
      (102L, "corpus doc number 7"),   // same dup twice in one batch
      (103L, "brand new content a"),
      (104L, "brand new content b")
    ).toDF("doc_id", "text")
    // fpp 0.4: false positives near-certain across 50 keys — the verify
    // join must still classify the new docs as new
    val got = Dedup.incrementalExactBloom(corpus, batch, "doc_id", "text",
      expectedItems = 50L, fpp = 0.4)
    val rows = got.orderBy("doc_id").as[(Long, String, Option[Long])].collect().toSeq
    got.unpersist()
    assert(rows == Seq(
      (101L, "exact_dup", Some(7L)),
      (102L, "exact_dup", Some(7L)),
      (103L, "new", None),
      (104L, "new", None)), s"got: $rows")
    assert(sqlCacheEmpty, "incrementalExactBloom must release the corpus hash cache")
  }

  test("bloom incremental dedup: no false negatives — every true dup is found at tight fpp") {
    val corpus = (1L to 500L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    val batch = (1L to 500L).map(i => (i + 10000L, s"doc $i body")).toDF("doc_id", "text")
    val got = Dedup.incrementalExactBloom(corpus, batch, "doc_id", "text",
      expectedItems = 500L, fpp = 0.01)
    val nDup = got.filter($"status" === "exact_dup").count()
    got.unpersist()
    assert(nDup == 500L, s"all 500 copies must classify exact_dup, got $nDup")
  }

  test("snapshot diff: all four statuses, hash-based change detection, summary roll-up") {
    val oldDf = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null: String)).toDF("id", "text")
    val newDf = Seq((2L, "b"), (3L, "c2"), (4L, null: String), (5L, "e")).toDF("id", "text")
    val got = Snapshot.diff(oldDf, newDf, "id", Seq("text"))
      .orderBy("id").select("id", "status").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "removed"), (2L, "unchanged"), (3L, "changed"),
      (4L, "unchanged"), (5L, "added")), s"got: $got")
    val sum = Snapshot.summary(oldDf, newDf, "id", Seq("text"))
      .orderBy("status").as[(String, Long)].collect().toSeq
    assert(sum == Seq(("added", 1L), ("changed", 1L), ("removed", 1L), ("unchanged", 2L)))
  }

  test("snapshot diff: multi-column content uses the alias-proof digest") {
    val oldDf = Seq((1L, "x§0y", "z")).toDF("id", "a", "b")
    val newDf = Seq((1L, "x", "y§0z")).toDF("id", "a", "b")
    val got = Snapshot.diff(oldDf, newDf, "id", Seq("a", "b"))
      .select("status").as[String].head()
    assert(got == "changed", "column-boundary shift must register as a change")
  }
}
