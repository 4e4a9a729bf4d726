package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.etl.{Dims, SurrogateKeys}

/** The reference's semantic fine print (SURVEY §2.12) pinned on tiny
  * literal frames — these behaviors are preserved bug-for-bug.
  */
class SemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("concat_ws skips null segments instead of nulling the key (§2.12.7)") {
    val df = Seq((Some("A"), Some("B")), (None, Some("X")), (None: Option[String], None: Option[String]))
      .toDF("brand", "sign")
    val keys = df.select(concat_ws("_", $"brand", $"sign")).as[String].collect()
    assert(keys.toSeq == Seq("A_B", "X", ""))
  }

  test("when-chain without otherwise yields null for unmatched rows (F11)") {
    val df = Seq("PEC", "TRN", "ZZZ").toDF("code")
    val labeled = df.select(when($"code" === "PEC", "SENT").when($"code" === "TRN", "DEL").as("l"))
    assert(labeled.as[Option[String]].collect().toSeq == Seq(Some("SENT"), Some("DEL"), None))
  }

  test("datediff is whole-calendar-day, negative allowed, null-propagating (F14)") {
    val df = Seq(
      ("2024-01-05 23:59:00", "2024-01-06 00:01:00"), // crosses midnight → 1
      ("2024-01-05 00:00:00", "2024-01-03 12:00:00"), // negative
      ("2024-01-05 00:00:00", null)
    ).toDF("a", "b")
    val got = df.select(datediff(to_date($"b"), to_date($"a"))).as[Option[Int]].collect()
    assert(got.toSeq == Seq(Some(1), Some(-2), None))
  }

  test("4-conjunct equi-join is null-sensitive: null keys never match, even vs a null dim row (J4)") {
    val probe = Seq(("c1", "d1", Some("n1"), "s1"), ("c1", "d1", None, "s1"))
      .toDF("c", "d", "n", "s")
    val dim = probe.dropDuplicates().withColumn("id", monotonically_increasing_id())
    val joined = probe.as("p").join(dim.as("m"),
      $"p.c" === $"m.c" && $"p.d" === $"m.d" && $"p.n" === $"m.n" && $"p.s" === $"m.s", "left")
    val ids = joined.select($"p.n", $"m.id").collect()
    assert(ids.find(r => r.get(0) == "n1").exists(!_.isNullAt(1)), "non-null keys match")
    assert(ids.find(_.isNullAt(0)).exists(_.isNullAt(1)),
      "null key must NOT match the all-null dim row (SQL = semantics)")
  }

  test("deterministic dedup picks the row_number-1 row; parity dropDuplicates keeps one arbitrary row (A6)") {
    val df = Seq(("k", "b"), ("k", "a"), ("j", "z")).toDF("key", "v")
    val det = Dims.dedupByKey(df, Seq("key"), Seq(col("v")), parity = false)
      .orderBy("key").as[(String, String)].collect()
    assert(det.toSeq == Seq(("j", "z"), ("k", "a")), "tiebreak by v ascending")
    val par = Dims.dedupByKey(df, Seq("key"), Seq(col("v")), parity = true)
    assert(par.count() == 2)
  }

  test("union is positional (bag) and distinct dedups whole rows (U1)") {
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq((2, "y")).toDF("k", "v")
    assert(a.union(b).union(a).count() == 3)
    assert(a.union(b).union(a).distinct().count() == 2)
  }

  test("dayofweek is 1=Sunday..7=Saturday (F9)") {
    val got = Seq("2024-01-07").toDF("d") // a Sunday
      .select(dayofweek(to_date($"d"))).as[Int].head()
    assert(got == 1)
  }

  test("deterministic surrogate keys distinguish (null,'X') from ('X',) (§2.12.7 fix)") {
    val df = Seq((Some("X"), None: Option[String]), (None: Option[String], Some("X")))
      .toDF("a", "b")
    val keys = df.select(SurrogateKeys.key(SurrogateKeys.Deterministic, $"a", $"b")).as[String].collect()
    assert(keys(0) != keys(1))
  }

  test("uuid parity keys differ across separate plan analyses (§2.12.1)") {
    // Spark fixes the uuid() seed when a DataFrame is analyzed, so two
    // builds of the "same" dim from the same lineage (the reference's
    // join-plan vs write-plan situation) get different seeds → different
    // surrogate keys → dangling FKs. Deterministic sha2 keys don't care.
    def mk = Seq("x").toDF("v").withColumn("id", SurrogateKeys.key(SurrogateKeys.UuidParity))
    assert(mk.select("id").as[String].head() != mk.select("id").as[String].head(),
      "separate analyses get separate seeds")
    def mkDet = Seq("x").toDF("v")
      .withColumn("id", SurrogateKeys.key(SurrogateKeys.Deterministic, $"v"))
    assert(mkDet.select("id").as[String].head() == mkDet.select("id").as[String].head())
  }
}
