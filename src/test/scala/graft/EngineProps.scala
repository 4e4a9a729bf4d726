package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters
import org.apache.spark.sql.functions._
import graft.analytics.Kpi

/** Property-based invariants (SURVEY §5.2.4) over generated event logs.
  * Few iterations (Spark job per sample), broad row generators.
  */
object EngineProps extends Properties("engine") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val eventGen: Gen[(Option[String], String, String, String)] = for {
    ship <- Gen.oneOf(Some("SH1"), Some("SH2"), Some("SH3"), None)
    code <- Gen.oneOf("PEC", "TRN", "LIV", "ANN")
    sub <- Gen.oneOf("REL", "APM", "OTH", "XXX")
    day <- Gen.choose(1, 28)
  } yield (ship, code, sub, f"2024-01-$day%02d 10:00:00")

  private val logGen: Gen[List[(Option[String], String, String, String)]] =
    Gen.listOfN(40, eventGen)

  private def toDf(rows: List[(Option[String], String, String, String)]) =
    rows.toDF("shipping_id", "event_code", "event_sub_code", "ts")
      .withColumn("event_date", to_timestamp($"ts"))
      .drop("ts")

  property("pivot produces at most one row per shipping_id") = forAll(logGen) { rows =>
    val labeled = Kpi.label(toDf(rows).filter($"event_code".isin("PEC", "TRN", "LIV")), Kpi.parcelRules)
    val pivoted = Kpi.pivotEarliest(labeled, "shipping_id", "event_type", "event_date",
      Seq("SENT" -> "sent_time", "DELIVERED_TO_POINT" -> "delivered_time", "PICKED_UP" -> "picked_time"))
    pivoted.groupBy("shipping_id").count().filter($"count" > 1).count() == 0
  }

  property("hand-rolled min(when) pivot == idiomatic groupBy().pivot()") = forAll(logGen) { rows =>
    val labels = Seq("SENT" -> "sent_time", "DELIVERED_TO_POINT" -> "delivered_time",
      "PICKED_UP" -> "picked_time")
    val labeled = Kpi.label(toDf(rows).filter($"event_code".isin("PEC", "TRN", "LIV")), Kpi.parcelRules)
    val a = Kpi.pivotEarliest(labeled, "shipping_id", "event_type", "event_date", labels)
      .collect().map(_.toSeq).toSet
    val b = Kpi.pivotIdiomatic(labeled, "shipping_id", "event_type", "event_date", labels)
      .select("shipping_id", "sent_time", "delivered_time", "picked_time")
      .collect().map(_.toSeq).toSet
    a == b
  }

  property("total_packages counts ids with >=1 filtered event; avg skips null durations (§2.12.2)") =
    forAll(logGen) { rows =>
      val df = toDf(rows)
      val kpi = Kpi.headline(spark, df).collect().head
      val expectedTotal = rows
        .filter(r => r._1.isDefined && Set("PEC", "TRN", "LIV").contains(r._2))
        .map(_._1.get).toSet.size
      kpi.total_packages == expectedTotal
    }

  property("dedup is idempotent") = forAll(logGen) { rows =>
    val df = toDf(rows)
    val once = df.dropDuplicates(Seq("shipping_id", "event_code"))
    once.dropDuplicates(Seq("shipping_id", "event_code")).count() == once.count()
  }

  property("union+distinct is commutative") = forAll(logGen, logGen) { (r1, r2) =>
    val (a, b) = (toDf(r1), toDf(r2))
    val ab = a.union(b).distinct().collect().map(_.toSeq).toSet
    val ba = b.union(a).distinct().collect().map(_.toSeq).toSet
    ab == ba
  }

  private val fracsGen: Gen[List[Double]] = for {
    n <- Gen.choose(2, 5)
    ws <- Gen.listOfN(n, Gen.choose(1, 10))
  } yield ws.map(_.toDouble / ws.sum)

  property("hashSplit partitions: every row lands in exactly one named split") =
    forAll(logGen, fracsGen) { (rows, fracs) =>
      val df = toDf(rows).withColumn("id", monotonically_increasing_id())
      val splits = fracs.zipWithIndex.map { case (f, i) => s"s$i" -> f }
      // normalize rounding drift so the require() contract holds exactly
      val norm = splits.init :+ (splits.last._1 -> (1.0 - splits.init.map(_._2).sum))
      val out = graft.ops.Sampling.hashSplit(df, $"event_code", norm)
      out.count() == rows.size &&
        out.filter(!$"split".isin(norm.map(_._1): _*)).count() == 0
    }

  property("stratifiedExact picks ceil(frac*n) per stratum for any frac") =
    forAll(logGen, Gen.choose(1, 10)) { (rows, tenths) =>
      val frac = tenths / 10.0
      val df = toDf(rows).withColumn("id", monotonically_increasing_id())
      val got = graft.ops.Sampling
        .stratifiedExact(df, $"event_code", $"id", frac)
        .groupBy("event_code").count().as[(String, Long)].collect().toMap
      val want = rows.groupBy(_._2).map { case (k, v) => k -> math.ceil(v.size * frac).toLong }
      want.forall { case (k, n) => got.getOrElse(k, 0L) == n }
    }
}
