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

  private val docGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(3, 25)
    docs <- Gen.listOfN(n, for {
      words <- Gen.choose(1, 30)
      toks <- Gen.listOfN(words, Gen.oneOf("alpha", "beta", "gamma", "delta", "ep", "ze"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("tokenBudget fill contract: min(budget,total) <= kept < budget + maxDoc") =
    forAll(docGen, Gen.choose(1L, 400L)) { (docs, budget) =>
      val df = docs.toDF("doc_id", "text")
      val toks = size(split($"text", " ")).cast("long")
      val kept = graft.ops.Sampling.tokenBudget(Seq(("s", df, budget)), $"doc_id", toks)
        .agg(coalesce(sum(size(split($"text", " "))).cast("long"), lit(0L))).as[Long].head()
      val sizes = docs.map(_._2.split(" ").length.toLong)
      val total = sizes.sum
      kept >= math.min(budget, total) && (kept == total || kept < budget + sizes.max)
    }

  property("repetition fractions are always in [0,1]") = forAll(docGen) { docs =>
    val df = docs.toDF("doc_id", "text")
    val stats = graft.ops.Repetition.gopherStats(df, "doc_id", "text", lineSep = " ")
    val cols = Seq("dup_line_frac", "dup_line_char_frac", "top_2gram_char_frac",
      "dup_5gram_char_frac")
    stats.filter(cols.map(c => col(c) < 0.0 || col(c) > 1.0).reduce(_ || _)).count() == 0L
  }

  property("decontaminate.clean is anti-monotone: result subset of corpus, empty bench = corpus") =
    forAll(docGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val bench = df.filter($"doc_id" % 3 === 0).select($"doc_id".as("bid"), $"text".as("btext"))
      val cleaned = graft.ops.Decontaminate.clean(df, "doc_id", $"text", bench, "bid", $"btext", 2)
        .select("doc_id").as[Long].collect().toSet
      val corpusIds = docs.map(_._1).toSet
      val emptyBench = bench.filter(lit(false))
      val keptAll = graft.ops.Decontaminate.clean(df, "doc_id", $"text",
        emptyBench, "bid", $"btext", 2).count()
      cleaned.subsetOf(corpusIds) && keptAll == docs.size.toLong
    }

  private val paraDocsGen: Gen[List[(Long, List[String])]] = for {
    n <- Gen.choose(1, 10)
    paras <- Gen.listOfN(n,
      Gen.choose(0, 4).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf("alpha", "beta", "gamma", "delta", ""))))
  } yield paras.zipWithIndex.map { case (ps, i) => ((i + 1).toLong, ps) }

  property("paragraph dedup keeps exactly the min-(id,pos) slot of every distinct paragraph") =
    forAll(paraDocsGen) { rows =>
      val df = rows.map { case (id, ps) => (id, ps.mkString("\n")) }.toDF("doc_id", "text")
      val got = graft.ops.Dedup.paragraphDedup(df, "doc_id", "text")
        .as[(Long, String)].collect().toMap
      // reference semantics in plain Scala (positions are pre-filter slots)
      val occurrences = rows.flatMap { case (id, ps) =>
        ps.zipWithIndex.collect { case (p, pos) if p.trim.nonEmpty => (p, (id, pos)) } }
      val winner = occurrences.groupBy(_._1).map { case (p, os) => (p, os.map(_._2).min) }
      val expect = rows.flatMap { case (id, ps) =>
        val kept = ps.zipWithIndex.collect {
          case (p, pos) if p.trim.nonEmpty && winner(p) == ((id, pos)) => p }
        if (kept.isEmpty) None else Some(id -> kept.mkString("\n"))
      }.toMap
      got == expect
    }

  private val bloomCaseGen: Gen[(List[(Long, String)], List[(Long, String)], Double)] = {
    val vocabC = Gen.oneOf((1 to 8).map(i => s"text $i"))
    val vocabB = Gen.oneOf((5 to 12).map(i => s"text $i")) // partial overlap
    for {
      nc <- Gen.choose(0, 25)
      cs <- Gen.listOfN(nc, vocabC)
      nb <- Gen.choose(1, 12)
      bs <- Gen.listOfN(nb, vocabB)
      fpp <- Gen.oneOf(0.01, 0.4) // tight and sloppy sketches must agree
    } yield (cs.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) },
      bs.zipWithIndex.map { case (t, i) => ((i + 101).toLong, t) }, fpp)
  }

  property("bloom-pruned incremental dedup == plain join classification at any fpp") =
    // NoShrink: the default tuple shrinker escapes the generator's domain
    // (fpp → 0.0, which BloomFilter.create correctly rejects)
    org.scalacheck.Prop.forAllNoShrink(bloomCaseGen) { case (corpus, batch, fpp) =>
      val cDf = corpus.toDF("doc_id", "text")
      val bDf = batch.toDF("doc_id", "text")
      // the op persists transiently; serialize with the cache-manager
      // assertions in OpsSpec/PipelineOpsSpec (suites share one session)
      val got = SparkSpec.session.synchronized {
        val res = graft.ops.Dedup.incrementalExactBloom(cDf, bDf, "doc_id", "text",
          expectedItems = math.max(1L, corpus.size.toLong), fpp = fpp)
        val s = res.as[(Long, String, Option[Long])].collect().toSet
        res.unpersist()
        s
      }
      val minOf = corpus.groupBy(_._2).map { case (t, rs) => (t, rs.map(_._1).min) }
      val expect = batch.map { case (id, t) =>
        minOf.get(t) match {
          case Some(cid) => (id, "exact_dup", Some(cid))
          case None => (id, "new", None)
        }
      }.toSet
      got == expect
    }

  // url-ish generator: valid scheme://[userinfo@]host[:port][/path][?query][#frag]
  // shapes interleaved with garbage, dot-heavy hosts, and tracking params
  private val urlGen: Gen[String] = {
    val hostG = Gen.oneOf("Example.COM", "news.example.co.uk", "shop.example.com.",
      "example.com..", "localhost", ".", "a.b.c")
    val valid = for {
      scheme <- Gen.oneOf("http", "HTTPS", "ftp")
      user <- Gen.oneOf("", "u:p@")
      host <- hostG
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/a/b", "/a/b/", "/x//")
      q <- Gen.oneOf("", "?b=2&a=1", "?utm_source=x", "?a=1&utm_b=2&ref=t", "?a=?b", "?")
      frag <- Gen.oneOf("", "#f", "#a#b")
    } yield s"$scheme://$user$host$port$path$q$frag"
    Gen.oneOf(valid, Gen.oneOf("", "not a url", "https:///x", "x://", "http:/half"))
  }

  property("urls.canonicalize is idempotent") =
    forAll(Gen.listOfN(20, urlGen)) { urls =>
      val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
      val once = graft.ops.Urls.canonicalize(col("url"))
      val twice = graft.ops.Urls.canonicalize(once)
      df.select(once.as("c1"), twice.as("c2"))
        .filter(not($"c1" <=> $"c2")).count() == 0L
    }

  property("html extraction never grows the text") =
    forAll(Gen.listOfN(10, Gen.oneOf(
      "<p>a</p><p>b</p>", "<script>x</script>tail", "plain",
      "&amp;lt; &nbsp;&quot;", "a   b\n\n\n\nc", "<div><ul><li>i</li></ul></div>",
      "<unclosed", "<!-- c --><br/><br/>"))) { htmls =>
      val df = htmls.zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("id", "html")
      graft.ops.Html.extractText(df, "html")
        .filter(length($"text_extracted") > length($"html")).count() == 0L
    }

  property("classifier centi sum matches the driver-side fingerprint replica") =
    forAll(Gen.listOfN(8, Gen.listOfN(12, Gen.oneOf(
      "the", "click", "buy", "now", "casino", "of", "in", "is", "qx7", "zz",
      "Lorem", "IPSUM", "rights", "reserved", "0", "!!")).map(_.mkString(" ")))) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = graft.ops.Classify.annotate(df, "text").orderBy("id")
        .select("clf_n_feats", "clf_centi").as[(Long, Long)].collect().toSeq
      val table = graft.ops.Classify.weightTable()
      val expect = texts.map { t =>
        val toks = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
        val fs = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
        (fs.size.toLong, fs.map(f => table.getOrElse(Math.floorMod(
          graft.functions.PositionalFingerprint.of(f),
          graft.ops.Classify.Buckets.toLong), 0L)).sum)
      }
      got == expect
    }

  property("ws-token + shingle kernels == regex/HOF forms on adversarial text") = {
    // adversarial alphabet: every Java-\s separator byte (incl. VT and FF,
    // where RE2's \s differs — the kernel must match the JAVA class),
    // multi-byte code points, repeated words (distinct-order check), and
    // ws runs at both ends
    val piece = Gen.oneOf(
      "a", "bb", "ccc", "a", "é", "漢漢", "😀", "x0!", "",
      " ", "\t", "\n", "", "\f", "\r", "  ", " \t\r\n ")
    forAll(Gen.listOfN(8, Gen.listOfN(24, piece).map(_.mkString))) { texts =>
      val df = (texts :+ "" :+ "   " :+ (null: String)).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val regexToks = filter(split($"text", "\\s+"), t => t =!= lit(""))
      val hofShingles = graft.Canonical.bindOnce(regexToks) { toks =>
        array_distinct(
          when(size(toks) >= 3,
            transform(sequence(lit(1), size(toks) - 2),
              i => concat_ws(" ", slice(toks, i, lit(3)))))
            .otherwise(array().cast("array<string>")))
      }
      val rows = df.select(
          graft.ops.TextStats.tokens($"text").as("kt"),
          regexToks.as("rt"),
          graft.ops.Dedup.shingles($"text", 3).as("ks"),
          hofShingles.as("hs"))
        .as[(Option[Seq[String]], Option[Seq[String]], Seq[String], Option[Seq[String]])]
        .collect().toSeq
      rows.forall { case (kt, rt, ks, hs) =>
        kt == rt && ks == hs.getOrElse(Seq.empty)
      }
    }
  }

  property("bpe kernel == portable HOF fold on adversarial text") = {
    // adversarial alphabet: merge-operand letters, merge OUTPUT digraphs as
    // raw text ("th" must re-merge identically), every Java-\s separator,
    // the scrubbed control chars, wide/non-ASCII code points
    val piece = Gen.oneOf(
      "t", "h", "e", "i", "n", "a", "d", "th", "the", "and", "ing", "wh",
      " ", "\t", "\n", "\u000b", "\f", "\r", "\u001f", "\u0001",
      "é", "漢", "😀", "x", "0", "!")
    forAll(Gen.listOfN(6, Gen.listOfN(30, piece).map(_.mkString))) { texts =>
      val df = (texts :+ "" :+ (null: String)).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = df.select(
          graft.ops.TextStats.bpeTokenCount($"text").as("k"),
          graft.ops.TextStats.bpeTokenCountFold($"text").as("f"))
        .as[(Long, Long)].collect().toSeq
      got.forall { case (k, f) => k == f }
    }
  }

  /** Independent driver-side replay of the bracketed replace-fold +
    * portable-id mapping (java String.replace IS the non-overlapping
    * left-to-right scan UTF8String.replace performs) — the tokenize
    * twin's reference semantics, kept separate from the kernel under
    * test.
    */
  private def refTokenIds(text: String): Seq[Long] = {
    if (text == null) return Seq.empty
    val S = "\u001f"
    val merges = graft.ops.TextStats.BpeMerges
    val clean = text.filterNot(c => c == '\u001f' || c == '\u0001')
    clean.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
      var s = w.codePoints().toArray
        .map(cp => S + new String(Character.toChars(cp)) + S).mkString
      merges.foreach { case (a, b) =>
        s = s.replace(S + a + S + S + b + S, S + a + b + S)
      }
      s.stripPrefix(S).stripSuffix(S).split(S + S).toSeq.map { sym =>
        if (sym.codePointCount(0, sym.length) == 1) sym.codePointAt(0).toLong
        else 0x110000L + merges.indexWhere(r => r._1 + r._2 == sym)
      }
    }
  }

  property("mojibake repair inverts the Latin-1 misdecode for any fixpoint string") = {
    // chars across ASCII, Latin-1 supplement (incl. the 0xC3/0xA9 range
    // that can SPELL mojibake), and genuine multi-byte code points
    val strGen = Gen.listOf(Gen.oneOf(
      Gen.choose(32, 126).map(_.toChar),
      Gen.choose(0xA0, 0xFF).map(_.toChar),
      Gen.oneOf('é', '–', '’', '中', '日', '™', 'λ', 'б'))).map(_.mkString)
    forAll(strGen) { s =>
      import org.apache.spark.unsafe.types.UTF8String
      def rep(x: String) = graft.functions.MojibakeKernel.repair(
        UTF8String.fromString(x)).toString
      // strings that are THEMSELVES repairable (they spell mojibake) are
      // inherently ambiguous — the repair legitimately keeps going; the
      // round-trip guarantee is for fixpoint inputs
      val isFixpoint = rep(s) == s
      !isFixpoint || rep(new String(s.getBytes("UTF-8"), "ISO-8859-1")) == s
    }
  }

  property("rrfFuse of a ranking with itself preserves its order; scores = round6(2/(c+rank))") = {
    // per-query rank permutations of a small id set: fusing a list with
    // itself must not reorder anything (monotone transform of rank) and
    // every fused score is exactly the doubled contribution
    val listGen: Gen[List[Long]] = Gen.choose(1, 6).flatMap(n =>
      Gen.pick(n, 11L to 20L).map(_.toList))
    forAll(listGen) { ids =>
      val ranked = ids.zipWithIndex.map { case (id, i) => (1L, id, (i + 1).toLong) }
      val df = ranked.toDF("q", "id", "rank")
      val fused = graft.ops.Similarity.rrfFuse(df, df, "q", "id", k = ids.size)
        .orderBy("rank").as[(Long, Long, Double, Long)].collect().toSeq
      def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      fused.map(_._2) == ids &&
        fused.zipWithIndex.forall { case ((_, _, s, rk), i) =>
          rk == i + 1 && s == r6(2.0 / (60.0 + (i + 1))) }
    }
  }

  property("bpe tokenize ids == driver-side fold replay; length == count") = {
    val piece = Gen.oneOf(
      "t", "h", "e", "i", "n", "a", "d", "th", "the", "and", "ing", "wh",
      " ", "\t", "\n", "\u000b", "\f", "\r", "\u001f", "\u0001",
      "é", "漢", "😀", "x", "0", "!")
    forAll(Gen.listOfN(6, Gen.listOfN(30, piece).map(_.mkString))) { texts =>
      val all = texts :+ "" :+ (null: String)
      val df = all.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val got = df.orderBy("id").select(
          graft.ops.TextStats.bpeTokenize($"text").as("ids"),
          graft.ops.TextStats.bpeTokenCount($"text").as("k"))
        .as[(Seq[Long], Long)].collect().toSeq
      got.zip(all).forall { case ((ids, k), t) =>
        ids == refTokenIds(t) && ids.length.toLong == k
      }
    }
  }
}
