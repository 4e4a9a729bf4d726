package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Canonical.bindOnce
import graft.functions.VectorFunctions.vec_dot

/** Product quantization (Jégou et al. '11) — the memory-compression path
  * for embedding search at 100 TB: a dim-`D` float vector (4·D bytes)
  * compresses to `m` one-byte codes by splitting into `m` subspaces and
  * snapping each subvector to its nearest codeword from a per-subspace
  * codebook of `ks` entries. At m=8 over dim-64 floats that is 32× less
  * candidate-scan I/O than [[Similarity.bruteForceTopK]] reads, and 4×
  * less than the int8 path ([[Similarity.quantizeInt8]]) — the difference
  * between an embedding index that fits executor memory and one that
  * doesn't.
  *
  * Search is asymmetric distance computation (ADC): each query computes a
  * LOOKUP TABLE of m·ks partial dot products ONCE (query subvector ×
  * every codeword), and every candidate then scores with m table lookups
  * instead of D multiplies. The scored value approximates the raw DOT
  * product (the MIPS convention); compose with an exact rerank
  * ([[adcTopKRerank]]) when true-cosine order matters.
  *
  * Codebooks are DRIVER-SIDE literals by design, like
  * [[Similarity.hyperplanes]]: m·ks·(D/m) doubles (= D·ks, a few KB) ride
  * into the plan as one `typedlit`, so encode and ADC are shuffle-free
  * scans — no join touches the corpus until the top-k window.
  * [[seedCodebooks]] (subvectors of the ks lowest-id vectors) is the
  * deterministic oracle-checkable quantizer; [[train]] refines it with
  * per-subspace Lloyd iterations — the production path, exactly the
  * [[Ivf.seedCentroids]]/[[Ivf.train]] split one level down.
  *
  * All distances/dots round half-up at 6 decimals before any argmin or
  * ranking (ties → lower code / lower id), so encode → LUT → ADC → rank
  * is deterministic and engine-replayable end to end (probe x77).
  */
object Pq {

  /** cb(j)(k)(t): subspace j, codeword k, element t — m × ks × (dim/m). */
  type Codebooks = Array[Array[Array[Double]]]

  /** Deterministic degenerate codebooks: subspace j's codewords are the
    * j-th subvectors of the `ks` lowest-id corpus vectors.
    */
  def seedCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ks: Int, dim: Int): Codebooks = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val ds = dim / m
    val vecs = corpus.orderBy(col(idCol)).limit(ks)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(vecs.length == ks, s"corpus has ${vecs.length} rows, need ks=$ks for seeding")
    Array.tabulate(m)(j => Array.tabulate(ks)(k => vecs(k).slice(j * ds, (j + 1) * ds)))
  }

  private def cbLit(cb: Codebooks): Column =
    typedlit(cb.map(_.map(_.toSeq).toSeq).toSeq)

  /** Encode every vector to its `m` nearest-codeword codes (squared-L2
    * per subspace, round-6 then tie → lower code). Shuffle-free: one
    * interpreted-HOF scan with the codebooks as a literal; every
    * subexpression a lambda reuses is [[bindOnce]]-bound (slices and
    * codebook rows would otherwise re-evaluate per codeword).
    */
  /** The encode expression alone — `m` nearest-codeword codes for a
    * vector column (squared-L2 per subspace, round-6 then tie → lower
    * code); composable onto any frame (e.g. [[Ivf.searchPq]]'s assigned
    * inverted lists).
    */
  def codesColumn(vec: Column, cb: Codebooks): Column = {
    val (m, ks, ds) = (cb.length, cb(0).length, cb(0)(0).length)
    bindOnce(vec.cast("array<double>")) { v =>
      bindOnce(cbLit(cb)) { c =>
        transform(sequence(lit(0), lit(m - 1)), j =>
          bindOnce(slice(v, j * lit(ds) + 1, lit(ds))) { sub =>
            bindOnce(element_at(c, j + 1)) { cwj =>
              array_min(transform(sequence(lit(0), lit(ks - 1)), k =>
                struct(
                  round(aggregate(zip_with(sub, element_at(cwj, k + 1),
                    (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x), 6).as("d"),
                  k.as("c"))))
                .getField("c")
            }
          })
      }
    }
  }

  def encode(corpus: DataFrame, idCol: String, vecCol: String, cb: Codebooks): DataFrame =
    corpus.select(col(idCol), codesColumn(col(vecCol), cb).as("codes"))

  /** ADC top-k over a PQ-encoded corpus: per query, one m·ks LUT, then m
    * lookups per candidate; rank by approximate dot (desc, id asc).
    * Queries broadcast with their LUTs — the corpus side streams codes
    * and never shuffles before the per-query top-k window.
    */
  /** The per-query ADC lookup table — `m × ks` partial dots of the query
    * subvectors against every codeword. Pdots stay UNROUNDED: the only
    * rounding is the final ADC round-6, so a candidate whose codes
    * reconstruct its vector exactly (e.g. a codebook seed) scores its
    * true round-6 dot.
    */
  def lutColumn(qvec: Column, cb: Codebooks): Column = {
    val (m, _, ds) = (cb.length, cb(0).length, cb(0)(0).length)
    bindOnce(qvec.cast("array<double>")) { v =>
      bindOnce(cbLit(cb)) { c =>
        transform(sequence(lit(0), lit(m - 1)), j =>
          bindOnce(slice(v, j * lit(ds) + 1, lit(ds))) { sub =>
            transform(element_at(c, j + 1), cw =>
              aggregate(zip_with(sub, cw, (a, b) => a * b),
                lit(0.0), (acc, x) => acc + x))
          })
      }
    }
  }

  private def adcSum(lut: Column, codes: Column, m: Int): Column =
    bindOnce(lut) { l =>
      bindOnce(codes) { cd =>
        aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
          (acc, j) => acc + element_at(element_at(l, j + 1), element_at(cd, j + 1) + 1))
      }
    }

  /** Round-6 ADC DOT score: `m` table lookups, one per code. */
  def adcScore(lut: Column, codes: Column, m: Int): Column =
    round(adcSum(lut, codes, m), 6)

  /** Round-6 ADC COSINE approximation: the ADC dot over the true norms
    * (both precomputed once per side). Candidate cuts that feed an
    * exact-COSINE rerank must rank on this, not the raw dot — a raw-dot
    * cut silently drops small-norm true neighbors whenever embedding
    * norms vary ([[Ivf.searchQuantized]] normalizes its int8 cut the
    * same way). A ZERO norm scores NULL, not NaN/∞ — under a DESC rank
    * (default nulls last) a zero embedding falls to the bottom of the
    * cut instead of hijacking every query's top slot.
    */
  def adcCosine(lut: Column, codes: Column, m: Int,
      qnorm: Column, cnorm: Column): Column =
    when(qnorm <= 0.0 || cnorm <= 0.0, lit(null).cast("double"))
      .otherwise(round(adcSum(lut, codes, m) / (qnorm * cnorm), 6))

  def adcTopK(queries: DataFrame, qidCol: String, qvecCol: String,
      codes: DataFrame, cidCol: String, cb: Codebooks, k: Int): DataFrame = {
    val q = queries.select(col(qidCol), lutColumn(col(qvecCol), cb).as("__lut"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("adc_dot").desc, col(cidCol).asc)
    codes.crossJoin(broadcast(q))
      .filter(col(qidCol) =!= col(cidCol))
      .withColumn("adc_dot", adcScore(col("__lut"), col("codes"), cb.length))
      .select(col(qidCol), col(cidCol), col("adc_dot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** [[adcTopK]] with an exact-cosine rerank tail: the ADC pass keeps
    * `k·candMult` candidates per query over codes only, then ONLY those
    * pairs read full vectors — the [[Ivf.searchQuantized]] candidate-cut
    * discipline with PQ bytes instead of int8.
    */
  def adcTopKRerank(queries: DataFrame, qidCol: String, qvecCol: String,
      corpus: DataFrame, cidCol: String, cvecCol: String,
      cb: Codebooks, k: Int, candMult: Int = 4): DataFrame = {
    import graft.functions.VectorFunctions.vec_norm
    // the cut reads CODES + NORMS only (the PQ I/O win); full vectors
    // join back for the cut survivors alone. Ranking the cut by the ADC
    // COSINE, not the raw dot — a raw-dot cut drops small-norm true
    // neighbors the exact-cosine rerank was supposed to rescue.
    val coded = corpus.select(col(cidCol),
      codesColumn(col(cvecCol), cb).as("__codes"),
      vec_norm(col(cvecCol)).as("__cn"))
    val q = queries.select(col(qidCol),
      lutColumn(col(qvecCol), cb).as("__lut"),
      vec_norm(col(qvecCol)).as("__qn"))
    val wCand = Window.partitionBy(col(qidCol)).orderBy(col("__adc").desc, col(cidCol).asc)
    val cands = coded.crossJoin(broadcast(q))
      .filter(col(qidCol) =!= col(cidCol))
      .withColumn("__adc",
        adcCosine(col("__lut"), col("__codes"), cb.length, col("__qn"), col("__cn")))
      .withColumn("__r", row_number().over(wCand))
      .filter(col("__r") <= k * candMult)
      .select(col(qidCol), col(cidCol), col("__qn"), col("__cn"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("cosine_sim").desc, col(cidCol).asc)
    cands
      .join(broadcast(queries.select(col(qidCol), col(qvecCol))), Seq(qidCol))
      .join(corpus.select(col(cidCol), col(cvecCol)), Seq(cidCol))
      .withColumn("cosine_sim",
        when(col("__qn") <= 0.0 || col("__cn") <= 0.0, lit(null).cast("double"))
          .otherwise(round(vec_dot(col(qvecCol), col(cvecCol)) / (col("__qn") * col("__cn")), 6)))
      .select(col(qidCol), col(cidCol), col("cosine_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Mean round-6 squared-L2 of every subvector to its chosen codeword —
    * the quantization distortion Lloyd training minimizes; a training
    * diagnostic and the monotonicity gate in the spec.
    */
  def distortion(corpus: DataFrame, idCol: String, vecCol: String, cb: Codebooks): Double = {
    val (m, _, ds) = (cb.length, cb(0).length, cb(0)(0).length)
    val d = bindOnce(col(vecCol).cast("array<double>")) { v =>
      bindOnce(cbLit(cb)) { c =>
        bindOnce(col("codes")) { cd =>
          aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) =>
            acc + bindOnce(slice(v, j * lit(ds) + 1, lit(ds))) { sub =>
              round(aggregate(zip_with(sub,
                element_at(element_at(c, j + 1), element_at(cd, j + 1) + 1),
                (a, b) => (a - b) * (a - b)), lit(0.0), (acc2, x) => acc2 + x), 6)
            })
        }
      }
    }
    encode(corpus, idCol, vecCol, cb)
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(avg(d).as("__d")).collect()(0).getDouble(0)
  }

  /** Per-subspace Lloyd refinement of [[seedCodebooks]] — the production
    * quantizer. Each iteration encodes the corpus with the current
    * codebooks (one scan), averages every (subspace, code) cluster's
    * subvector elements (one keyed aggregate over m·ks·ds cells), and
    * collects the ~D·ks-double result back as the next literal. Empty
    * clusters keep their previous codeword. Float-mean reduction order
    * makes training runs host-dependent in the last ulp — train is the
    * production path; [[seedCodebooks]] is the oracle path.
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ks: Int, dim: Int, iters: Int): Codebooks = {
    val ds = dim / m
    var cb = seedCodebooks(corpus, idCol, vecCol, m, ks, dim)
    for (_ <- 0 until iters) {
      val enc = encode(corpus, idCol, vecCol, cb)
      val cells = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
        .join(enc, Seq(idCol))
        .select(col("__v"), posexplode(col("codes")).as(Seq("j", "code")))
        .select(col("j"), col("code"),
          posexplode(slice(col("__v"), col("j") * ds + 1, lit(ds))).as(Seq("t", "x")))
        .groupBy(col("j"), col("code"), col("t"))
        .agg(avg(col("x")).as("mean"))
        .collect()
      val next = cb.map(_.map(_.clone()))
      cells.foreach { r =>
        next(r.getAs[Int]("j"))(r.getAs[Int]("code"))(r.getAs[Int]("t")) =
          r.getAs[Double]("mean")
      }
      cb = next
    }
    cb
  }
}
