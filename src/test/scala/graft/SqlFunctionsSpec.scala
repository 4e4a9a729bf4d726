package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, HashAggFunctions, VectorFunctions}
import graft.sources.Readers

/** The custom kernels must be first-class SQL functions: registered via
  * [[GraftExtensions]], callable from `spark.sql` text, and identical to
  * their Column-DSL twins.
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val registered = { GraftExtensions.register(spark); true }

  test("vec_dot from SQL text equals the DSL kernel and the HOF formula") {
    assert(registered)
    Readers.table(spark, sf0001, "embeddings").createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS d FROM emb_sql ORDER BY vec_id")
      .as[(Long, Double)].collect()
    val viaDsl = Readers.table(spark, sf0001, "embeddings")
      .select($"vec_id", VectorFunctions.vec_dot($"embedding", $"embedding").as("d"))
      .orderBy("vec_id").as[(Long, Double)].collect()
    val viaHof = Readers.table(spark, sf0001, "embeddings")
      .select($"vec_id",
        aggregate(zip_with($"embedding", $"embedding", (x, y) => x * y),
          lit(0d), (acc, v) => acc + v).as("d"))
      .orderBy("vec_id").as[(Long, Double)].collect()
    assert(viaSql.sameElements(viaDsl))
    viaSql.zip(viaHof).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-6) }
  }

  test("text_fingerprint and the agg kernels work from SQL text") {
    assert(registered)
    Readers.table(spark, sf0001, "documents").createOrReplaceTempView("docs_sql")
    val fp = spark.sql(
      """SELECT doc_id, text_fingerprint(text) AS fp FROM docs_sql ORDER BY doc_id""")
    val fpDsl = Readers.table(spark, sf0001, "documents")
      .select($"doc_id", graft.functions.TextFunctions.fingerprint($"text").as("fp"))
      .orderBy("doc_id")
    assert(fp.as[(Long, Long)].collect().sameElements(fpDsl.as[(Long, Long)].collect()))

    val sigSql = spark.sql(
      """SELECT minhash_agg(xxhash64(text) % 2147483647, 8) AS sig,
        |       simhash_agg(xxhash64(text)) AS sh
        |FROM docs_sql""".stripMargin).collect().head
    val sigDsl = Readers.table(spark, sf0001, "documents")
      .agg(
        HashAggFunctions.minhash_agg(pmod(xxhash64($"text"), lit(2147483647L)), 8).as("sig"),
        HashAggFunctions.simhash_agg(xxhash64($"text")).as("sh")).collect().head
    // pmod vs % differ on negatives — apply pmod on the SQL side too
    val sigSql2 = spark.sql(
      """SELECT minhash_agg(pmod(xxhash64(text), 2147483647), 8) AS sig,
        |       simhash_agg(xxhash64(text)) AS sh
        |FROM docs_sql""".stripMargin).collect().head
    assert(sigSql2.getSeq[Long](0) == sigDsl.getSeq[Long](0))
    assert(sigSql2.getLong(1) == sigDsl.getLong(1))
    assert(sigSql.getLong(1) == sigDsl.getLong(1))
  }

  test("the extension class installs its registrations into a builder's extension set") {
    val viaExt = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(viaExt) // must not throw; registration shape is valid
    assert(GraftExtensions.registrations.map(_._1.funcName).toSet ==
      Set("vec_dot", "text_fingerprint", "minhash_agg", "simhash_agg"))
  }
}
