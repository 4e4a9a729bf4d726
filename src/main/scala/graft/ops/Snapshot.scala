package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the lineage/bookkeeping pass an incremental
  * pipeline runs between two versions of a dataset: which documents were
  * added, removed, changed, or untouched. Drives incremental downstream
  * work (re-embed only `added ∪ changed`, retire `removed` from the
  * index) and audits that an ingest did what its manifest claims.
  *
  * Plan shape at 100 TB: content digests ([[Dedup.contentDigest]] — the
  * same identity definition exact dedup uses) are computed map-side, so
  * only (id, 64-char digest) pairs shuffle into the full-outer join; one
  * shuffle per side on the id, bodies never move. AQE handles the
  * asymmetric case (yesterday's 100 TB vs today's 100 GB partial) with a
  * runtime broadcast of the small side.
  */
object Snapshot {

  /** One row per id present in either snapshot:
    * (idCol, status ∈ {added, removed, changed, unchanged}, old_hash,
    * new_hash). `added`/`removed` are relative to `oldDf` → `newDf`.
    *
    * PRECONDITION: `idCol` is unique within each snapshot (it is the
    * row's identity — a snapshot with duplicate ids has no well-defined
    * per-id diff). Duplicate ids would fan out through the full-outer
    * join, yielding multiple rows per id and a [[summary]] whose counts
    * no longer partition the id set; run
    * [[Dedup.exactKeepFirst]]/[[Dedup.exact]] per id first if the input
    * may carry duplicates.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame = {
    val digest = Dedup.contentDigest(contentCols)
    val o = oldDf.select(col(idCol), digest.as("old_hash"))
    val n = newDf.select(col(idCol), digest.as("new_hash"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") === col("new_hash"), "unchanged")
          .otherwise("changed").as("status"),
        col("old_hash"), col("new_hash"))
  }

  /** Roll-up of [[diff]]: (status, n) — the 4-row summary a pipeline logs
    * per ingest.
    */
  def summary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, idCol, contentCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
