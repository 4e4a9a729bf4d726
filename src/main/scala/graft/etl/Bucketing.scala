package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed writes for co-located joins.
  *
  * Bucketing both sides of a recurring equi-join on the join key (e.g.
  * fact and DimShipping on `shipping_id`) lets Spark's scan report the
  * hash distribution, so the join runs with NO exchange on either side —
  * at 100 TB that removes the dominant shuffle from every downstream
  * star-join. Pair with `sortBy` to also skip the sort of a sort-merge
  * join.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.saveAsTable(table)
  }
}
