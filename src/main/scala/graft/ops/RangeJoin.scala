package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketized) range join — point-in-interval joins without the
  * BroadcastNestedLoop / cartesian blow-up Spark plans for a bare
  * `point BETWEEN lo AND hi` condition.
  *
  * Both sides are mapped onto integer bins of width `binWidth`: a point
  * lands in exactly one bin; an interval is exploded into every bin it
  * overlaps (`floor(lo/w) .. floor(hi/w)`). The join then becomes an
  * EQUI join on the bin id (hash-partitionable, AQE-able, skew-splittable)
  * followed by the exact residual `BETWEEN` filter. At 100 TB this turns
  * an O(|P|·|R|) nested loop into one shuffle of |P| + Σ(interval spans)
  * rows; choose `binWidth` near the median interval width so each interval
  * explodes into O(1) bins.
  */
object RangeJoin {

  /** Inner point-in-interval join: rows of `points` × rows of `ranges`
    * where `points(pointCol)` ∈ [`ranges(loCol)`, `ranges(hiCol)`]
    * (inclusive both ends, null-rejecting like SQL BETWEEN).
    */
  def pointInRange(
      points: DataFrame,
      pointCol: String,
      ranges: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binOf: Column => Column = c => floor(c / lit(binWidth)).cast("long")

    val binnedRanges = ranges
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(binOf(col(loCol)), binOf(col(hiCol)))))
    val binnedPoints = points
      .filter(col(pointCol).isNotNull)
      .withColumn("__bin", binOf(col(pointCol)))

    binnedPoints
      .join(binnedRanges, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join: pairs (a, b) whose [lo, hi] intervals
    * intersect. Both sides explode to covering bins; the bin-equi join
    * produces each overlapping pair once per shared bin, so the residual
    * filter also dedups to the FIRST shared bin (a pair's overlap region
    * starts in exactly one bin — counting only that bin keeps the join
    * shuffle-only with no downstream distinct).
    */
  def intervalOverlap(
      left: DataFrame,
      leftLo: String,
      leftHi: String,
      right: DataFrame,
      rightLo: String,
      rightHi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binOf: Column => Column = c => floor(c / lit(binWidth)).cast("long")

    def explodeBins(df: DataFrame, lo: String, hi: String): DataFrame = df
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn("__bin", explode(sequence(binOf(col(lo)), binOf(col(hi)))))

    explodeBins(left, leftLo, leftHi)
      .join(explodeBins(right, rightLo, rightHi), Seq("__bin"))
      .filter(col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi))
      // overlap start bin == this bin ⇒ emit exactly once per pair
      .filter(binOf(greatest(col(leftLo), col(rightLo))) === col("__bin"))
      .drop("__bin")
  }
}
