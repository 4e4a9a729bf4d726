package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join splitting handles most runtime skew; these are the
  * explicit tools for when a key's fan-in is so hot that even one split
  * partition overwhelms an executor (the classic null-key / power-law
  * user_id cases at 100 TB).
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate by (key, salt) to
    * spread a hot key over `salts` reducers, then final-aggregate by key.
    * Correct for algebraic aggregates (sum/count/min/max) — the caller
    * supplies both phases. The salt is deterministic (hash of ALL columns'
    * concat mod salts ≈ row-uniform) so replays/retries stay stable.
    *
    * @param partial aggregates for phase 1, keyed by (keys :+ salt)
    * @param merge   aggregates for phase 2 over the phase-1 outputs
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      salts: Int)(
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(salts)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted broadcast-side replication for a skewed equi-join: the large
    * side gets a deterministic row-salt, the small side is exploded
    * `salts`× with every salt value, and the join adds `__salt` to the key
    * — each hot key now lands on `salts` reducers. Use when the small side
    * is too big to broadcast but the join key is hot.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
