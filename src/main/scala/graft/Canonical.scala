package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable canonical rounding.
  *
  * `round(x, 4)` disagrees across engines when the double lands on an exact
  * decimal half (Spark rounds the exact binary value via BigDecimal HALF_UP;
  * DuckDB formats first — e.g. `round(0.86875, 4)` → 0.8687 vs 0.8688).
  * `floor(x·10^s + 0.5)/10^s` is pure IEEE arithmetic, so every engine
  * computes bit-identical results. Semantics: round-half-toward-+∞.
  */
object Canonical {
  def round4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** DuckDB twin of [[round4]]. */
  def round4Sql(expr: String): String = s"floor(($expr) * 10000 + 0.5) / 10000"
}
