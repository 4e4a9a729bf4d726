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

  /** [[round4]] at 6 decimals — for quantities (cosines, PageRank mass)
    * whose magnitudes sit near 1e-3 and need more surviving precision.
    */
  def round6(c: Column): Column = floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** DuckDB twin of [[round6]]. */
  def round6Sql(expr: String): String = s"floor(($expr) * 1000000 + 0.5) / 1000000"

  /** Let-binding for expressions consumed inside higher-order-function
    * lambdas: evaluate `e` ONCE per row and hand the body a lambda
    * VARIABLE instead of the expression tree. HOFs are interpreted
    * (CodegenFallback) with no cross-invocation subexpression
    * elimination, so a lambda like `i => slice(toks, i, n)` whose `toks`
    * is a `split`/`regexp` tree re-runs that tree for EVERY element —
    * O(len²) work per row (the 32× scale pilot caught the classifier
    * paying 40 s over 5 000 docs this way). `bindOnce(toks)(tk => …)`
    * makes every access a variable lookup. Implementation: a
    * single-element `transform` whose argument is evaluated once and
    * whose element IS the binding.
    */
  def bindOnce(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), body), 1)
}
