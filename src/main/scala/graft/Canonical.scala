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

  /** Stage expensive derived columns behind a PLAN barrier so each
    * expression evaluates ONCE per row no matter how many downstream
    * references exist (round 15, guide §1.2 per-task work).
    *
    * Why [[bindOnce]] alone is not enough: `withColumn` projections are
    * collapsed by Catalyst's `CollapseProject`, which INLINES a derived
    * column's whole expression tree into every downstream reference —
    * and subexpression elimination skips trees containing higher-order
    * functions, so a stat struct referenced by k derived fractions
    * re-runs its tokenize/regex tree k times per row. Measured on the
    * composed x72 preclean: 4.7 s lazy vs 1.1 s for the same stages
    * reading checkpoints — the upstream regex chain re-ran inside every
    * collapsed reference.
    *
    * Implementation: `explode(array(struct(staged…)))` — a Generate node
    * evaluates the struct once per row (1-element array: exactly one
    * output row per input, nulls ride inside the struct), and
    * CollapseProject cannot inline through a Generate, so downstream
    * references are plain attribute/field reads. Shuffle-free,
    * whole-stage-codegen eligible, row order preserved.
    */
  def stageOnce(df: org.apache.spark.sql.DataFrame,
      staged: Seq[(String, Column)]): org.apache.spark.sql.DataFrame = {
    require(staged.nonEmpty, "stageOnce needs at least one column")
    val tmp = "__stage_once"
    df.select(col("*"),
        explode(array(struct(staged.map { case (n, e) => e.as(n) }: _*))).as(tmp))
      .select(col("*"), col(s"$tmp.*"))
      .drop(tmp)
  }
}
