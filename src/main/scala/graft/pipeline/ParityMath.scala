package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{concat, floor, lit, raise_error, when}

/** Portable 6-decimal quantization. Engine round() implementations
  * disagree on exact ties (Spark rounds the shortest decimal
  * representation HALF_UP; DuckDB rounds the exact binary value), which
  * matters whenever a ratio of small integers lands on x.xxxxxx5.
  * floor(x·1e6 + 0.5)/1e6 is the same three IEEE ops in both engines,
  * so results are bitwise identical by construction.
  */
object ParityMath {

  def q6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  def q6Sql(e: String): String =
    s"(floor(($e) * 1000000.0 + 0.5) / 1000000.0)"

  /** 9-decimal variant for values that need ranking resolution (e.g.
    * per-document sampling keys, where q6 would collapse long-document
    * keys into wide tie bands and the tie-break would dominate the
    * weighting).
    */
  def q9(c: Column): Column =
    floor(c * lit(1000000000.0) + lit(0.5)) / lit(1000000000.0)

  def q9Sql(e: String): String =
    s"(floor(($e) * 1000000000.0 + 0.5) / 1000000000.0)"

  /** Exact FLOOR-division SQL text for the Spark face, any sign of x
    * (p must be a POSITIVE literal): Spark's `DIV` truncates toward
    * zero, so `x DIV p` mis-buckets negative operands — concretely,
    * pre-1970 timestamps bucketed to epoch days/hours/weeks.
    * `x − pmod(x, p)` is the exact multiple `p·⌊x/p⌋`, so the final
    * DIV is exact and sign-safe; all integer arithmetic, whole-stage
    * codegen'd. Every Spark-side time-bucket site pairs this with a
    * `fdivDuckSql` oracle (below); sites that instead enforce the
    * `tus >= 0` contract do so on BOTH faces (q_seasonality
    * discipline) and stay on plain DIV / plain `//`.
    */
  def fdivSql(x: String, p: String): String =
    s"((($x) - pmod(($x), $p)) DIV ($p))"

  /** The DuckDB half of the floor-division pair. r13's premise that
    * DuckDB `//` floors is WRONG for integer operands: DuckDB 1.0.0
    * integer `//` TRUNCATES toward zero ((-7)//2 = -3), exactly like
    * Spark DIV — measured r15 when the sliced-energy face's negative
    * dot products exposed it (every time-bucket gate had only
    * post-1970 data, so the divergence was latent). Same construction
    * as `fdivSql`: subtract the FLOORED modulo (((x%p)+p)%p, the
    * pmod equivalent), after which the division is exact and
    * truncation equals floor.
    */
  def fdivDuckSql(x: String, p: String): String =
    s"((($x) - ((($x) % ($p)) + ($p)) % ($p)) // ($p))"

  /** In-plan LOUD integer-headroom guard: passes `c` through unchanged
    * while |c| ≤ `lim`, raises a job-failing error beyond it. The
    * distributed complement of the driver-side `require(nTot ≤ …)`
    * discipline (qBetweenness's maxSig guard) for bounds on PER-ROW
    * values the driver never sees — e.g. a per-value tie count whose
    * cube feeds a BIGINT sum. Without this, `spark.sql.ansi.enabled`
    * being off means Long arithmetic WRAPS silently while the DuckDB
    * oracle (HUGEINT) keeps computing — the worst failure mode: two
    * confident, different answers. Codegen'd `when`, zero extra
    * actions, no effect on any in-bounds plan.
    */
  def loudBound(c: Column, lim: Long, what: String): Column =
    when(c > lit(lim) || c < lit(-lim),
      raise_error(concat(
        lit(s"$what exceeds the +/-$lim integer-headroom bound: "),
        c.cast("string")))).otherwise(c)
}
