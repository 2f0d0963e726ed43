package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graft.VecColumns

/** Public API over the native float-vector kernels
  * ([[org.apache.spark.sql.graft.FloatVecDot]] — a fused codegen loop).
  */
object VecFunctions {

  /** Σ aᵢ·bᵢ (doubles accumulate float products). */
  def vecDot(a: Column, b: Column): Column = VecColumns.vecDot(a, b)

  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** Karp–Rabin polynomial rolling hash (mult 31, mod 1e9+7) over UTF-8
    * bytes — see [[org.apache.spark.sql.graft.RollingHash]].
    */
  def rollingHash(s: Column): Column = VecColumns.rollingHash(s)

  /** Distinct consecutive word `n`-grams of a space-separated string as
    * `array<string>` — partition-local shingling with no token shuffle,
    * see [[org.apache.spark.sql.graft.WordShingles]].
    */
  def wordShingles(s: Column, n: Int): Column = VecColumns.wordShingles(s, n)

  /** Elementwise vector-sum AGGREGATE over integer-scaled components —
    * fixed dim-sized long state, map-side combinable; see
    * [[org.apache.spark.sql.graft.VecSumScaled]].
    */
  def vecSumScaled(v: Column, scale: Long): Column =
    VecColumns.vecSumScaled(v, scale)

  /** Σ floor(aᵢ·scaleA)·floor(bᵢ·scaleB) as an exact LONG — the
    * deterministic (oracle-checkable) similarity score; see
    * [[org.apache.spark.sql.graft.FloatVecDotScaled]].
    */
  def vecDotScaled(a: Column, b: Column, scaleA: Long, scaleB: Long): Column =
    VecColumns.vecDotScaled(a, b, scaleA, scaleB)

  /** Make `vec_dot` / `rolling_hash` callable from SQL text in this
    * session (`SELECT vec_dot(a, b) FROM ...`).
    */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    VecColumns.registerAll(spark)
}
