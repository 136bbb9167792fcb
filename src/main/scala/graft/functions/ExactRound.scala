package graft.functions

/** Exact integer round-half-away-from-zero of a rational of integers —
  * the cross-engine-safe replacement for `round(num / den)` wherever
  * BOTH operands are exact integers (counts, micro-unit sums, e-scaled
  * quantities).
  *
  * Why: `round(DOUBLE)` semantics differ across engines on EXACT .5
  * inputs — Spark rounds HALF_UP (away from zero) while DuckDB >= 1.1
  * rounds doubles half-to-even. A ratio of integers lands exactly on a
  * representable .5 whenever the reduced denominator is a power of two
  * (e.g. `sum_cnt·10⁴ / 32`), so any hashed column of the form
  * `round(integer·scale / integer)` is one driver-engine upgrade away
  * from a hash mismatch (this killed `text_rarity` in rounds 15-16).
  * The identity `round_half_away(a/b) = sign(a) · ((2|a| + b) div 2b)`
  * (b > 0) computes the same value in pure integer arithmetic on both
  * engines — no doubles, no engine rounding semantics involved.
  *
  * Operands stay non-negative inside the division, so Spark `div`
  * (truncating) and DuckDB `//` (flooring) agree by construction.
  *
  * Residual class, audited and deliberately left: roundings whose input
  * contains a transcendental factor (`ln`, `sqrt`, `sin`) can never sit
  * exactly on a representable half (the value is irrational except at
  * pinned zeros), and quantizations of raw double/float DATA columns
  * (`round(value·10^k)`, `CAST(value AS DECIMAL)`) diverge only if the
  * data itself contains a dyadic-short value exactly on a half —
  * probability ~2⁻⁴⁰ per row for generator-produced uniforms, and both
  * engines see the identical double. See SURVEY §8 audit note.
  */
object ExactRound {

  /** Spark SQL fragment: round-half-away(num/den) as BIGINT; den > 0.
    * `num`/`den` are SQL sub-expressions of integral (or DECIMAL(38,0))
    * type; parenthesized on substitution so operators can't rebind. */
  def spark(num: String, den: String): String =
    s"(CASE WHEN ($num) < 0 THEN -((2 * -($num) + ($den)) div (2 * ($den))) " +
      s"ELSE (2 * ($num) + ($den)) div (2 * ($den)) END)"

  /** DuckDB fragment mirroring [[spark]] — `//` instead of `div`. */
  def duck(num: String, den: String): String =
    s"(CASE WHEN ($num) < 0 THEN -((2 * -($num) + ($den)) // (2 * ($den))) " +
      s"ELSE (2 * ($num) + ($den)) // (2 * ($den)) END)"
}
