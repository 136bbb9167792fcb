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
    * type; parenthesized on substitution so operators can't rebind.
    *
    * WIDENING (r18, ADVICE r17): the fragment doubles the numerator
    * (`2·num + den`), so a caller who provisioned BIGINT headroom for
    * `num` itself could still silently wrap inside the helper at
    * extreme cardinalities (skewReport's `cnt·n_keys·10⁴`,
    * rulesGateEval's `n_both·10⁶`). Both operands are therefore cast to
    * the engine's exact wide type BEFORE the doubling — DECIMAL(38,0)
    * on Spark, HUGEINT on DuckDB — and the result is cast back to
    * BIGINT, pinning the output type either way. DuckDB deliberately
    * does NOT use DECIMAL(38,0): its decimal multiply promotes through
    * DOUBLE when precision would exceed 38, silently losing exactness
    * past 2^53 (probed: 2·DECIMAL(2^62)+3 // 6 came back 85 LOW);
    * HUGEINT (int128) arithmetic is exact. Remaining caller-side
    * contract: `num`/`den` must themselves be computed without
    * overflow — widening inside the fragment cannot repair a product
    * that already wrapped before the cast; provision the FIRST factor
    * (`CAST(cnt AS DECIMAL(38,0)) * n_keys * 10000`) when operand
    * magnitudes can exceed 2^62.
    */
  def spark(num: String, den: String): String =
    // negate AFTER the widening cast (ADVICE r18): -($num) at the narrow
    // type's minimum (BIGINT -2^63) wraps silently before the DECIMAL
    // widening can help; -CAST(...) negates in the wide type, exact for
    // every narrow-type value
    "CAST((CASE WHEN (" + num + ") < 0 " +
      s"THEN -((2 * (-CAST(($num) AS DECIMAL(38,0))) + ($den)) div (2 * CAST(($den) AS DECIMAL(38,0)))) " +
      s"ELSE (2 * CAST(($num) AS DECIMAL(38,0)) + ($den)) div (2 * CAST(($den) AS DECIMAL(38,0))) END) AS BIGINT)"

  /** DuckDB fragment mirroring [[spark]] — `//` and HUGEINT (see the
    * widening note above for why not DECIMAL).
    */
  def duck(num: String, den: String): String =
    "CAST((CASE WHEN (" + num + ") < 0 " +
      s"THEN -((2 * (-CAST(($num) AS HUGEINT)) + ($den)) // (2 * CAST(($den) AS HUGEINT))) " +
      s"ELSE (2 * CAST(($num) AS HUGEINT) + ($den)) // (2 * CAST(($den) AS HUGEINT)) END) AS BIGINT)"
}
