package graft.functions

import graft.SparkSpec

/** Unit lock for the [[ExactRound]] fragment — it now quantizes 15+
  * hashed columns across the suite, so its algebra is load-bearing:
  * round-half-AWAY-from-zero of a rational of integers, computed in
  * pure integer arithmetic, matching BigDecimal's HALF_UP (which rounds
  * away from zero for negatives) on every case incl. the exact .5
  * boundaries where engine double-round semantics diverge.
  */
class ExactRoundSpec extends SparkSpec {

  private def viaSpark(num: Long, den: Long): Long = {
    val df = spark.sql(
      s"SELECT ${ExactRound.spark(num.toString + "L", den.toString + "L")} AS r")
    df.collect()(0).getLong(0)
  }

  private def reference(num: Long, den: Long): Long =
    BigDecimal(num)./(BigDecimal(den))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact

  test("matches BigDecimal HALF_UP on exact half boundaries, both signs") {
    // the text_rarity killer class: numerator*scale landing exactly on
    // .5 (denominator a power of two)
    val cases = Seq(
      (1L, 2L), (3L, 2L), (5L, 2L), (-1L, 2L), (-3L, 2L), (-5L, 2L),
      (291010000L, 32L),           // the literal r16 red-row ratio shape
      (7L, 4L), (-7L, 4L), (1L, 3L), (-1L, 3L), (2L, 3L), (-2L, 3L),
      (0L, 5L), (10L, 5L), (-10L, 5L), (999999L, 1000000L), (-999999L, 1000000L))
    cases.foreach { case (n, d) =>
      assert(viaSpark(n, d) == reference(n, d), s"($n / $d)")
    }
  }

  test("exhaustive small-domain sweep agrees with BigDecimal HALF_UP") {
    // one plan for the whole grid (1212 cases), not 1212 round-trips
    val rows = spark.sql(
      s"""SELECT n, d, ${ExactRound.spark("n", "d")} AS r
         |FROM (SELECT explode(sequence(-50L, 50L)) AS n)
         |CROSS JOIN (SELECT explode(sequence(1L, 12L)) AS d)""".stripMargin)
      .collect()
    assert(rows.length == 101 * 12)
    rows.foreach { r =>
      val (n, d, got) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(got == reference(n, d), s"($n / $d)")
    }
  }

  test("the duck fragment is textually the spark fragment with // for div and HUGEINT for DECIMAL(38,0)") {
    // one algebra, two spellings — a drift between them would silently
    // desynchronize every Spark/oracle pair using the helper. The wide
    // types differ per engine deliberately: DuckDB's decimal multiply
    // loses exactness past 2^53 (promotes through DOUBLE when precision
    // would exceed 38), so it widens via HUGEINT instead.
    assert(ExactRound.duck("a", "b") ==
      ExactRound.spark("a", "b").replace(" div ", " // ")
        .replace("AS DECIMAL(38,0)", "AS HUGEINT"))
  }

  test("no internal wrap at extreme numerators (the 2*num doubling is widened)") {
    // num = 2^62: 2*num wraps a BIGINT; the DECIMAL(38,0)-widened
    // fragment must return the exact floor((2*num + den) / (2*den))
    val got = spark.sql(
      s"SELECT ${ExactRound.spark("4611686018427387904", "3")} AS r").head().getLong(0)
    assert(got == 1537228672809129301L) // (2^63 + 3) div 6, exact
    val neg = spark.sql(
      s"SELECT ${ExactRound.spark("-4611686018427387904", "3")} AS r").head().getLong(0)
    assert(neg == -1537228672809129301L)
  }

  test("BIGINT minimum survives: negation happens in the wide type (ADVICE r18)") {
    // -(-2^63) wraps at BIGINT before any widening cast could help — the
    // fragment must negate AFTER the DECIMAL(38,0)/HUGEINT cast. The
    // literal is spelled (-max - 1) because -9223372036854775808 itself
    // doesn't parse as a BIGINT literal.
    val got = spark.sql(
      s"SELECT ${ExactRound.spark("-9223372036854775807L - 1L", "3")} AS r")
      .head().getLong(0)
    assert(got == reference(Long.MinValue, 3L))
  }
}
