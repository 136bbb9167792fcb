package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  // every lev-1 edit class + traps: substitution, insertion, deletion,
  // equality (distance 0), the transposition FALSE POSITIVE the shared
  // delete-1 variant admits ("ab"/"ba" share "a" but sit at distance 2),
  // a distance-2 pair, a null name, and an empty string (its variant set
  // is just itself)
  private lazy val names = Seq(
    (1L, "kitten"), (2L, "sitten"),   // substitution: dist 1
    (3L, "kittten"),                  // insertion vs 1: dist 1
    (4L, "kiten"),                    // deletion vs 1: dist 1
    (5L, "kitten"),                   // equal to 1: dist 0
    (6L, "ab"), (7L, "ba"),           // share variants, dist 2: must refine OUT
    (8L, "xyzzy"),                    // far from everything
    (9L, null.asInstanceOf[String]),  // null: matches nothing
    (10L, ""), (11L, "a")             // "" vs "a": dist 1 via delete-1
  ).toDF("id", "name")

  test("selfJoinLev1 equals the cross-join levenshtein reference") {
    val got = FuzzyJoin.selfJoinLev1(names, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val nn = names.filter(col("name").isNotNull)
    val want = nn.select(col("id").as("id_a"), col("name").as("na"))
      .crossJoin(nn.select(col("id").as("id_b"), col("name").as("nb")))
      .filter(col("id_a") < col("id_b") && levenshtein(col("na"), col("nb")) <= 1)
      .select(col("id_a"), col("id_b"), levenshtein(col("na"), col("nb")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"got ${got.toSeq.sorted} want ${want.toSeq.sorted}")
    // the classes the blocking must catch and the trap it must refine out
    assert(got.contains((1L, 2L, 1L)))   // substitution
    assert(got.contains((1L, 3L, 1L)))   // insertion
    assert(got.contains((1L, 4L, 1L)))   // deletion
    assert(got.contains((1L, 5L, 0L)))   // exact duplicate
    assert(!got.exists(p => p._1 == 6L && p._2 == 7L), "transposition leaked through refine")
    assert(got.contains((10L, 11L, 1L))) // empty vs one-char
    assert(!got.exists(p => p._1 == 9L || p._2 == 9L), "null name matched")
  }

  test("the candidate join is a hash equi-join on the variant key, never a nested loop") {
    val p = FuzzyJoin.selfJoinLev1(names, "id", "name")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("__v"), p)
  }
}
