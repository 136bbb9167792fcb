package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join without a quadratic comparison — the
  * entity-resolution join shape (near-identical names/titles/SKUs from
  * dirty feeds). A bare `levenshtein(a, b) <= 1` predicate plans a
  * nested loop: O(n²) distance evaluations, unusable past ~10⁵ rows.
  *
  * The standard fix is deletion-neighborhood blocking (the SymSpell
  * scheme, public domain): two strings are within edit distance 1 ONLY
  * IF they share a member of D(x) = {x} ∪ {x with one char deleted} —
  * equality shares x itself; one insert/delete makes the shorter string
  * a delete-1 variant of the longer; one substitution shares the
  * variant deleting the differing position. So: explode each row to its
  * ≤ len+1 variants, hash-equi-join on the variant, dedup the pair, and
  * refine with the exact levenshtein (shared variants can over-reach —
  * "ab"/"ba" share "a" at distance 2 — so the refine is REQUIRED, not
  * defensive). Work is O(n·len + candidate pairs), all
  * shuffle-partitioned on the variant key; candidates are bounded by
  * true near-match density plus same-variant collisions, never n².
  *
  * Distance budgets > 1 generalize by deleting up to k chars (variant
  * count ~ len^k) — not built here; k = 1 is the entity-resolution
  * workhorse.
  */
object FuzzyJoin {

  /** All (a, b) pairs of `df` rows (`idCol` a < b) whose `nameCol`
    * values are within levenshtein distance 1, emitted with the exact
    * distance. Null names match nothing (dropped before the explode).
    */
  def selfJoinLev1(df: DataFrame, idCol: String, nameCol: String): DataFrame = {
    // Column API, not an interpolated expr: a name needing backticks
    // ("first name", reserved words) must resolve like any other column
    val n = col(nameCol)
    val variants: Column = array_union(
      array(n),
      transform(sequence(lit(1), length(n)),
        i => concat(n.substr(lit(1), i - 1), n.substr(i + 1, length(n)))))
    val v = df.select(col(idCol), col(nameCol))
      .filter(col(nameCol).isNotNull)
      .withColumn("__v", explode(variants))
    val a = v.select(col(idCol).as("id_a"), col(nameCol).as("__n_a"), col("__v"))
    val b = v.select(col(idCol).as("id_b"), col(nameCol).as("__n_b"), col("__v"))
    a.join(b, Seq("__v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__n_a"), col("__n_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("__n_a"), col("__n_b")).cast("long"))
      .filter(col("dist") <= 1)
      .drop("__n_a", "__n_b")
  }
}
