package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Literal, Lower, Md5, Multiply, RegExpReplace, Sqrt, StringTrim}

/** Session extensions wiring graft into Catalyst
  * (`SparkSession.builder.withExtensions(new GraftExtensions)` — every
  * session built through GraftSession gets this):
  *
  *  - the as-of join planner strategy (custom logical node →
  *    [[AsOfJoinExec]]), and
  *  - the graft SQL function surface: the native codegen expressions
  *    and the canonical text/similarity column compositions registered
  *    in the session FunctionRegistry, so `spark.sql` users get the
  *    same operators as the DataFrame API (`SELECT graft_dot(a, b)`,
  *    `graft_cosine`, `graft_hyperplane_bucket(vec, 8)`,
  *    `graft_fingerprint(text)`) — API parity between the SQL and
  *    DataFrame entry points, at identical (codegen'd) plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    GraftExtensions.functions.foreach(e.injectFunction)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def arity(name: String, children: Seq[Expression], expected: Int*): Unit =
    if (!expected.contains(children.size))
      throw new IllegalArgumentException(
        s"$name expects ${expected.mkString(" or ")} argument(s), got ${children.size}")

  /** Scalar parameters of a registered function (e.g. the plane count)
    * must be literal integers — they parameterize the generated code
    * itself, not a per-row input.
    */
  private def intLiteral(name: String, arg: String, e: Expression): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$name: $arg must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$name: $arg must be a literal integer, got $other")
    }
  }

  /** The SQL function surface. One triple per function: identifier,
    * catalog info, and the expression builder the parser invokes. The
    * composed functions (`graft_cosine`, `graft_fingerprint`) are built
    * from CATALYST nodes directly — a Column-API composition would embed
    * unresolved column nodes that the analyzer does not recurse into —
    * so they expand into ordinary built-in expression trees that
    * optimize and codegen exactly like the hand-written DataFrame form
    * (none of these is a UDF). Parity with the DataFrame definitions
    * (`Similarity.cosine`, `TextOps.fingerprint`) is locked by
    * ExtensionsSpec, which compares both paths on real data.
    */
  private[plans] val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(

    (FunctionIdentifier("graft_dot"),
      info("graft_dot",
        "graft_dot(a, b) - double-precision dot product of two numeric arrays " +
          "(left-to-right summation; null on length mismatch; null elements contribute 0)"),
      { children: Seq[Expression] =>
        arity("graft_dot", children, 2)
        ArrayDotProduct(children(0), children(1))
      }),

    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two numeric arrays " +
          "(graft_dot(a,b) / (sqrt(graft_dot(a,a)) * sqrt(graft_dot(b,b))))"),
      { children: Seq[Expression] =>
        arity("graft_cosine", children, 2)
        val (a, b) = (children(0), children(1))
        Divide(ArrayDotProduct(a, b),
          Multiply(Sqrt(ArrayDotProduct(a, a)), Sqrt(ArrayDotProduct(b, b))))
      }),

    (FunctionIdentifier("graft_hyperplane_bucket"),
      info("graft_hyperplane_bucket",
        "graft_hyperplane_bucket(vec, nPlanes[, planeOffset]) - random-hyperplane LSH " +
          "bucket id: nPlanes sign bits of integer-coefficient hyperplane dot products " +
          "(null vec maps to bucket 0)"),
      { children: Seq[Expression] =>
        arity("graft_hyperplane_bucket", children, 2, 3)
        val nPlanes = intLiteral("graft_hyperplane_bucket", "nPlanes", children(1))
        val offset =
          if (children.size == 3) intLiteral("graft_hyperplane_bucket", "planeOffset", children(2))
          else 0
        HyperplaneBuckets(children(0), nPlanes, offset)
      }),

    (FunctionIdentifier("graft_fingerprint"),
      info("graft_fingerprint",
        "graft_fingerprint(text) - canonical-text md5 fingerprint " +
          "(lowercase, strip non-alphanumerics, collapse whitespace) — the exact-dedup key"),
      { children: Seq[Expression] =>
        arity("graft_fingerprint", children, 1)
        // md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " ")))
        Md5(StringTrim(RegExpReplace(
          RegExpReplace(Lower(children.head), Literal("[^a-z0-9 ]"), Literal("")),
          Literal(" +"), Literal(" "))))
      }),
  )
}
