package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that REPORTS itself non-deterministic while being a
  * pure pass-through — a per-column inlining barrier.
  *
  * Why it exists: Catalyst's alias-substitution rules
  * (`PushPredicateThroughNonJoin`, `CollapseProject`) rewrite consumers of
  * a projected alias by splicing in the alias's DEFINITION. For a cheap
  * definition that is free; for an expensive one consumed many times it
  * multiplies per-row work. The measured case in this repo: the curation
  * funnel's admission filter (`langId(toks)`, quality score, token gate)
  * sits above the projection that computes `toks =
  * regexp_extract_all(text, '\S+')`. Predicate pushdown substitutes that
  * definition into every one of the predicate's NINE `toks` references,
  * so the whitespace tokenizer ran 9× per row over EVERY document before
  * admission — a consistent 6× wall-clock regression on `pipeline_curate`
  * (0.7 → 4.2 s at sf0.1), with the projections above re-running it for
  * survivors anyway.
  *
  * Both rules gate on `deterministic`: a projection containing any
  * non-deterministic field is never substituted through (pushdown
  * requires `fields.forall(_.deterministic)`; collapse refuses to merge).
  * Wrapping exactly one expensive projected column therefore pins every
  * downstream filter/projection to consume the MATERIALIZED attribute —
  * the tokenizer runs once per row, period. The wrapper itself is pure
  * (`eval`/codegen delegate straight to the child), so query results,
  * oracle hashes, and retry/recompute semantics are untouched; it is a
  * scheduling hint, not a semantics change — the same stance Spark's own
  * `AssertTrue`-style no-inline tricks take, without the side effects.
  *
  * Trade-off (why this is not the default for every derived column): the
  * flag also hides the child from rules that HELP (constant folding
  * through, pruning of unused siblings is unaffected since pruning works
  * on attributes). Use it only where a measured plan shows definition
  * re-inlining, and only on the one column that anchors the projection.
  */
case class EvalOnce(child: Expression) extends UnaryExpression {

  /** The lie that does the work: pure, but never substituted. */
  override lazy val deterministic: Boolean = false

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): EvalOnce =
    copy(child = newChild)
}

object EvalOnce {
  /** Wrap a Column so its definition is never inlined into consumers. */
  def apply(c: Column): Column =
    GraftSqlBridge.column(EvalOnce(GraftSqlBridge.expression(c)))
}
