package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of a string array's elements that belong to a FIXED word set —
  * the codegen'd replacement for `size(filter(toks, t ->
  * t.isInCollection(words)))` on the text hot paths (language-ID runs
  * FOUR of these per row, the quality score a fifth).
  *
  * Why a custom Expression (SURVEY §7.3 preference (b), same rationale
  * as [[ArrayDotProduct]]): the HOF formulation evaluates an interpreted
  * lambda per ELEMENT — per-element virtual dispatch and boxed
  * comparisons outside WholeStageCodegen — and allocates the filtered
  * array only to take its size. This emits a tight loop over the
  * ArrayData with a shared java.util.HashSet membership probe: no
  * allocation, no lambda machinery, stays inside codegen.
  *
  * Semantics match the HOF form exactly: null array → null; null
  * elements never match (isInCollection yields null → filtered). Count
  * is a long (the call sites cast to long anyway).
  */
case class CountInSet(child: Expression, words: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<string>, got $other")
  }

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(words.size * 2, 4))
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var c = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && wordSet.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      s"""
         |long $c = 0L;
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i) && $setRef.contains($arr.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

object CountInSet {
  def apply(c: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(CountInSet(GraftSqlBridge.expression(c), words))
}

/** Number of DISTINCT elements of a string array — the codegen'd
  * replacement for `size(array_distinct(arr))`, which materializes the
  * deduplicated array (interpreted, one allocation per row) only to
  * count it. Matches array_distinct's semantics: binary string
  * equality, a null element counts as ONE distinct value, null array →
  * null.
  */
case class ArrayDistinctCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val seen = new java.util.HashSet[UTF8String]()
    var sawNull = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (arr.isNullAt(i)) sawNull = true else seen.add(arr.getUTF8String(i))
      i += 1
    }
    seen.size.toLong + (if (sawNull) 1L else 0L)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val seen = ctx.freshName("seen")
      val sawNull = ctx.freshName("sawNull")
      s"""
         |java.util.HashSet $seen = new java.util.HashSet();
         |boolean $sawNull = false;
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) $sawNull = true;
         |  else $seen.add($arr.getUTF8String($i));
         |}
         |${ev.value} = (long) $seen.size() + ($sawNull ? 1L : 0L);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayDistinctCount =
    copy(child = newChild)
}

object ArrayDistinctCount {
  def apply(c: Column): Column =
    GraftSqlBridge.column(ArrayDistinctCount(GraftSqlBridge.expression(c)))
}
