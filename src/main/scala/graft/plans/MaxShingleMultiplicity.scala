package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Highest multiplicity of any contiguous `n`-gram of a token array —
  * the one-pass codegen'd equivalent of
  * `maxMultiplicity(shinglesN(toks, n))`, which (a) materialized the
  * shingle array through an interpreted zip_with chain and (b) folded
  * it through an interpreted `aggregate` over an `array_sort` — per-row
  * allocations and per-element lambda dispatch on the curation funnel's
  * repetition gate. Here: one HashMap count pass over the windows, no
  * intermediate array, inside WholeStageCodegen.
  *
  * Exact semantic match with the composed form: windows containing a
  * null element are skipped (shinglesN's lambdas null-mark and filter
  * them); fewer than `n` tokens → 0; null array → null. Token join is
  * injective for whitespace tokens (they cannot contain the separator),
  * so counting by window equals counting by joined string.
  */
case class MaxShingleMultiplicity(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    MaxShingleMultiplicity.maxCount(arr, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.MaxShingleMultiplicity.maxCount($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): MaxShingleMultiplicity =
    copy(child = newChild)
}

object MaxShingleMultiplicity {
  def apply(c: Column, n: Int): Column =
    GraftSqlBridge.column(MaxShingleMultiplicity(GraftSqlBridge.expression(c), n))

  /** Shared by eval and generated code (the loop is identical either
    * way; a static call keeps the generated method under codegen's
    * 8k-bytecode split threshold).
    */
  def maxCount(arr: ArrayData, n: Int): Long = {
    val len = arr.numElements()
    if (len < n) return 0L
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    val sep = UTF8String.fromString(" ")
    var best = 0
    var i = 0
    while (i <= len - n) {
      var ok = true
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n && ok) {
        if (arr.isNullAt(i + j)) ok = false else parts(j) = arr.getUTF8String(i + j)
        j += 1
      }
      if (ok) {
        val key = UTF8String.concatWs(sep, parts: _*)
        var c = counts.get(key)
        if (c == null) { c = new Array[Int](1); counts.put(key, c) }
        c(0) += 1
        if (c(0) > best) best = c(0)
      }
      i += 1
    }
    best.toLong
  }
}

/** Number of DISTINCT contiguous `n`-grams of a token array — the
  * one-pass codegen'd equivalent of `distinctCount(shinglesN(toks, n))`
  * (used for the duplicated-3-gram fraction: `n_grams − distinct`).
  * Same window semantics as [[MaxShingleMultiplicity]]: null-containing
  * windows skipped, fewer than `n` tokens → 0, null array → null, and
  * the space-joined key counts exactly like the composed form because
  * shinglesN joins with the same separator.
  */
case class DistinctShingleCount(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    DistinctShingleCount.distinctCount(arr, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.DistinctShingleCount.distinctCount($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): DistinctShingleCount =
    copy(child = newChild)
}

object DistinctShingleCount {
  def apply(c: Column, n: Int): Column =
    GraftSqlBridge.column(DistinctShingleCount(GraftSqlBridge.expression(c), n))

  def distinctCount(arr: ArrayData, n: Int): Long = {
    val len = arr.numElements()
    if (len < n) return 0L
    val seen = new java.util.HashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i <= len - n) {
      var ok = true
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n && ok) {
        if (arr.isNullAt(i + j)) ok = false else parts(j) = arr.getUTF8String(i + j)
        j += 1
      }
      if (ok) seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    seen.size.toLong
  }
}
