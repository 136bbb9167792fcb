package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Count of a string array's elements that MIGHT be members of a Bloom
  * filter — the sketch-sided replacement for `explode` + broadcast-join
  * membership on the contamination screen's hot path.
  *
  * Why (SURVEY §7.3 preference (b)): the exact screen broadcasts the
  * benchmark-shingle RELATION and joins; at 100 TB-corpus benchmark sizes
  * (10⁸–10⁹ distinct shingles) that broadcast hash relation is tens of GB
  * and the explode multiplies the shuffle input by the per-doc gram
  * count. The Bloom sketch holds the same membership decision in
  * ~1.8 MB / 10⁶ items at 0.1% fpp, rides to executors as ONE plan
  * reference, and the probe is a tight per-element loop inside
  * whole-stage codegen — no explode, no join, no shuffle.
  *
  * One-sided error, matching `BloomFilter`'s contract: every true member
  * is counted (no false negatives — `decontaminate_bloom`'s oracle locks
  * this per doc), plus an fpp-bounded overcount (locked in aggregate by
  * BloomScreenSpec). Null elements never count; null array → null.
  *
  * The probe uses `mightContainBinary(utf8Bytes)` — the byte-level dual
  * of the `putString` path `DataFrameStatFunctions.bloomFilter` uses to
  * build, so build and probe hash identical bytes.
  */
case class BloomArrayHits(child: Expression, bloom: BloomFilter) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var c = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && bloom.mightContainBinary(arr.getUTF8String(i).getBytes)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      s"""
         |long $c = 0L;
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i) && $bloomRef.mightContainBinary($arr.getUTF8String($i).getBytes())) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomArrayHits =
    copy(child = newChild)
}

object BloomArrayHits {
  def apply(c: Column, bloom: BloomFilter): Column =
    GraftSqlBridge.column(BloomArrayHits(GraftSqlBridge.expression(c), bloom))
}
