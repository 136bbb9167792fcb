package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Feature-hashing text embedding (the hashing trick, Weinberger et al.
  * ICML'09): a token array maps to a `dims`-long SIGNED-COUNT vector —
  * token w lands in dimension `h(w) mod dims` with sign from the next
  * hash bit, where h(w) is the first 56 bits of md5(w) (byte-identical
  * to the `conv(substr(md5(w),1,14),16,10)` convention the
  * MinHash/shingle family shares — NOT `TextOps.hash60`, which reads 15
  * hex chars — so the oracle reproduces every coordinate with the same
  * `('0x' || …)::BIGINT` rendering; FeatureHashSpec pins the parity). Signed counts keep the vector EXACT-INTEGER — sums are
  * order-free across any partitioning, and downstream hyperplane
  * bucketing ([[HyperplaneBuckets]]) consumes the long array directly.
  *
  * Why an expression (SURVEY §7.3 preference (b)): the composable form
  * is a 2×dims-lambda `aggregate`/`transform` chain evaluating one md5
  * PER TOKEN PER DIMENSION interpreted; this walks the token array once
  * inside WholeStageCodegen.
  */
case class FeatureHashVector(child: Expression, dims: Int)
    extends UnaryExpression {

  require(dims >= 2 && dims <= 4096, s"dims must be in [2, 4096], got $dims")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argument must be array<string> (tokens), got $other")
  }

  override def nullSafeEval(input: Any): Any =
    FeatureHashVector.vector(input.asInstanceOf[ArrayData], dims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.FeatureHashVector.vector($arr, $dims);")

  override protected def withNewChildInternal(newChild: Expression): FeatureHashVector =
    copy(child = newChild)
}

object FeatureHashVector {
  // one digest per task thread, reset per use — a JCA getInstance per
  // TOKEN would pay a synchronized provider lookup + allocation millions
  // of times per scan
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 56 bits of md5 over the UTF-8 bytes — exactly
    * `('0x' || substr(md5(w), 1, 14))::BIGINT` (14 hex chars = the first
    * 7 digest bytes, big-endian). Non-negative by construction.
    */
  def hash56(w: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(w.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (dig(i) & 0xffL); i += 1 }
    h
  }

  /** Public: called from generated code. Null elements are skipped
    * (contribute nothing), matching the oracle's list_filter-free
    * rendering over non-null token arrays.
    */
  def vector(toks: ArrayData, dims: Int): ArrayData = {
    val v = new Array[Long](dims)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = hash56(toks.getUTF8String(i))
        val d = (h % dims).toInt
        v(d) += (if ((h / dims) % 2 == 0L) 1L else -1L)
      }
      i += 1
    }
    new GenericArrayData(v)
  }

  def apply(toks: Column, dims: Int): Column =
    GraftSqlBridge.column(FeatureHashVector(GraftSqlBridge.expression(toks), dims))
}
