package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise sum of a numeric-array column as ONE aggregate buffer —
  * the centroid-learning primitive (SURVEY §7.3's "vector-sum custom
  * piece").
  *
  * Why: the composable formulation (`posexplode` the dims, then
  * `avg` per (cell, dim)) inflates every row 64× BEFORE the exchange, so
  * the shuffle carries O(rows·dims) records. This aggregate keeps one
  * `Array[Double]` buffer per group per task: partial aggregation
  * (`ObjectHashAggregate` map-side) collapses each partition to one
  * buffer per cell, and only O(cells) serialized buffers cross the wire.
  * At k-means scale (corpus-wide pass per Lloyd round) that is the
  * difference between shuffling the corpus ×dims and shuffling ×k rows.
  *
  * Semantics: per-element left-to-right double addition within a
  * partition, buffers merged in task-completion order — the same
  * floating-point nondeterminism class as the built-in `avg`/`sum` it
  * replaces, so downstream consumers apply the identical `round(,6)`
  * convention before cross-engine comparison. Null ARRAYS are skipped
  * (count them with `count(col)` alongside); null ELEMENTS add 0; a
  * length mismatch between rows is an error (ragged input is corrupt
  * for centroid math, not a case to paper over).
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType | ShortType | ByteType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argument must be an array of a primitive numeric type, got ${child.dataType}")

  @transient private lazy val read: (ArrayData, Int) => Double = elemType.get match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType => (a, i) => a.getLong(i).toDouble
    case ShortType => (a, i) => a.getShort(i).toDouble
    case ByteType => (a, i) => a.getByte(i).toDouble
  }

  // null = "no rows seen yet" — distinct from a zero-length input array
  override def createAggregationBuffer(): Array[Double] = null

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buffer == null) new Array[Double](n) else buffer
    require(acc.length == n,
      s"vector_sum over ragged arrays: saw lengths ${acc.length} and $n")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) acc(i) += read(arr, i)
      i += 1
    }
    acc
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    if (other == null) return buffer
    if (buffer == null) return other
    require(buffer.length == other.length,
      s"vector_sum merge over ragged arrays: ${buffer.length} vs ${other.length}")
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    if (buffer == null) return Array.emptyByteArray
    // length-prefixed so a zero-length array round-trips distinct from null
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.length)
    bb.putInt(buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
  override def prettyName: String = "vector_sum"
}

object VectorSumAgg {
  /** Column-level entry point: `vectorSum(vec)` → `array<double>` of
    * elementwise sums (null when the group saw no non-null arrays).
    */
  def vectorSum(c: Column): Column =
    GraftSqlBridge.column(VectorSumAgg(GraftSqlBridge.expression(c)).toAggregateExpression())
}
