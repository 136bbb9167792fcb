package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The centroid codebook a [[NearestCentroid]] expression scores against,
  * shipped to executors once per plan as a codegen reference object (the
  * task-broadcast path every literal takes — a few MB even at
  * k = thousands × 64 dims). Holds the k × dim matrix, per-centroid norms
  * and cell ids as primitive arrays so the scoring loop stays
  * allocation-free and JIT-friendly.
  *
  * Content-based equality (not reference): Catalyst compares expressions
  * structurally for canonicalization/subexpression elimination, and two
  * plans built from the same learned centroids must compare equal.
  */
final class CentroidModel(val cells: Array[Long], val cvecs: Array[Array[Double]],
                          val cnrms: Array[Double]) extends Serializable {
  require(cells.length > 0, "CentroidModel needs at least one centroid")
  require(cells.length == cvecs.length && cells.length == cnrms.length,
    s"inconsistent model arity: ${cells.length}/${cvecs.length}/${cnrms.length}")
  require(cvecs.forall(_.length == cvecs(0).length),
    "all centroids must share one dimensionality")

  val dim: Int = cvecs(0).length

  /** Argmax cell for one (already-extracted) vector: score each centroid
    * as `dot(v, cvec) / cnrm` — elementwise double products summed
    * left-to-right, the exact IEEE order of [[ArrayDotProduct]] and the
    * DuckDB oracles — highest score wins, ties break to the SMALLEST
    * cell id. Double comparison follows Spark's SQL ordering
    * (`-0.0 == 0.0` via the `==` fast path, NaN greatest via
    * `Double.compare`), so the result is bit-identical to the
    * `greatest(struct(score, -cell))` formulation it supersedes.
    */
  def assignVec(v: Array[Double]): Long = {
    var best = 0.0
    var bestCell = 0L
    var first = true
    var c = 0
    while (c < cells.length) {
      val cv = cvecs(c)
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * cv(i); i += 1 }
      s /= cnrms(c)
      val cmp = if (first) 1 else if (s == best) 0 else java.lang.Double.compare(s, best)
      if (cmp > 0 || (cmp == 0 && cells(c) < bestCell)) {
        best = s; bestCell = cells(c); first = false
      }
      c += 1
    }
    bestCell
  }

  override def equals(o: Any): Boolean = o match {
    case m: CentroidModel =>
      java.util.Arrays.equals(cells, m.cells) &&
        java.util.Arrays.equals(cnrms, m.cnrms) &&
        cvecs.length == m.cvecs.length &&
        cvecs.indices.forall(i => java.util.Arrays.equals(cvecs(i), m.cvecs(i)))
    case _ => false
  }

  override def hashCode: Int =
    31 * java.util.Arrays.hashCode(cells) + java.util.Arrays.hashCode(cnrms)
}

/** Native codegen'd nearest-centroid assignment: the argmax over a
  * [[CentroidModel]] evaluated as ONE scalar expression — a pure
  * projection, so a k-means/IVF assignment pass over the corpus plans
  * with ZERO exchanges at ANY k.
  *
  * Why (SURVEY §7.3 preference order (b), the 100 TB Lloyd-iteration
  * shape): the when-chain/`greatest(struct(...))` argmax compiles k
  * inline dot products into one generated method — analysis and codegen
  * time grow with k and the JIT's 64 KB method limit lands near
  * k ≈ 64 × 64 dims. The relational alternative (broadcast join + max
  * aggregation) is k-independent but exchanges one row per corpus row
  * per assignment pass. This expression is both k-independent (the k × d
  * loop lives in [[CentroidModel.assignVec]], JIT-compiled once,
  * reference-shipped not inlined) and exchange-free — the generated code
  * only extracts the row's vector to a primitive array and calls the
  * model.
  *
  * Null semantics: a null input array yields null; null ELEMENTS
  * contribute 0; a dimensionality mismatch with the model yields null
  * (the [[ArrayDotProduct]] contract).
  */
case class NearestCentroid(child: Expression, model: CentroidModel)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  /** Nullable even over non-null input: a dim mismatch must signal. */
  override def nullable: Boolean = true

  private def numericElem: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType | ShortType | ByteType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (numericElem.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argument must be an array of a primitive numeric type, got ${child.dataType}")

  @transient private lazy val read: (ArrayData, Int) => Double = numericElem.get match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType => (a, i) => a.getLong(i).toDouble
    case ShortType => (a, i) => a.getShort(i).toDouble
    case ByteType => (a, i) => a.getByte(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != model.dim) return null
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = if (xs.isNullAt(i)) 0.0 else read(xs, i); i += 1 }
    model.assignVec(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = numericElem.get match {
      case FloatType => (a: String, i: String) => s"(double) $a.getFloat($i)"
      case DoubleType => (a: String, i: String) => s"$a.getDouble($i)"
      case IntegerType => (a: String, i: String) => s"(double) $a.getInt($i)"
      case LongType => (a: String, i: String) => s"(double) $a.getLong($i)"
      case ShortType => (a: String, i: String) => s"(double) $a.getShort($i)"
      case ByteType => (a: String, i: String) => s"(double) $a.getByte($i)"
      case other => throw new IllegalStateException(s"unsupported element type $other")
    }
    val modelRef = ctx.addReferenceObj("centroidModel", model, classOf[CentroidModel].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |if ($n != $modelRef.dim()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $v = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $v[$i] = $a.isNullAt($i) ? 0.0 : ${getter(a, i)};
         |  }
         |  ${ev.value} = $modelRef.assignVec($v);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** Column-level entry point over parallel (cell, cvec, cnrm) seqs. */
  def assign(vec: Column, cells: Seq[Long], cvecs: Seq[Seq[Double]],
             cnrms: Seq[Double]): Column =
    GraftSqlBridge.column(NearestCentroid(GraftSqlBridge.expression(vec),
      new CentroidModel(cells.toArray, cvecs.map(_.toArray).toArray, cnrms.toArray)))
}
