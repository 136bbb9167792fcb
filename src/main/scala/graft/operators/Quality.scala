package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, NumericType}

/** Data-quality / validation operators — the reference's assertion surface
  * made queryable (errors as data, not exceptions).
  *
  * Reference (cites into /root/reference/):
  *  - `investigate_csv_file` (datapipeline_utilities.py:12-38): row/col
  *    counts + empty-cell count (hard error if any).
  *  - NaN predicates `check_column_all_nan` / `check_column_all_not_nan`
  *    (pandas_utilities.py:72-88) — the latter has an inverted condition
  *    in the reference (raises on *clean* columns, SURVEY §2.12 #1); we
  *    implement the intended semantics.
  *  - `check_equality_in_dataset` (tfdataset_utilities.py:172-188): all
  *    values of a column equal?
  *  - `check_time_intervals` (tfdataset_utilities.py:190-197) /
  *    `add_select_resample_csvdataset` interval audit
  *    (datapipeline.py:629-638): constant sampling interval == declared.
  *  - `validation_errors_to_df` (utilities.py:63-94): error records as a
  *    DataFrame (reference bug: missing pandas import — fixed here by
  *    construction).
  *
  * All checks are single aggregations (map-side combined) — one scan,
  * driver receives O(columns) rows. Scale-safe at 100 TB.
  */
object Quality {

  /** Per-column null/NaN counts + total rows, one aggregation pass.
    * Output: one row per column (column_name, n_rows, n_null, n_distinct
    * omitted — distinct is a separate, heavier op).
    */
  def nullProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggExprs = count(lit(1)).as("__n") +:
      columns.map { c =>
        val isBad = df.schema(c).dataType match {
          case DoubleType | FloatType => col(c).isNull || isnan(col(c))
          case _ => col(c).isNull
        }
        sum(when(isBad, 1L).otherwise(0L)).as(s"__null_$c")
      }
    val row = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    columns.map(c => (c, n, row.getAs[Long](s"__null_$c")))
      .toDF("column_name", "n_rows", "n_null")
  }

  /** All values in a column equal? (min == max, null-safe). */
  def allEqual(c: Column): Column = min(c) <=> max(c)

  /** Validation errors as data (`validation_errors_to_df`,
    * utilities.py:63-94 — which NameErrors on a missing pandas import in
    * the reference; fixed by construction here): run a set of named
    * checks, collect failures into a DataFrame sink-able like any other
    * table instead of throwing on the first.
    */
  def errorsAsDf(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null-as-fail: a predicate evaluating to NULL (e.g. `x > 0` on a
    // null x) must count as a failure, not slip through the negation
    val aggExprs = checks.map { case (name, pred) =>
      sum(when(pred, 0L).otherwise(1L)).as(s"__fail_$name")
    }
    val row = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    checks.map { case (name, _) => (name, row.getAs[Long](s"__fail_$name")) }
      .filter(_._2 > 0)
      .toDF("check_name", "n_failures")
  }

  /** Fault injection — the reference's own negative-path driver
    * (`add_errors`, pandas_utilities.py:50-52: `df.loc[1,"vb"] = 1e7`
    * then rename `va` → `Va`): corrupt the single cell of `corruptCol`
    * at 0-based order position `rowPos` to `magnitude`, and rename
    * `renameFrom` to `renameTo`. Exists to prove the Quality checks and
    * schema verification actually fire — see QualitySpec.
    *
    * The positional corruption needs a total order; with no partition
    * key that takes the distributed [[WindowOps.withRowIdx]] path (no
    * single-task global sort even for a corruptor).
    */
  def addErrors(df: DataFrame, orderBy: Seq[String], corruptCol: String, rowPos: Long,
                magnitude: Double, renameFrom: String, renameTo: String): DataFrame =
    WindowOps.withRowIdx(df, Seq.empty, orderBy, "__rn")
      .withColumn(corruptCol,
        when(col("__rn") === rowPos + 1, lit(magnitude)).otherwise(col(corruptCol)))
      .drop("__rn")
      .withColumnRenamed(renameFrom, renameTo)

  /** Do all adjacent intervals equal `expected`? One boolean row.
    * `intervals` is a pre-computed adjacent-diff column (see
    * [[WindowOps.lagInterval]]).
    */
  def constantInterval(df: DataFrame, interval: Column, expected: Long): DataFrame =
    df.agg((min(interval) <=> max(interval) && min(interval) <=> lit(expected)).as("interval_ok"))
}
