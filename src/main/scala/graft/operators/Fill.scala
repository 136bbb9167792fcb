package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Null-repair operators: forward fill, backward fill, linear
  * interpolation over a time order.
  *
  * Reference: `fill_missing_values_in_df`
  * (/root/reference/powerdatapipeline/datapipeline/pandas_utilities.py:131-152):
  * forward-fill for instantaneous measurements, linear interpolation for
  * cumulative ones (`columns_to_avoid`, e.g. energy counters), backfill
  * fallback when leading NaNs remain.
  *
  * Scale design: each fill is window-function-only — partition by the
  * series key so a 100 TB table parallelizes per series; no collect, no
  * shuffle beyond the one hash-partition per window spec (and all four
  * window passes below share the SAME partitioning+ordering, so Catalyst
  * plans a single sort, not four).
  */
object Fill {

  private def part(partitionBy: Seq[String], orderBy: Seq[String]) =
    (if (partitionBy.isEmpty) Window.partitionBy() else Window.partitionBy(partitionBy.map(col): _*))
      .orderBy(orderBy.map(col): _*)

  /** Last non-null value at or before each row (forward fill). */
  def ffill(c: Column, partitionBy: Seq[String], orderBy: Seq[String]): Column =
    last(c, ignoreNulls = true)
      .over(part(partitionBy, orderBy).rowsBetween(Window.unboundedPreceding, 0))

  /** First non-null value at or after each row (backward fill). */
  def bfill(c: Column, partitionBy: Seq[String], orderBy: Seq[String]): Column =
    first(c, ignoreNulls = true)
      .over(part(partitionBy, orderBy).rowsBetween(0, Window.unboundedFollowing))

  /** Linear interpolation between the previous and next non-null values,
    * weighted by a numeric time axis `tsSec`. Rows before the first /
    * after the last non-null fall back to bfill / ffill respectively
    * (mirroring the reference's backfill fallback).
    */
  def interpolate(v: Column, tsSec: Column, partitionBy: Seq[String], orderBy: Seq[String]): Column = {
    val before = part(partitionBy, orderBy).rowsBetween(Window.unboundedPreceding, -1)
    val after = part(partitionBy, orderBy).rowsBetween(1, Window.unboundedFollowing)
    val prev = last(when(v.isNotNull, struct(tsSec.as("t"), v.as("v"))), ignoreNulls = true).over(before)
    val next = first(when(v.isNotNull, struct(tsSec.as("t"), v.as("v"))), ignoreNulls = true).over(after)
    // duplicate-timestamp guard: when the surrounding observations share
    // a timestamp the slope is 0/0 — fall through to the ffill branch
    // instead of emitting NaN
    when(v.isNotNull, v)
      .when(prev.isNotNull && next.isNotNull && next("t") =!= prev("t"),
        prev("v") + (next("v") - prev("v")) * (tsSec - prev("t")) / (next("t") - prev("t")))
      .when(prev.isNotNull, prev("v"))
      .otherwise(next("v"))
  }
}
