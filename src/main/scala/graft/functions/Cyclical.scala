package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cyclical time encodings: `sin/cos(t · 2π/P)` pairs of epoch seconds.
  *
  * Reference (cites into /root/reference/): `get_minute_encoding` /
  * `get_hour_encoding` / `get_day_encoding` and the `cyclical_*` FeatureSpace
  * modes (powerdatapipeline/datapipeline/datapipeline.py:511-566), plus
  * `pack_time_features` (tfdataset.py:137-152) and the pandas/NumPy path
  * (datapipeline_utilities.py:77-129) which also adds second & year periods.
  *
  * Known reference quirk (SURVEY.md §2.12 #5): the TF/Keras paths hardcode
  * π ≈ 3.14 while the pandas path uses `np.pi`; the two built-in paths
  * disagree by ~0.05%. We implement the *intended* semantics (`math.Pi`)
  * by default and expose the constant as a parameter for bug-parity runs.
  *
  * Pure scalar expressions: codegen-friendly, no shuffle, scale-free.
  */
object Cyclical {
  val SecondsPerMinute = 60.0
  val SecondsPerHour = 3600.0
  val SecondsPerDay = 86400.0
  val SecondsPerYear = 365.2425 * 86400.0 // pandas path, datapipeline_utilities.py:104-106

  /** The reference's TF-path approximation of π (datapipeline.py:512-520). */
  val ReferencePi = 3.14

  /** sin/cos pair for one period, `[sin, cos]` order as in the reference
    * (datapipeline.py:540-551: sin appended before cos).
    *
    * The phase is reduced (`t mod P`) before the multiply — mathematically
    * identical (sin is 2π-periodic; the reference feeds the raw ~1e9 rad
    * argument) but numerically far better: aligned epochs give exactly
    * sin 0 / cos 1, and the sin argument never exceeds 2π.
    */
  def pair(epochSec: Column, periodSec: Double, pi: Double = math.Pi): (Column, Column) = {
    val theta = (epochSec % lit(periodSec)) * lit(2.0 * pi / periodSec)
    (sin(theta), cos(theta))
  }

  /** sin/cos pair with exact phase reduction: reduces the epoch to
    * `t mod P` *exactly* in integer µs before the float multiply, so the
    * sin/cos argument stays in [0, 2π) — numerically far better than
    * `sin(epoch · 2π/P)` whose argument is ~1e8 rad (the reference's
    * formulation), and cross-engine stable (the reduction is exact bigint
    * arithmetic in Spark and DuckDB alike; mathematically identical since
    * sin is 2π-periodic).
    */
  def pairReduced(epochUs: Column, periodSec: Double, pi: Double = math.Pi): (Column, Column) = {
    val periodUs = (periodSec * 1e6).toLong
    val theta = (epochUs % lit(periodUs)) * lit(2.0 * pi / (periodSec * 1e6))
    (sin(theta), cos(theta))
  }

  /** All minute/hour/day pairs in reference order
    * `[sin_min, cos_min, sin_hour, cos_hour, sin_day, cos_day]`
    * (`cyclical_minute_hour_day`, datapipeline.py:540-551).
    */
  def minuteHourDay(epochSec: Column, pi: Double = math.Pi): Seq[(String, Column)] = {
    val (sm, cm) = pair(epochSec, SecondsPerMinute, pi)
    val (sh, ch) = pair(epochSec, SecondsPerHour, pi)
    val (sd, cd) = pair(epochSec, SecondsPerDay, pi)
    Seq("sin_minute" -> sm, "cos_minute" -> cm,
        "sin_hour" -> sh, "cos_hour" -> ch,
        "sin_day" -> sd, "cos_day" -> cd)
  }
}
