package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Datetime derivation operators.
  *
  * Reference behavior being re-expressed (cites into /root/reference/):
  *  - `convert_to_datetimestamp` (tfdataset_utilities.py:114-120): string
  *    concat `f"{date} {time}"` of two string columns, executed through a
  *    per-batch `tf.py_function` Python escape. Here: pure `concat_ws`
  *    (codegen'd, no UDF).
  *  - `convert_to_datetimestampseconds` (tfdataset_utilities.py:122-128):
  *    parse a datetime string to integral epoch seconds stored as float64.
  *    Here: `unix_timestamp(to_timestamp(_))` under the session's UTC zone.
  *  - `datetime_to_seconds` pandas variant (pandas_utilities.py:59-64).
  *
  * Scale note: all of these are stateless scalar expressions — they stay
  * inside WholeStageCodegen, never shuffle, and push no data to the driver.
  */
object TimeFns {

  /** `concat_ws(" ", date, time)` — reference `convert_to_datetimestamp`. */
  def dtConcat(dateCol: Column, timeCol: Column): Column =
    concat_ws(" ", dateCol, timeCol)

  /** Datetime string -> integral epoch seconds (as long). */
  def dtToEpoch(c: Column): Column = unix_timestamp(to_timestamp(c))

  /** Timestamp -> epoch microseconds (bigint). Exact on both Spark
    * (`unix_micros`) and DuckDB (`epoch_us`), so it is the canonical
    * cross-engine time representation for oracle-checked queries.
    */
  def epochMicros(ts: Column): Column = unix_micros(ts)

  /** Timestamp -> whole epoch seconds (bigint), floor semantics. */
  def epochSeconds(ts: Column): Column = floor(unix_micros(ts) / lit(1000000L)).cast("long")

  /** Timestamp -> fractional epoch seconds (double). */
  def epochSecondsFrac(ts: Column): Column = unix_micros(ts) / lit(1000000.0)

  /** Floor a timestamp's epoch-seconds to an interval bucket (bigint
    * bucket start in epoch seconds). Used by resampling and time-aligned
    * joins; epoch-0 aligned in both engines by construction.
    */
  def timeBucket(ts: Column, intervalSec: Long): Column =
    (floor(unix_micros(ts) / lit(1000000L * intervalSec)) * intervalSec).cast("long")

  /** Seconds -> (days, minutes, seconds) — reference `convert_seconds`
    * (datapipeline_utilities.py:182-191).
    */
  def convertSeconds(totalSec: Column): (Column, Column, Column) = {
    val days = floor(totalSec / lit(86400L))
    val minutes = floor((totalSec % lit(86400L)) / lit(60L))
    val seconds = totalSec % lit(60L)
    (days, minutes, seconds)
  }
}
