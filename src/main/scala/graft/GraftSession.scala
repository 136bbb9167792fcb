package graft

import org.apache.spark.sql.SparkSession

/** Shared session configuration for the graft engine.
  *
  * Central place for the settings every entrypoint (Verify, Bench, tests)
  * must agree on:
  *  - UTC session time zone (oracle parity — DuckDB runs UTC);
  *  - `nanosAsLong`: some driver testdata generations write ns-precision
  *    parquet timestamps, which Spark's vectorized reader rejects by
  *    default (PARQUET_TYPE_ILLEGAL). We read them as raw ns longs and
  *    truncate to µs in [[graft.sources.Tables]] — exactly DuckDB's
  *    behavior (its TIMESTAMP is µs and it truncates ns parquet on read);
  *  - `inferTimestampNTZ` OFF: other generations write µs timestamps
  *    with `isAdjustedToUTC=false`, which Spark 4 would otherwise type as
  *    TIMESTAMP_NTZ — breaking `unix_micros` and every epoch-arithmetic
  *    path. Disabling the inference restores the classic reading: stored
  *    micros are UTC instants (TimestampType), which with the UTC session
  *    zone is bit-for-bit DuckDB's `epoch_us` view of the same file;
  *  - AQE on (runtime re-planning, skew-join handling at scale);
  *  - shuffle partitions sized to local cores, not the 200 default.
  */
object GraftSession {
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")

  /** Local session for tests/tools. */
  def local(cpus: Int = Runtime.getRuntime.availableProcessors): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cpus]"), cpus.toString).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
