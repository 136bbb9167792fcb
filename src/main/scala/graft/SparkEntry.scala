package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — one oracle-checked query per operator of
  * SURVEY.md §2 (+ the LLM-pipeline extensions). Conventions shared by
  * every query/oracle pair (see SURVEY §5.2):
  *
  *  - deterministic: every result ends with an ORDER BY on a unique key;
  *  - cross-engine floats: per-row +,-,*,/ on identical inputs is
  *    bit-exact IEEE and left unrounded; anything order-dependent
  *    (sum/avg/var over fractional doubles) or transcendental (sin/cos)
  *    is `round(_, 4..6)`; monetary sums go through DECIMAL(18,2) and
  *    back to double (exact in both engines);
  *  - time: timestamps never cross the engine boundary raw (parquet ns
  *    vs µs); they travel as `unix_micros` bigints (Spark) == `epoch_us`
  *    (DuckDB).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CoreQueries.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = graft.queries.Registry.queries

  def oracleSql: Map[String, String] = graft.queries.Registry.oracleSql
}
