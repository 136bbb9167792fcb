package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Union of all query groups. Keys must be unique across groups; the
  * `require` below guards against silent shadowing in the Map merge.
  */
object Registry {
  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (CoreQueries.queries, CoreQueries.oracleSql),
      (FeatureQueries.queries, FeatureQueries.oracleSql),
      (WindowQueries.queries, WindowQueries.oracleSql),
      (JoinQueries.queries, JoinQueries.oracleSql),
      (TextQueries.queries, TextQueries.oracleSql),
      (DedupQueries.queries, DedupQueries.oracleSql),
      (SimQueries.queries, SimQueries.oracleSql),
      (RelQueries.queries, RelQueries.oracleSql),
    )

  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = groups.flatMap(_._1)
    require(all.map(_._1).distinct.size == all.size, "duplicate query keys across groups")
    all.toMap
  }

  val oracleSql: Map[String, String] = groups.flatMap(_._2).toMap
}
