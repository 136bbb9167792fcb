package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** The session-memoized persisted-relation contract every shared family
  * pipeline follows (lshShared, unigramCounts, imageShared, ...), in one
  * place for the relations added since: stale sessions are evicted
  * (a stopped SparkContext must not pin a DataFrame), the build runs at
  * most once per (session, dir), and a memo hit whose cache was dropped
  * (Bench clears the cache between families) is re-persisted lazily.
  *
  * `build` must RETURN AN ALREADY-PERSISTED frame (builds often cache
  * intermediates, materialize, and release them — only the final persist
  * is this helper's concern).
  */
private[queries] object RelationMemo {
  def relation(map: scala.collection.mutable.Map[(SparkSession, String), DataFrame],
               key: (SparkSession, String))(build: => DataFrame): DataFrame =
    map.synchronized {
      map.filterInPlace { case ((ks, _), _) => !ks.sparkContext.isStopped }
      val memo = map.getOrElseUpdate(key, build)
      if (memo.storageLevel == StorageLevel.NONE) memo.persist()
      memo
    }
}
