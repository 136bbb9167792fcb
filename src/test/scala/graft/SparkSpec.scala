package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base for all specs: one shared local session per JVM (sbt forks a
  * single test JVM; getOrCreate dedups across suites).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  lazy val sf: String = "/root/testdata/sf0.001"

  /** Exact integer round-half-away(a/b), b > 0 — the ExactRound algebra
    * driver-side, ONE copy for every spec that recomputes an e4/e6
    * column (a drifted re-type here would pin the wrong algebra).
    */
  def halfAway(a: Long, b: Long): Long =
    if (a < 0) -((2 * -a + b) / (2 * b)) else (2 * a + b) / (2 * b)

  /** The CCNet value-group tertile fold driver-side — shared by the
    * batch spec (exact scores) and the streaming parity spec (sketch
    * scores), mirroring the single Spark-side ccnetTertiles: per lang,
    * ascending value groups, bucket(v) = (3·cum_before) / n.
    * Input (id, lang, value); output (id, lang, value, bucket).
    */
  def valueGroupTertiles(docs: Seq[(Long, String, Long)]): Set[(Long, String, Long, String)] =
    docs.groupBy(_._2).flatMap { case (lang, ds) =>
      val n = ds.size.toLong
      var cumBefore = 0L
      ds.groupBy(_._3).toSeq.sortBy(_._1).flatMap { case (v, members) =>
        val b = (3 * cumBefore) / n match {
          case 0 => "head"; case 1 => "middle"; case _ => "tail"
        }
        cumBefore += members.size
        members.map(m => (m._1, lang, v, b))
      }
    }.toSet

  /** Write a fixture `documents` table to a fresh temp dir usable as an
    * sfDir by any registered query (the `Tables.table` `<name>.parquet`
    * layout, in ONE place), and register the dir for JVM-exit cleanup.
    */
  def writeDocsFixture(df: org.apache.spark.sql.DataFrame): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fixture")
    df.write.mode("overwrite").parquet(tmp.resolve("documents.parquet").toString)
    tmp.toFile.deleteOnExit()
    tmp.toString
  }
}
