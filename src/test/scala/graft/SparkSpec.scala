package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base for all specs: one shared local session per JVM (sbt forks a
  * single test JVM; getOrCreate dedups across suites).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  lazy val sf: String = "/root/testdata/sf0.001"

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
