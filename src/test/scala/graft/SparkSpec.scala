package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base for all specs: one shared local session per JVM (sbt forks a
  * single test JVM; getOrCreate dedups across suites).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  lazy val sf: String = "/root/testdata/sf0.001"
}
