package graft

import org.apache.spark.sql.SparkSession

/** Dev-only targeted timing: run the named queries (comma-separated arg)
  * with Bench's warmup and min-of-3 sampling, print one line per query.
  * Not part of the driver contract — Bench.scala is the measured artifact;
  * this exists so iterating on one slow query doesn't cost a full suite run.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchOne q1,q2"
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: BenchOne <query,query,...>")
    val names = args(0).split(",").toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val samples = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHONE $name%s min=${samples.min}%.3f samples=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
