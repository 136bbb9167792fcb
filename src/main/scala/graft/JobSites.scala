package graft

/** Dev-only: per-job call-site listing for one warm query invocation —
  * the job-count attribution tool behind the r22 scheduler-floor work
  * (which driver round trips does a warm key actually pay?). Not part
  * of the driver contract.
  *
  * Usage: sbt "runMain graft.JobSites <query>"
  */
object JobSites {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: JobSites <query>")
    val name = args(0)
    val s = GraftSession.local(32)
    s.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkEntry.queries(name)(s, d).count() // warm: memo builds land here
    val descs = scala.collection.mutable.ListBuffer.empty[String]
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(e.properties.getProperty("spark.job.description"))
          .orElse(Option(e.properties.getProperty("callSite.short"))).getOrElse("?")
        descs.synchronized {
          descs += s"stages=${e.stageInfos.size} tasks=${e.stageInfos.map(_.numTasks).sum} $site"
        }
      }
    })
    SparkEntry.queries(name)(s, d).count()
    Thread.sleep(300)
    descs.zipWithIndex.foreach { case (x, i) => println(f"JOBSITE$i%02d $x") }
    s.stop()
  }
}
