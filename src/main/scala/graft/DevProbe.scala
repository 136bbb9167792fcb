package graft

/** Dev-only scratch probe for optimization-round measurements; not part
  * of the driver contract. Body is edited ad hoc during the round.
  *
  * Current body: per-key Spark-job/stage/task counts + min-of-2 timing
  * over the full registry (or a comma-separated subset in arg 0) — the
  * flat-tail overhead profile. At sf0.1 a key's wall clock is dominated
  * by scheduler round-trips (jobs × ~0.05-0.15 s), so keys with outsized
  * job counts are the per-key-overhead optimization surface.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local(32)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    s.sparkContext.setLogLevel("WARN")
    s.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      try s.read.parquet(s"$d/$t.parquet").limit(1).collect()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(e.stageInfos.size)
        tasks.addAndGet(e.stageInfos.map(_.numTasks).sum)
      }
    })
    val only: Option[Set[String]] =
      if (args.nonEmpty && args(0).nonEmpty) Some(args(0).split(",").toSet) else None
    graft.queries.Registry.families.foreach { case (fam, keys) =>
      keys.filter(k => only.forall(_.contains(k))).foreach { name =>
        val fn = SparkEntry.queries(name)
        try {
          val samples = (0 until 2).map { i =>
            if (i == 1) { jobs.set(0); stages.set(0); tasks.set(0) } // warm-run counts
            val t0 = System.nanoTime()
            fn(s, d).count()
            (System.nanoTime() - t0) / 1e9
          }
          // listener events are async; tiny settle so counts attribute
          Thread.sleep(30)
          println(f"JOBPROF $fam%s $name%s min=${samples.min}%.3f jobs=${jobs.get}%d stages=${stages.get}%d tasks=${tasks.get}%d")
        } catch { case e: Throwable =>
          println(s"JOBPROF $fam $name FAILED ${e.getClass.getSimpleName}")
        }
      }
      s.catalog.clearCache()
    }
    s.stop()
  }
}
