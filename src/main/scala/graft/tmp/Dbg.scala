package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Dbg {
  def main(args: Array[String]): Unit = {
    val cpus = "4"
    val s = graft.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val ev = s.read.parquet("/root/testdata/sf0.01/events.parquet").select(col("event_id"), col("value"))
    var found = false
    var i = 0
    while (!found && i < 10) {
      i += 1
      val idx = graft.operators.WindowOps.withRowIdx(ev, Seq.empty, Seq("event_id"), "rn")
      idx.coalesce(1).write.mode("overwrite").parquet("/tmp/rn_dbg")
      val back = s.read.parquet("/tmp/rn_dbg")
      val n = back.count()
      val d = back.select("rn").distinct.count()
      val mx = back.agg(max("rn")).head.getLong(0)
      println(s"RUN$i N=$n DISTINCT=$d MAX=$mx")
      if (d != n || mx != n) {
        found = true
        println("DUPED RNS:")
        back.groupBy("rn").count.filter(col("count") > 1).orderBy("rn").show(20)
        println("GAP check around: rn histogram by 1000-bucket")
        back.groupBy((col("rn")/lit(1000)).cast("int").as("b")).count.orderBy("b").show(20)
      }
    }
    s.stop()
  }
}
