package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val series = (1 to 100).map(i => (i.toLong, (i % 3).toLong, i.toDouble))
    .toDF("id", "key", "v").cache()

  test("slidingWindow yields N-W+1 windows per partition, each of size W") {
    val w = WindowOps.slidingWindow(series, col("v"), 5, Seq("key"), Seq("id"))
    val counts = w.groupBy("key").count().collect().map(r => r.getLong(1)).sorted
    // keys 1,2 have 33 rows; key 0 has 34 → windows: 29,29,30
    assert(counts.toSeq == Seq(29, 29, 30))
    assert(w.filter(size(col("win")) =!= 5).count() == 0)
  }

  test("supervisedWindow splits input (W-1) and target (last)") {
    val w = WindowOps.supervisedWindow(series, col("v"), 4, Seq("key"), Seq("id"))
    assert(w.filter(size(col("input")) =!= 3).count() == 0)
    val row = w.orderBy("id").head()
    val win = row.getSeq[Double](row.fieldIndex("win")).toSeq
    assert(row.getSeq[Double](row.fieldIndex("input")).toSeq == win.init)
    assert(row.getAs[Double]("target") == win.last)
  }

  lazy val vecSeries = (1 to 20).map(i =>
    (i.toLong, Array(i * 1.0, i * 10.0, i * 100.0))).toSeq
    .toDF("id", "vec")

  test("supervisedWindowV2 splits columns: target = col 0 per row, input = cols 1..") {
    val w = WindowOps.supervisedWindowV2(vecSeries, col("vec"), 3, Seq.empty, Seq("id"))
    assert(w.count() == 18)
    val row = w.orderBy("id").head()
    val input = row.getSeq[scala.collection.Seq[Double]](row.fieldIndex("input"))
    val target = row.getSeq[Double](row.fieldIndex("target"))
    assert(target.toSeq == Seq(1.0, 2.0, 3.0))                 // col 0 of rows 1..3
    assert(input.map(_.toSeq) == Seq(Seq(10.0, 100.0), Seq(20.0, 200.0), Seq(30.0, 300.0)))
  }

  test("windowGather selects arbitrary feature/target indices in order") {
    val w = WindowOps.windowGather(vecSeries, col("vec"), 2,
      featureIdx = Seq(2, 0), targetIdx = Seq(1), Seq.empty, Seq("id"))
    val row = w.orderBy("id").head()
    val input = row.getSeq[scala.collection.Seq[Double]](row.fieldIndex("input"))
    val target = row.getSeq[scala.collection.Seq[Double]](row.fieldIndex("target"))
    assert(input.map(_.toSeq) == Seq(Seq(100.0, 1.0), Seq(200.0, 2.0)))  // [2,0] order kept
    assert(target.map(_.toSeq) == Seq(Seq(10.0), Seq(20.0)))
  }

  test("fixedBatches drops the remainder") {
    val b = WindowOps.fixedBatches(series, 30, Seq.empty, Seq("id"))
    assert(b.count() == 90) // 100 rows -> 3 full batches of 30
    assert(b.agg(countDistinct("batch_id")).head().getLong(0) == 3)
  }

  test("prefixSplit labels by position and fractions sum to N") {
    val sp = WindowOps.prefixSplit(series, (0.7, 0.2, 0.1), Seq.empty, Seq("id"))
    val counts = sp.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") == 70 && counts("test") == 20 && counts("eval") == 10)
    // prefix property: every train id < every test id < every eval id
    val maxTrain = sp.filter($"split" === "train").agg(max("id")).head().getLong(0)
    val minTest = sp.filter($"split" === "test").agg(min("id")).head().getLong(0)
    assert(maxTrain < minTest)
  }

  test("offsetSkip drops exactly the first n in order") {
    val o = WindowOps.offsetSkip(series, 10, Seq.empty, Seq("id"))
    assert(o.count() == 90)
    assert(o.agg(min("id")).head().getLong(0) == 11)
  }

  test("global row index is dense on a multi-partition frame (no dups, no gaps)") {
    // invariant behind WindowOps.globalRowIdx: the two-job zipWithIndex must
    // produce a permutation of 1..N even when the input arrives arbitrarily
    // partitioned (the pure-DataFrame formulation is flaky under AQE —
    // duplicated and gapped indices; see the scaladoc on globalRowIdx)
    val df = spark.range(0, 5000)
      .select((col("id") * 7919 % 10007).as("k"), col("id").as("payload"))
      .repartition(8)
    val idx = WindowOps.withRowIdx(df, Seq.empty, Seq("k", "payload"), "rn")
    val n = idx.count()
    assert(n == 5000)
    assert(idx.select("rn").distinct().count() == n)
    assert(idx.agg(max("rn"), min("rn")).head() match {
      case r => r.getLong(0) == n && r.getLong(1) == 1L
    })
    // order correctness: rn ascends with the total order (k, payload)
    val firstByOrder = df.orderBy("k", "payload").head()
    val firstByIdx = idx.filter(col("rn") === 1L).head()
    assert(firstByOrder.getLong(0) == firstByIdx.getLong(0) &&
      firstByOrder.getLong(1) == firstByIdx.getLong(1))
  }

  test("lagInterval computes next-minus-current (and reference sign flips)") {
    val df = Seq((1L, 10L), (2L, 25L), (3L, 45L)).toDF("id", "t")
    val d = df.select(col("id"), WindowOps.lagInterval(col("t"), Seq.empty, Seq("id")).as("i"))
      .orderBy("id").collect().map(r => Option(r.get(1)))
    assert(d.toSeq == Seq(Some(15L), Some(20L), None))
    val ref = df.select(
        WindowOps.lagInterval(col("t"), Seq.empty, Seq("id"), referenceSign = true).as("i"))
      .filter(col("i").isNotNull).orderBy("i").head()
    assert(ref.getLong(0) == -20L)
  }
}
