package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property tests for the round-15 corpus-statistics queries — the
  * oracle gate checks cross-engine equality; these pin the SEMANTIC
  * claims each query's scaladoc makes (leakage safety, changepoint
  * localization, association ranking, rarity signal).
  */
class NewQuerySpec extends SparkSpec {
  import spark.implicits._

  test("sample_hash_split: exact duplicates land in the SAME split (leakage safety), splits are ~90/5/5") {
    // leakage safety needs planted duplicates (this corpus has no exact
    // fp collisions): re-encodings that canonicalize identically MUST
    // get one split regardless of id — replicate the query's bucket
    // algebra over a probe frame with dup pairs at hostile ids
    val probe = Seq(
      (1L, "The quick brown fox!"), (900L, "the QUICK   brown fox"),
      (2L, "alpha beta gamma"), (77L, "Alpha, beta... GAMMA"),
      (3L, "unrelated text here")).toDF("doc_id", "text")
    val b = probe.select(col("doc_id"),
        (graft.text.TextOps.hash60(graft.text.TextOps.fingerprint(col("text"))) % 100).as("bucket"),
        graft.text.TextOps.fingerprint(col("text")).as("fp"))
    val perFp = b.groupBy(col("fp"))
      .agg(countDistinct(col("bucket")).as("k"), count(lit(1)).as("n"))
    assert(perFp.filter(col("k") > 1).count() == 0)
    assert(perFp.filter(col("n") >= 2).count() == 2) // both planted pairs collapse
    // the registered query on the real table: total coverage, 3 splits,
    // and a train share near the designed 90% (hash60 is uniform)
    val out = graft.SparkEntry.queries("sample_hash_split")(spark, sf)
    val n = out.count().toDouble
    val train = out.filter(col("split") === "train").count().toDouble
    assert(train / n > 0.8 && train / n < 0.97, s"train share ${train / n}")
    assert(out.select(col("split")).distinct().count() == 3)
    assert(out.count() == graft.sources.Tables.documents(spark, sf).count())
  }

  test("ts_changepoint localizes a constructed mean shift at the shift point") {
    // series 1: flat 10.0 for 20 readings then flat 20.0 for 20 — the
    // max-|cusum| row is the LAST pre-shift reading (classic CUSUM)
    val rows = (1L to 40L).map { i =>
      (new java.sql.Timestamp(i * 1000L), i, 1L, if (i <= 20) 10.0 else 20.0)
    }
    val df = rows.toDF("ts", "event_id", "user_id", "value")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("e_us"), col("event_id"))
    val wAll = Window.partitionBy(col("user_id"))
    // replicate the query over the probe frame (the registered query is
    // bound to the events table; the algebra is what's under test)
    val e = df.select(col("event_id"), col("user_id"), col("value"),
      graft.functions.TimeFns.epochMicros(col("ts")).as("e_us"))
    val sel = Window.partitionBy(col("user_id")).orderBy(abs(col("dev")).desc, col("i"))
    val cp = e
      .withColumn("v_u", (col("value").cast("decimal(18,6)") * lit(1000000)).cast("long"))
      .withColumn("run", sum(col("v_u")).over(w))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("total", sum(col("v_u")).over(wAll))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("dev", col("n") * col("run") - col("i") * col("total"))
      .withColumn("rn", row_number().over(sel)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("dev"))
      .collect()
    assert(cp.length == 1)
    assert(cp.head.getLong(1) == 20L, s"changepoint at ${cp.head.getLong(1)}, want 20")
    // and the real-table query returns one row per series, deterministic
    val out = graft.SparkEntry.queries("ts_changepoint")(spark, sf)
    val users = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(out.count() == users)
  }

  test("collocations ranks by exact pair count and reports finite PMI") {
    val out = graft.SparkEntry.queries("collocations")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 30)
    // ordering: non-increasing c_ab, ties broken by (w1, w2)
    val counts = out.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(out.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    assert(out.forall(_.getLong(2) >= 5))
  }

  test("text_rarity: common-vocabulary docs score lower surprisal than rare-vocabulary docs") {
    val out = graft.SparkEntry.queries("text_rarity")(spark, sf)
    // every doc's rare_n <= n_tok and mean_cnt >= 1 (every token occurs
    // at least once — itself)
    assert(out.filter(col("rare_n") > col("n_tok")).count() == 0)
    assert(out.filter(col("mean_cnt") < 1.0).count() == 0)
    // monotone signal: across docs, higher mean corpus frequency =>
    // lower surprisal (they are an exact inverse through one log)
    val two = out.orderBy(col("mean_cnt")).collect()
    val lowFreq = two.head
    val highFreq = two.last
    assert(lowFreq.getDouble(5) > highFreq.getDouble(5))
  }
}
