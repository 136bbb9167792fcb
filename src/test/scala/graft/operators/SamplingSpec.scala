package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables
import graft.text.TextOps

class SamplingSpec extends SparkSpec {

  private val rates = Map("en" -> 10, "zh" -> 50)

  test("stratified keeps exactly the hash-selected rows per stratum") {
    val docs = Tables.documents(spark, sf)
    val got = Sampling.stratified(docs, "lang", "doc_id", rates, defaultPct = 25)
    val pct = when(col("lang") === "en", 10)
      .when(col("lang") === "zh", 50).otherwise(25)
    val expected = docs
      .filter(TextOps.hash60(col("doc_id").cast("string")) % 100 < pct)
    assert(got.count() == expected.count())
    assert(got.select("doc_id").exceptAll(expected.select("doc_id")).count() == 0)
    assert(got.count() > 0 && got.count() < docs.count()) // a real subsample
  }

  test("stratified is deterministic under repartitioning") {
    val docs = Tables.documents(spark, sf)
    val a = Sampling.stratified(docs, "lang", "doc_id", rates, 25)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.stratified(docs.repartition(7), "lang", "doc_id", rates, 25)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("stratified honors per-stratum quotas within sampling tolerance") {
    val docs = Tables.documents(spark, sf)
    val kept = Sampling.stratified(docs, "lang", "doc_id", rates, 25)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    total.foreach { case (lang, n) =>
      val pct = rates.getOrElse(lang, 25)
      val frac = kept.getOrElse(lang, 0L).toDouble / n
      // hash buckets are uniform; allow generous slack on small strata
      assert(math.abs(frac - pct / 100.0) < 0.15,
        s"$lang kept=$frac target=${pct / 100.0}")
    }
  }

  test("stratified edge percentages: 0 keeps nothing, 100 keeps everything") {
    val docs = Tables.documents(spark, sf)
    val none = Sampling.stratified(docs, "lang", "doc_id",
      Map.empty, defaultPct = 0)
    assert(none.count() == 0)
    val all = Sampling.stratified(docs, "lang", "doc_id",
      Map.empty, defaultPct = 100)
    assert(all.count() == docs.count())
  }

  test("stratified rejects out-of-range percentages") {
    val docs = Tables.documents(spark, sf)
    intercept[IllegalArgumentException] {
      Sampling.stratified(docs, "lang", "doc_id", Map("en" -> 101), 25)
    }
    intercept[IllegalArgumentException] {
      Sampling.stratified(docs, "lang", "doc_id", Map("en" -> 10), -1)
    }
  }
}
