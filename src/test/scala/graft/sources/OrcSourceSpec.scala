package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class OrcSourceSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_orc_$name").resolve("t").toString

  test("round-trips the documents table losslessly") {
    val docs = Tables.documents(spark, sf)
    val path = tmp("docs")
    OrcSource.write(docs, path)
    val back = OrcSource.read(spark, path)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    // full-content check: per-column md5-xor fingerprint must match
    def fp(df: org.apache.spark.sql.DataFrame): String =
      df.select(md5(concat_ws("", df.columns.map(c => col(c).cast("string")): _*)).as("h"))
        .agg(sum(conv(substring(col("h"), 1, 14), 16, 10).cast("decimal(38,0)")).as("s"))
        .head().get(0).toString
    assert(fp(back) == fp(docs))
  }

  test("schema verification fails fast on a mistyped/missing expectation") {
    val path = tmp("schema")
    OrcSource.write(Tables.documents(spark, sf).select(col("doc_id"), col("source")), path)
    // matching expectation (subset of file columns is fine)
    OrcSource.read(spark, path, Some(StructType(Seq(StructField("doc_id", LongType)))))
    val err = intercept[IllegalArgumentException] {
      OrcSource.read(spark, path, Some(StructType(Seq(StructField("doc_id", StringType)))))
    }
    assert(err.getMessage.contains("doc_id"))
    val err2 = intercept[IllegalArgumentException] {
      OrcSource.read(spark, path, Some(StructType(Seq(StructField("nope", LongType)))))
    }
    assert(err2.getMessage.contains("nope"))
  }

  test("filters and projection push into the ORC scan (PushedFilters + pruned ReadSchema)") {
    val path = tmp("pushdown")
    OrcSource.write(Tables.documents(spark, sf), path)
    val q = OrcSource.read(spark, path)
      .filter(col("doc_id") > 100L)
      .select(col("doc_id"), col("source"))
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.filter(l => l.contains("Pushed") || l.contains("ReadSchema")).mkString("\n")
    assert(scan.contains("GreaterThan(doc_id,100"), scan)
    assert(scan.contains("doc_id") && !scan.contains("text"), scan)
    assert(q.count() > 0)
  }

  test("the engine's queries run unchanged over an ORC-held documents table") {
    // re-home the documents table as ORC and run the curation funnel's
    // shared stateless stage (scan-heavy: tokenizer, lang-ID, quality,
    // token gates) against it — results must be identical to parquet
    val path = tmp("swap")
    val parquetDocs = Tables.documents(spark, sf)
    OrcSource.write(parquetDocs, path)
    val orcDocs = OrcSource.read(spark, path)
    val a = graft.queries.TextQueries.curateFeatures(parquetDocs)
      .orderBy(col("doc_id")).collect()
    val b = graft.queries.TextQueries.curateFeatures(orcDocs)
      .orderBy(col("doc_id")).collect()
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }
}
