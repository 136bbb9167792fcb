package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class AvroSourceSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_avro_$name").resolve("t").toString

  private def fp(df: org.apache.spark.sql.DataFrame): String =
    df.select(md5(concat_ws("", df.columns.map(c => col(c).cast("string")): _*)).as("h"))
      .agg(sum(conv(substring(col("h"), 1, 14), 16, 10).cast("decimal(38,0)")).as("s"))
      .head().get(0).toString

  test("round-trips the documents table losslessly") {
    val docs = Tables.documents(spark, sf)
    val path = tmp("docs")
    AvroSource.write(docs, path)
    val back = AvroSource.read(spark, path)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    assert(fp(back) == fp(docs))
  }

  test("round-trips timestamps (orders) and float arrays (embeddings) exactly") {
    val orders = Tables.orders(spark, sf)
    assert(orders.schema.fields.exists(f =>
      f.dataType == TimestampType || f.dataType == TimestampNTZType)) // non-vacuous
    val p1 = tmp("orders")
    AvroSource.write(orders, p1)
    val b1 = AvroSource.read(spark, p1)
    assert(b1.schema == orders.schema)
    assert(fp(b1) == fp(orders))

    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    assert(emb.schema("embedding").dataType.isInstanceOf[ArrayType]) // non-vacuous
    val p2 = tmp("emb")
    AvroSource.write(emb, p2)
    val b2 = AvroSource.read(spark, p2)
    assert(b2.schema == emb.schema)
    assert(fp(b2.withColumn("e", concat_ws(",", col("embedding"))).drop("embedding")) ==
      fp(emb.withColumn("e", concat_ws(",", col("embedding"))).drop("embedding")))
  }

  test("schema verification fails fast on a mistyped/missing expectation") {
    val path = tmp("schema")
    AvroSource.write(Tables.documents(spark, sf).select(col("doc_id"), col("source")), path)
    AvroSource.read(spark, path, Some(StructType(Seq(StructField("doc_id", LongType)))))
    val err = intercept[IllegalArgumentException] {
      AvroSource.read(spark, path, Some(StructType(Seq(StructField("doc_id", StringType)))))
    }
    assert(err.getMessage.contains("doc_id"))
    val err2 = intercept[IllegalArgumentException] {
      AvroSource.read(spark, path, Some(StructType(Seq(StructField("nope", LongType)))))
    }
    assert(err2.getMessage.contains("nope"))
  }

  test("column projection becomes the Avro reader schema and decodes only those fields") {
    val docs = Tables.documents(spark, sf)
    val path = tmp("proj")
    AvroSource.write(docs, path)
    val pruned = AvroSource.read(spark, path, columns = Some(Seq("doc_id", "source")))
    assert(pruned.columns.toSeq == Seq("doc_id", "source"))
    assert(fp(pruned) == fp(docs.select(col("doc_id"), col("source"))))
    val bad = intercept[IllegalArgumentException] {
      AvroSource.read(spark, path, columns = Some(Seq("doc_id", "nope")))
    }
    assert(bad.getMessage.contains("nope"))
  }

  test("a multi-row-file read splits across tasks and keeps every record exactly once") {
    // one container file written from one partition, then read back —
    // AvroKeyInputFormat must not lose or duplicate rows at sync
    // boundaries regardless of split count
    val docs = Tables.documents(spark, sf).repartition(1)
    val path = tmp("split")
    AvroSource.write(docs, path)
    val back = AvroSource.read(spark, path)
    assert(back.count() == docs.count())
    assert(back.select(sum(col("doc_id"))).head().getLong(0) ==
      docs.select(sum(col("doc_id"))).head().getLong(0))
  }

  test("the engine's queries run unchanged over an Avro-held documents table") {
    val path = tmp("swap")
    val parquetDocs = Tables.documents(spark, sf)
    AvroSource.write(parquetDocs, path)
    val avroDocs = AvroSource.read(spark, path)
    val a = graft.queries.TextQueries.curateFeatures(parquetDocs)
      .orderBy(col("doc_id")).collect()
    val b = graft.queries.TextQueries.curateFeatures(avroDocs)
      .orderBy(col("doc_id")).collect()
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }
}
