package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class JsonlSourceSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("documents round-trip JSONL bit-exactly (write then strict read)") {
    val docs = Tables.documents(spark, sf)
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/docs"
    JsonlSource.write(docs, dir)
    val back = JsonlSource.read(spark, dir, docSchema)
    assert(back.schema.fields.map(f => f.name -> f.dataType).toSeq ==
      docSchema.fields.map(f => f.name -> f.dataType).toSeq)
    assert(back.count() == docs.count())
    // full-row set equality both directions
    assert(back.exceptAll(docs.select(docSchema.fieldNames.map(col): _*)).count() == 0)
    assert(docs.select(docSchema.fieldNames.map(col): _*).exceptAll(back).count() == 0)
  }

  test("null fields survive a round-trip (ignoreNullFields off)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_jsonl_null").toString + "/rows"
    val df = Seq((1L, Option("a")), (2L, None)).toDF("id", "s")
    JsonlSource.write(df, dir)
    val schema = StructType(Seq(StructField("id", LongType), StructField("s", StringType)))
    val back = JsonlSource.read(spark, dir, schema)
    assert(back.filter(col("s").isNull).select("id").head().getLong(0) == 2L)
    assert(back.count() == 2)
  }

  test("readWithQuarantine splits malformed lines without failing the scan") {
    val dir = Files.createTempDirectory("graft_jsonl_bad").toString
    val f = new java.io.PrintWriter(s"$dir/part-0.jsonl")
    f.println("""{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""")
    f.println("""{"doc_id": 2, "text": "also ok", "lang": "fr", "source": "s", "n_chars": 7}""")
    f.println("""{"doc_id": 3, "text": "truncated...""") // malformed
    f.println("""not json at all""")
    f.close()
    val (good, bad) = JsonlSource.readWithQuarantine(spark, dir, docSchema)
    assert(good.count() == 2)
    assert(good.columns.toSeq == docSchema.fieldNames.toSeq) // corrupt col dropped
    assert(bad.count() == 2)
    assert(bad.columns.toSeq == Seq("line"))
    // strict read over the same dir must fail instead of silently dropping
    intercept[Exception] {
      JsonlSource.read(spark, dir, docSchema).count()
    }
  }

  test("streaming quarantine read matches the batch split over the same files") {
    val dir = Files.createTempDirectory("graft_jsonl_stream").toString
    val f = new java.io.PrintWriter(s"$dir/part-0.jsonl")
    f.println("""{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""")
    f.println("""{"doc_id": 2, "text": "ok2", "lang": "fr", "source": "s", "n_chars": 3}""")
    f.println("""{"broken""")
    f.close()
    val (good, bad) = JsonlSource.readStreamWithQuarantine(spark, dir, docSchema)
    val q1 = good.writeStream.outputMode("append").format("memory")
      .queryName("jsonl_good").start()
    val q2 = bad.writeStream.outputMode("append").format("memory")
      .queryName("jsonl_bad").start()
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()
    assert(spark.table("jsonl_good").count() == 2)
    assert(spark.table("jsonl_good").columns.toSeq == docSchema.fieldNames.toSeq)
    assert(spark.table("jsonl_bad").collect().map(_.getString(0)).toSeq == Seq("""{"broken"""))
  }

  test("blank lines are separators, not corrupt records (strict-reader parity)") {
    val dir = Files.createTempDirectory("graft_jsonl_blank").toString
    val f = new java.io.PrintWriter(s"$dir/part-0.jsonl")
    f.println("""{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""")
    f.println("") // blank separator line
    f.println("   ") // whitespace-only line
    f.println("""{"doc_id": 2, "text": "ok2", "lang": "fr", "source": "s", "n_chars": 3}""")
    f.close()
    val (good, bad) = JsonlSource.readWithQuarantine(spark, dir, docSchema)
    assert(good.count() == 2)
    assert(bad.count() == 0, bad.collect().mkString(","))
    // and the strict reader agrees: same two rows, no failure
    assert(JsonlSource.read(spark, dir, docSchema).count() == 2)
  }

  test("a schema that already claims _corrupt_record is rejected with a clear message") {
    val dir = Files.createTempDirectory("graft_jsonl_clash").toString
    val f = new java.io.PrintWriter(s"$dir/part-0.jsonl")
    f.println("""{"doc_id": 1}"""); f.close()
    val clash = docSchema.add(JsonlSource.CorruptCol, StringType)
    val e = intercept[IllegalArgumentException] {
      JsonlSource.readWithQuarantine(spark, dir, clash)
    }
    assert(e.getMessage.contains(JsonlSource.CorruptCol))
  }

  test("schema projection prunes unread JSON fields from the parse (scale contract)") {
    val docs = Tables.documents(spark, sf)
    val dir = Files.createTempDirectory("graft_jsonl_prune").toString + "/docs"
    JsonlSource.write(docs, dir)
    val two = JsonlSource.read(spark, dir, docSchema).select("doc_id", "lang")
    val read = two.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("doc_id") && !read.contains("text"), read)
    assert(two.count() == docs.count())
  }
}
