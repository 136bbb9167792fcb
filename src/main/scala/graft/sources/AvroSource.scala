package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro connector — the mainstream ROW container (Kafka-era streaming
  * corpora and warehouse interchange ship as Avro object-container
  * files). This classpath carries avro-core and avro-mapred but no
  * Spark Avro datasource, so the connector is built directly on the
  * public Avro APIs:
  *
  *  - READ rides `AvroKeyInputFormat` (avro-mapred): container files
  *    SPLIT at sync markers, so a large file fans out across executors
  *    like parquet row groups — the property that matters at 100 TB;
  *    a `columns` projection is pushed into the Avro READER SCHEMA, so
  *    deselected fields are skipped during decode (Avro schema
  *    resolution), not materialized-then-dropped.
  *  - WRITE emits one deflate-compressed container file per partition
  *    through `DataFileWriter` — embarrassingly parallel, no shuffle.
  *
  * Record→Row conversion is row-at-a-time (Avro is a row format; there
  * is no vectorized path to borrow), values copied out eagerly because
  * the input format REUSES datum objects between records. Same contract
  * shape as [[OrcSource]]: `read` verifies a caller-declared schema up
  * front, `write`/`read` round-trip losslessly (AvroSourceSpec).
  *
  * Type coverage: the engine's table surface — boolean/int/long/float/
  * double/string/binary, date (Avro `date` logical), timestamp (Avro
  * `timestamp-micros`, matching Spark's internal micros exactly), and
  * arrays of any of those. Anything else fails fast at the driver.
  */
object AvroSource {

  private val RecordName = "graft_record"

  // ---- Spark StructType -> Avro Schema ----

  private def toAvroType(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType => // Avro's zoneless counterpart
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(et, containsNull) =>
      val elem = toAvroType(et)
      Schema.createArray(
        if (containsNull) nullable(elem) else elem)
    case other =>
      throw new IllegalArgumentException(s"AvroSource does not support type $other")
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.Arrays.asList(Schema.create(Schema.Type.NULL), s))

  private[sources] def toAvroSchema(st: StructType): Schema = {
    val fields = st.fields.map { f =>
      val base = toAvroType(f.dataType)
      val sch = if (f.nullable) nullable(base) else base
      val default: AnyRef = if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null
      new Schema.Field(f.name, sch, null, default)
    }
    Schema.createRecord(RecordName, null, "graft.avro", false,
      java.util.Arrays.asList(fields: _*))
  }

  // ---- Avro Schema -> Spark StructType ----

  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"AvroSource supports only [null, T] unions, got $s")
      (nonNull.head, true)
    } else (s, false)

  private def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
    case Schema.Type.LONG =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros]) TimestampType
      else if (s.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros]) TimestampNTZType
      else LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.ARRAY =>
      val (elem, elemNullable) = unwrap(s.getElementType)
      ArrayType(toSparkType(elem), containsNull = elemNullable)
    case other =>
      throw new IllegalArgumentException(s"AvroSource does not support Avro type $other")
  }

  private[sources] def toStructType(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD, s"expected a record schema, got $avro")
    StructType(avro.getFields.asScala.map { f =>
      val (t, isNullable) = unwrap(f.schema())
      StructField(f.name(), toSparkType(t), nullable = isNullable)
    }.toSeq)
  }

  // ---- value conversion (executor side) ----

  private def toAvroValue(dt: DataType, v: Any): AnyRef = v match {
    case null => null
    case ts: java.sql.Timestamp =>
      java.lang.Long.valueOf(ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L)
    case i: java.time.Instant => // spark.sql.datetime.java8API.enabled
      java.lang.Long.valueOf(Math.addExact(
        Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
    case l: java.time.LocalDateTime => // TimestampNTZType's external type
      java.lang.Long.valueOf(Math.addExact(Math.multiplyExact(
        l.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L), l.getNano / 1000L))
    case d: java.sql.Date =>
      java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
    case d: java.time.LocalDate =>
      java.lang.Integer.valueOf(d.toEpochDay.toInt)
    case b: Array[Byte] => ByteBuffer.wrap(b)
    case seq: scala.collection.Seq[_] =>
      val et = dt.asInstanceOf[ArrayType].elementType
      seq.map(x => toAvroValue(et, x)).asJava
    case other => other.asInstanceOf[AnyRef]
  }

  /** `java8`: which external datetime classes `createDataFrame` expects
    * (java.time.* when `spark.sql.datetime.java8API.enabled`, java.sql.*
    * otherwise).
    */
  private def fromAvroValue(dt: DataType, v: Any, java8: Boolean): Any = v match {
    case null => null
    case _ => dt match {
      case StringType => v.toString // Utf8 (and possibly reused) -> String
      case TimestampType =>
        val micros = v.asInstanceOf[Long]
        if (java8)
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
        else {
          val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
          ts
        }
      case TimestampNTZType =>
        val micros = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case DateType =>
        val d = java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)
        if (java8) d else java.sql.Date.valueOf(d)
      case BinaryType =>
        val bb = v.asInstanceOf[ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.List[_]].asScala.map(x => fromAvroValue(et, x, java8)).toSeq
      case _ => v
    }
  }

  // ---- public surface ----

  /** Write one Avro container file per partition under `path`
    * (overwriting), deflate-compressed. Parallel, shuffle-free; the
    * schema is derived from the DataFrame and embedded in every
    * container header.
    */
  def write(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val schemaJson = toAvroSchema(st).toString
    val spark = df.sparkSession
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(target)) fs.delete(target, true)
    fs.mkdirs(target)
    val pathStr = target.toString
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      // partition 0 always writes (an empty container still carries the
      // schema, so an empty frame round-trips); other empty partitions
      // skip their file
      if (rows.hasNext || pid == 0) {
        val avroSchema = new Schema.Parser().parse(schemaJson)
        val file = new Path(pathStr, f"part-$pid%05d.avro")
        val pfs = file.getFileSystem(new Configuration())
        val out = pfs.create(file, true)
        val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
        writer.setCodec(CodecFactory.deflateCodec(6))
        writer.create(avroSchema, out)
        try {
          rows.foreach { row =>
            val rec = new GenericData.Record(avroSchema)
            var i = 0
            while (i < st.length) {
              rec.put(i, toAvroValue(st(i).dataType, row.get(i)))
              i += 1
            }
            writer.append(rec)
          }
        } finally writer.close()
      }
      Iterator.single(0)
    }.count() // one action drives all the writes
  }

  /** Read an Avro container path (a [[write]] output directory or a
    * single file). When `expect` is given, assert the embedded writer
    * schema contains every expected field with the exact declared Spark
    * type (fail fast at the driver). When `columns` is given, decode
    * ONLY those fields: the projection becomes the Avro reader schema,
    * so skipped fields are never deserialized.
    */
  def read(spark: SparkSession, path: String,
           expect: Option[StructType] = None,
           columns: Option[Seq[String]] = None): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(hconf)
    val firstFile = {
      val files =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
            .map(_.getPath).sortBy(_.getName)
        else Array(root)
      require(files.nonEmpty, s"no Avro files under $path")
      files.head
    }
    val writerSchema = {
      val in = fs.open(firstFile)
      try new DataFileStream(in, new GenericDatumReader[GenericRecord]()).getSchema
      finally in.close()
    }
    val fullStruct = toStructType(writerSchema)
    expect.foreach { want =>
      val have = fullStruct.map(f => f.name -> f.dataType).toMap
      val missing = want.filterNot(f => have.get(f.name).contains(f.dataType))
      require(missing.isEmpty,
        s"Avro schema mismatch at $path: missing/mistyped ${missing.map(_.name).mkString(", ")}; " +
          s"file has ${fullStruct.treeString}")
    }
    val (readerSchema, struct) = columns match {
      case None => (writerSchema, fullStruct)
      case Some(cols) =>
        val byName = writerSchema.getFields.asScala.map(f => f.name() -> f).toMap
        val missing = cols.filterNot(byName.contains)
        require(missing.isEmpty, s"projected column(s) not in Avro schema: ${missing.mkString(", ")}")
        val fields = cols.map { c =>
          val f = byName(c)
          new Schema.Field(f.name(), f.schema(), null,
            if (f.schema().getType == Schema.Type.UNION) Schema.Field.NULL_DEFAULT_VALUE else null)
        }
        val proj = Schema.createRecord(RecordName, null, "graft.avro", false, fields.asJava)
        (proj, StructType(cols.map(c => fullStruct(fullStruct.fieldIndex(c)))))
    }
    val conf = new Configuration(hconf)
    // the reader schema drives Avro schema resolution in every split
    conf.set("avro.schema.input.key", readerSchema.toString)
    val fieldTypes = struct.fields.map(_.dataType)
    val n = fieldTypes.length
    val java8 = spark.conf.get("spark.sql.datetime.java8API.enabled", "false").toBoolean
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        conf)
      .map { case (k, _) =>
        // copy out NOW: the record reader reuses the datum between rows
        val rec = k.datum()
        val vals = new Array[Any](n)
        var i = 0
        while (i < n) {
          vals(i) = fromAvroValue(fieldTypes(i), rec.get(i), java8)
          i += 1
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }
    spark.createDataFrame(rdd, struct)
  }
}
