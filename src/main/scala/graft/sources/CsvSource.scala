package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV connector with the reference's scan semantics
  * (cites into /root/reference/):
  *
  *  - **name-based column typing** (`tfdataset.py:26-33`):
  *    `datetimestampseconds`/`cotw` → double (epoch seconds need 64-bit),
  *    `datetime`/`date_block`/`time_block` → string, everything else →
  *    float;
  *  - **header detection + schema verification** (`check_csv_file`,
  *    `datapipeline_utilities.py:47-75`): trust the file header, assert it
  *    equals user-declared `columns_original` when given; impose names on
  *    headerless files;
  *  - **empty-cell audit** (`investigate_csv_file`,
  *    `datapipeline_utilities.py:12-38`): empty cells are a hard error.
  *
  * Reference divergences (intended semantics, SURVEY §2.12 policy):
  * the reference's header check `all(isinstance(cell, str))` is always
  * true (csv cells are always str) and its NaN loop runs on an exhausted
  * reader (dead code) — here headers are detected by "first row parses
  * fully numeric ⇒ headerless" and the audit actually counts.
  *
  * Scale: globs fan out across executors; projection/limit push into the
  * scan via Catalyst; the audit is one aggregate pass (only run it when
  * asked — it is an extra scan, exactly like the reference's eager pass).
  */
object CsvSource {

  /** The reference's name-based dtype rule. */
  def nameBasedSchema(columns: Seq[String]): StructType =
    StructType(columns.map {
      case c @ ("datetimestampseconds" | "cotw") => StructField(c, DoubleType)
      case c @ ("datetime" | "date_block" | "time_block") => StructField(c, StringType)
      case c => StructField(c, FloatType)
    })

  /** Peek at the first line to decide whether a header row is present:
    * headerless iff every cell parses as a number. (Intended semantics of
    * `investigate_csv_file`; its `isinstance(cell, str)` check is always
    * true.) Driver-side read of ONE line only.
    */
  def detectHeader(spark: SparkSession, path: String): Boolean = {
    val first = spark.read.text(path).limit(1).collect()
    require(first.nonEmpty, "CSV file is empty")
    val cells = first.head.getString(0).split(",", -1)
    !cells.forall(c => scala.util.Try(c.trim.toDouble).isSuccess)
  }

  case class ScanReport(headerPresent: Boolean, columns: Seq[String], nRows: Long, nEmptyCells: Long)

  /** Row/column/empty-cell audit — one aggregation pass over the raw
    * lines (mirrors `investigate_csv_file`'s intended behavior; raises on
    * empty cells like the reference).
    */
  def investigate(spark: SparkSession, path: String, failOnEmpty: Boolean = true): ScanReport = {
    val headerPresent = detectHeader(spark, path)
    val raw = spark.read.option("header", headerPresent.toString).csv(path)
    val cols = raw.columns.toSeq
    val emptyExprs = raw.columns.map(c =>
      sum(when(col(c).isNull || trim(col(c)) === "", 1L).otherwise(0L)))
      .reduce(_ + _).as("empty")
    val row = raw.agg(count(lit(1)).as("n"), emptyExprs).head()
    val report = ScanReport(headerPresent, cols, row.getLong(0), row.getLong(1))
    if (failOnEmpty)
      require(report.nEmptyCells == 0, s"Found ${report.nEmptyCells} empty cells in $path")
    report
  }

  /** Scan with the reference's semantics: glob, header handling, declared
    * or imposed column names, name-based typing, projection + row limit
    * (both pushed into the scan by Catalyst).
    */
  def read(spark: SparkSession, pathGlob: String,
           useExistingColumnNames: Boolean = true,
           columnsOriginal: Seq[String] = Nil,
           columnsSelected: Seq[String] = Nil,
           nRows: Long = Long.MaxValue,
           verifySchema: Boolean = true): DataFrame = {
    val headered =
      if (useExistingColumnNames) {
        val df0 = spark.read.option("header", "true").csv(pathGlob)
        if (verifySchema && columnsOriginal.nonEmpty)
          require(df0.columns.toSeq == columnsOriginal,
            s"declared columns_original ${columnsOriginal.mkString(",")} != file header ${df0.columns.mkString(",")}")
        val schema = nameBasedSchema(df0.columns.toSeq)
        spark.read.option("header", "true").schema(schema).csv(pathGlob)
      } else {
        require(columnsOriginal.nonEmpty, "columns_original required for headerless files")
        spark.read.schema(nameBasedSchema(columnsOriginal)).csv(pathGlob)
      }
    val projected =
      if (columnsSelected.nonEmpty) headered.select(columnsSelected.map(col): _*) else headered
    // limit takes an Int; clamp rather than letting a >2^31 n_rows wrap
    // negative/small via toInt (a config asking for more rows than
    // Int.MaxValue effectively wants them all)
    if (nRows < Int.MaxValue) projected.limit(nRows.toInt) else projected
  }

  /** CSV sink (`df_to_csv`, pandas_utilities.py:66-70). */
  def write(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)
}
