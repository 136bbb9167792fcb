package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC connector — the second mainstream columnar container after
  * parquet (the reference is CSV-only; migrating corpora frequently
  * arrive as ORC from Hive-era warehouses). Spark's built-in ORC
  * datasource provides the scale behaviors the engine relies on for
  * parquet: column pruning, predicate pushdown into stripe/row-group
  * indexes (`PushedFilters` in the scan, spec-asserted), split
  * generation across stripes, and vectorized reads — so every query in
  * this library runs unchanged over ORC-held tables.
  *
  * Same contract shape as [[CsvSource]]/[[JsonlSource]]: read verifies
  * a caller-declared schema up front (fail fast at the driver, not
  * task-deep), write round-trips losslessly (`OrcSourceSpec`).
  */
object OrcSource {

  /** Read an ORC path/glob. When `expect` is given, assert the file
    * schema contains every expected field with the exact declared type
    * (extra file columns are allowed and pruned by projection —
    * schema-evolution-friendly, matching the reference's
    * `check_csv_file` "declared columns must be present" intent).
    */
  def read(spark: SparkSession, pathGlob: String, expect: Option[StructType] = None): DataFrame = {
    val df = spark.read.orc(pathGlob)
    expect.foreach { want =>
      val have = df.schema.map(f => f.name -> f.dataType).toMap
      val missing = want.filterNot(f => have.get(f.name).contains(f.dataType))
      require(missing.isEmpty,
        s"ORC schema mismatch at $pathGlob: missing/mistyped ${missing.map(_.name).mkString(", ")}; " +
          s"file has ${df.schema.treeString}")
    }
    df
  }

  /** Write as ORC with zlib compression (the interoperable default). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zlib").orc(path)
}
