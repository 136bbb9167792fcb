package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-Lines connector — the de-facto interchange format for document
  * corpora (one JSON object per line, so files split cleanly across
  * executors, unlike a single JSON array which must be parsed whole).
  *
  * Scale design:
  *  - **always pass an explicit schema.** Schema inference reads the
  *    ENTIRE input once before the real scan — a full extra pass over
  *    100 TB. With a schema the read is one pass and Catalyst prunes
  *    unreferenced fields out of the JSON parser itself
  *    (`ReadSchema` shows only the projected fields).
  *  - **quarantine, don't crash.** PERMISSIVE mode routes malformed
  *    lines to `_corrupt_record`; [[readWithQuarantine]] splits them
  *    into a separate frame so one bad line in a billion doesn't kill
  *    the job (same contract as the multimodal decoders).
  *  - compression (gzip/zstd) is decided per file by extension, as
  *    usual for Spark text sources; gzipped files are non-splittable,
  *    so large corpora should ship many medium files, not one giant.
  */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL with an explicit schema (strict: malformed lines fail
    * the job — use [[readWithQuarantine]] for the tolerant path).
    */
  def read(spark: SparkSession, pathGlob: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(pathGlob)

  /** The parse-and-split stage shared by the batch and streaming readers
    * — ONE definition so a fix to the corrupt-detection predicate can
    * never land on one path only. `scanned` is a text scan (batch or
    * streaming) with a `value` line column.
    *
    * Blank/whitespace-only lines are routed to NEITHER output: the
    * strict JSON reader skips them (they are separators, not records),
    * so counting them corrupt would make the tolerant path disagree
    * with the strict one on identical well-formed input.
    */
  private def splitQuarantine(scanned: DataFrame,
                              schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain a '$CorruptCol' field — it is " +
        "reserved for the quarantine marker")
    // the corrupt marker must live INSIDE the from_json schema: a
    // PERMISSIVE from_json yields an all-null row (not a null struct)
    // for malformed input, so struct nullness alone cannot detect it
    val withCorrupt = schema.add(CorruptCol, "string")
    val parsed = scanned.filter(trim(col("value")) =!= "")
      .select(col("value"),
        from_json(col("value"), withCorrupt,
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)).as("r"))
    val good = parsed.filter(col(s"r.$CorruptCol").isNull)
      .select(col("r.*")).drop(CorruptCol)
    val bad = parsed.filter(col(s"r.$CorruptCol").isNotNull)
      .select(col("value").as("line"))
    (good, bad)
  }

  /** Tolerant read: returns (goodRows, corruptLines). Good rows carry
    * the declared schema; corrupt lines survive as raw text for
    * inspection/re-driving.
    *
    * Implemented as a text scan + `from_json` rather than the JSON
    * reader's `_corrupt_record` column: Spark forbids queries that
    * reference ONLY the corrupt column on a raw scan (its documented
    * workaround is caching the parsed frame — a non-starter at 100 TB),
    * while the text-scan form keeps the raw line as a first-class column
    * so both outputs are plain projections of one distributed parse.
    */
  def readWithQuarantine(spark: SparkSession, pathGlob: String,
                         schema: StructType): (DataFrame, DataFrame) =
    splitQuarantine(spark.read.text(pathGlob), schema)

  /** Streaming variant of [[readWithQuarantine]]: a `readStream.text`
    * over a directory of JSONL files, split into (goodRows,
    * corruptLines) with the SAME from_json parse — so a continuously
    * ingesting corpus gets the same quarantine contract as the batch
    * path (same schema, same corrupt detection), and both outputs can
    * be written by independent streaming sinks.
    */
  def readStreamWithQuarantine(spark: SparkSession, pathGlob: String,
                               schema: StructType): (DataFrame, DataFrame) =
    splitQuarantine(spark.readStream.text(pathGlob), schema)

  /** Write a DataFrame as JSONL, one object per row. `ignoreNullFields`
    * is off so absent and null fields stay distinguishable on re-read.
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("ignoreNullFields", "false").json(path)
}
