package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.{FeatureSpecJson, RunConfig}
import graft.functions.{Cyclical, TimeFns}
import graft.operators.{FeatureSpace, Quality, Resample, WindowOps}
import graft.sources.CsvSource

/** Config-driven orchestrator: the Spark re-expression of the reference's
  * canonical flow (`examples/datapipeline_test.py` →
  * `get_dictdataset_from_csv` → `add_select_resample_csvdataset` →
  * `get_featurespace` → apply; SURVEY §3.1), driven by the same JSON
  * config shape.
  *
  * Laziness mirrors tf.data: the returned DataFrame is a plan; audits and
  * adapt are the only actions. Unlike the reference — which re-reads the
  * CSV from disk on every audit/adapt (≥4 full passes, SURVEY §4) — the
  * post-derivation frame is cached once before the multi-pass stage.
  */
object Pipeline {

  case class Prepared(df: DataFrame, stats: FeatureSpace.FeatureStats,
                      outputColumns: Seq[String], specs: Seq[FeatureSpace.FeatureSpec],
                      private val cachedSource: Option[DataFrame] = None) {
    /** Release the pipeline's internal scan cache. `run` caches the
      * post-derivation frame so audit/adapt/output don't re-read the
      * CSV (the reference re-reads it per pass); call this when done
      * with the Prepared in a long-lived session — derived frames stay
      * correct (they recompute from the source if re-used).
      */
    def release(): Unit = cachedSource.foreach(_.unpersist(false))
  }

  /** Map a config feature spec to engine specs
    * (`get_featurespace_definitions`, datapipeline.py:273-361; the int
    * one_hot depth-5 hardcode is datapipeline.py:239).
    */
  def toSpecs(j: FeatureSpecJson): Seq[FeatureSpace.FeatureSpec] = {
    import FeatureSpace._
    j.features.flatMap { c =>
      (j.featureType, j.outputMode) match {
        case ("numerical", "plain") => Seq(Plain(c))
        case ("numerical", "normalized") => Seq(Normalized(c))
        case ("numerical", "rescaled") => Seq(Rescaled(c))
        case ("int", "int") => Seq(Plain(c))
        case ("int", "one_hot") => Seq(OneHotInt(c, 5))
        case ("string", "int") => Seq(StringIndexed(c))
        case ("string", "one_hot") => Seq(OneHotString(c))
        case ("datetimestamp_seconds", "plain") => Seq(Plain(c))
        case ("datetimestamp_seconds", "cyclical_minute") =>
          Seq(CyclicalTime(c, Seq(Cyclical.SecondsPerMinute)))
        case ("datetimestamp_seconds", "cyclical_hour") =>
          Seq(CyclicalTime(c, Seq(Cyclical.SecondsPerHour)))
        case ("datetimestamp_seconds", "cyclical_day") =>
          Seq(CyclicalTime(c, Seq(Cyclical.SecondsPerDay)))
        case ("datetimestamp_seconds", "cyclical_minute_hour_day") =>
          Seq(CyclicalTime(c, Seq(Cyclical.SecondsPerMinute, Cyclical.SecondsPerHour,
            Cyclical.SecondsPerDay)))
        case (t, m) => throw new IllegalArgumentException(s"unsupported spec $t/$m")
      }
    }
  }

  /** Derived-column dispatcher (`add_columns_to_csvdataset`,
    * tfdataset_utilities.py:142-160): "datetimestamp" concatenates the
    * configured date+time string columns (and becomes the new datetime
    * column); "datetimestampseconds" parses the datetime column to epoch
    * seconds (float64 in the reference → double here).
    */
  def addDerivedColumns(df: DataFrame, columnsAdded: Seq[String],
                        datetimeDict: Map[String, String]): (DataFrame, Map[String, String]) = {
    var cur = df
    var dict = datetimeDict
    columnsAdded.foreach {
      case "datetimestamp" =>
        cur = cur.withColumn("datetimestamp",
          TimeFns.dtConcat(col(dict("column_date")), col(dict("column_time"))))
        dict = dict + ("column_datetime" -> "datetimestamp")
      case "datetimestampseconds" =>
        cur = cur.withColumn("datetimestampseconds",
          TimeFns.dtToEpoch(col(dict("column_datetime"))).cast("double"))
      case other =>
        // reference prints "not supported" and continues — keep that
        org.slf4j.LoggerFactory.getLogger(getClass).warn(s"column $other not supported")
    }
    (cur, dict)
  }

  /** Full extraction + transformation flow from a config. `pathOverride`
    * points at the actual CSV (reference configs carry absolute paths
    * from the original machines). `skipRows` mirrors the DER example's
    * `.skip(45000)` warm-up drop (examples/datapipeline_test.py:45).
    */
  def run(spark: SparkSession, cfg: RunConfig, pathOverride: Option[String] = None,
          auditInterval: Boolean = false, skipRows: Long = 0): Prepared = {
    val ex = cfg.dataPipeline.extraction
    val tr = cfg.dataPipeline.transformation

    // 1. scan (projection+limit pushdown; schema by the name rule)
    val raw = CsvSource.read(spark, pathOverride.getOrElse(ex.csvPath),
      useExistingColumnNames = ex.useExistingColumnnames,
      columnsOriginal = ex.columnsOriginal,
      columnsSelected = Nil, nRows = ex.nRows)

    // 2. derive datetime columns, then project selected + added
    val (derived, dict) = addDerivedColumns(raw, ex.columnsAdded,
      ex.columnDatetimedict + ("column_datetime" ->
        ex.columnDatetimedict.getOrElse("column_datetime", ex.columnDatetime)))
    val selected =
      if (ex.columnsSelected.nonEmpty)
        derived.select((ex.columnsSelected ++ ex.columnsAdded).distinct.map(col): _*)
      else derived

    // 3. explicit order (the reference inherits file order; SURVEY §7.4)
    val tsCol = ex.columnDatetime
    val ordered = WindowOps.withRowIdx(selected, Seq.empty, Seq(tsCol), "row_idx")
    val afterSkip = if (skipRows > 0) ordered.filter(col("row_idx") > skipRows) else ordered

    // cache: everything below re-scans (audit, adapt, output) — the
    // reference re-reads the CSV each pass; we pay the scan once.
    val cached = afterSkip.cache()

    // 4. interval audit (add_select_resample_csvdataset,
    //    datapipeline.py:629-638): constant step == declared original
    if (auditInterval) {
      val interval = WindowOps.lagInterval(col(tsCol).cast("double"), Seq.empty, Seq("row_idx"))
      val audit = Quality.constantInterval(
        cached.select(interval.as("i")).filter(col("i").isNotNull),
        col("i"), ex.timeIntervalOriginal).head()
      require(audit.getBoolean(0),
        s"sampling interval not constant == ${ex.timeIntervalOriginal}s")
    }

    // 5. resample to the desired interval. Upsampling REPLACES the
    //    datetime column with the generated grid timestamps (the
    //    reference's upsample emits new-timestamp records with repeated
    //    measurements, tfdataset_resampling.py:11-30) and re-derives
    //    row_idx so downstream windows/splits order by the new grid.
    val resampled =
      if (tr.timeIntervalDesired > 0 && tr.timeIntervalDesired != ex.timeIntervalOriginal) {
        if (tr.timeIntervalDesired > ex.timeIntervalOriginal)
          cached.filter(col(tsCol).cast("long") % tr.timeIntervalDesired === 0)
        else {
          val up = Resample.upsampleRepeatEpoch(cached, col(tsCol).cast("long"),
              ex.timeIntervalOriginal, tr.timeIntervalDesired)
            .withColumn(tsCol, col("ts_up").cast("double")).drop("ts_up", "row_idx")
          WindowOps.withRowIdx(up, Seq.empty, Seq(tsCol), "row_idx")
        }
      } else cached

    // 6. featurespace adapt (first N rows) + apply, preserving spec order
    val specs = tr.features.flatMap(toSpecs)
    // order before limit: "first N rows" must mean the first N in time
    // order, not N arbitrary partition-order rows
    val stats = FeatureSpace.adapt(resampled.orderBy(col("row_idx")), specs,
      Some(tr.nRowsToAdaptFeaturespace))
    val outCols = specs.flatMap(s => FeatureSpace.expand(s, stats).map(_._1))
    val applied = resampled.select(
      FeatureSpace.apply(resampled, specs, stats, keep = Seq("row_idx")): _*)

    Prepared(applied, stats, outCols, specs, cachedSource = Some(cached))
  }

  /** §3.2 training-set assembly: vectorize the feature columns, window
    * (size W, shift 1, drop_remainder), split into next-step-supervision
    * (input = first W−1 rows, target = last), sequential prefix split.
    * Returns `(split, input: array<array<double>>, target: array<double>)`.
    */
  def supervisedExamples(prepared: Prepared, windowSize: Int,
                         fractions: (Double, Double, Double) = (0.7, 0.2, 0.1)): DataFrame = {
    val vec = array(prepared.outputColumns.map(c => col(c).cast("double")): _*)
    val df = prepared.df.withColumn("vec", vec)
    val split = WindowOps.prefixSplit(df, fractions, Seq.empty, Seq("row_idx"))
    val windowed = WindowOps.supervisedWindow(
      split.drop("rn"), col("vec"), windowSize, Seq("split"), Seq("row_idx"))
    windowed.select(col("split"), col("row_idx"), col("input"), col("target"))
  }

  /** `windowed_dataset_v2` training-set assembly (tfdataset.py:265-271):
    * same vectorize→split→window flow as [[supervisedExamples]], but the
    * supervision split is per COLUMN, not per row — every window row
    * contributes `input` = features 1.. and `target` = feature 0.
    * Returns `(split, row_idx, input: array<array<double>>,
    * target: array<double>)`.
    */
  def supervisedExamplesV2(prepared: Prepared, windowSize: Int,
                           fractions: (Double, Double, Double) = (0.7, 0.2, 0.1)): DataFrame = {
    val vec = array(prepared.outputColumns.map(c => col(c).cast("double")): _*)
    val df = prepared.df.withColumn("vec", vec)
    val split = WindowOps.prefixSplit(df, fractions, Seq.empty, Seq("row_idx"))
    val windowed = WindowOps.supervisedWindowV2(
      split.drop("rn"), col("vec"), windowSize, Seq("split"), Seq("row_idx"))
    windowed.select(col("split"), col("row_idx"), col("input"), col("target"))
  }

  /** Name-driven feature/target selection + window gather — the engine's
    * `get_input_target_dataset` (datapipeline.py:427-474): the reference
    * builds separate input/target datasets from feature-NAME lists, then
    * windows both and zips; index-wise that is exactly
    * `windowed_dataset_to_windowed_dataset_select_features_targets`
    * (tfdataset.py:274-283) applied to the combined feature vector, so we
    * resolve names → indices into `outputColumns` and gather once
    * (one window pass, no zip of two windowed datasets).
    */
  def supervisedExamplesSelect(prepared: Prepared, windowSize: Int,
                               inputFeatures: Seq[String], targetFeatures: Seq[String],
                               fractions: (Double, Double, Double) = (0.7, 0.2, 0.1)): DataFrame = {
    val idxOf = prepared.outputColumns.zipWithIndex.toMap
    def resolve(names: Seq[String], role: String): Seq[Int] = names.map { n =>
      idxOf.getOrElse(n, throw new IllegalArgumentException(
        s"$role feature '$n' not among output columns ${prepared.outputColumns.mkString(", ")}"))
    }
    val featureIdx = resolve(inputFeatures, "input")
    val targetIdx = resolve(targetFeatures, "target")
    val vec = array(prepared.outputColumns.map(c => col(c).cast("double")): _*)
    val df = prepared.df.withColumn("vec", vec)
    val split = WindowOps.prefixSplit(df, fractions, Seq.empty, Seq("row_idx"))
    val windowed = WindowOps.windowGather(
      split.drop("rn"), col("vec"), windowSize, featureIdx, targetIdx, Seq("split"), Seq("row_idx"))
    windowed.select(col("split"), col("row_idx"), col("input"), col("target"))
  }

  /** The reference's final training shape (`tfdataset_to_batched_tfdataset`,
    * tfdataset.py:290-298): group supervised windows into fixed batches
    * (drop_remainder), packing `inputs: array<array<array<double>>>`
    * (batch × window × features) and `targets: array<array<double>>` —
    * the "dataset ready for model.fit" boundary where the reference's
    * data plane ends (SURVEY §7.5).
    */
  def batchedExamples(examples: DataFrame, batchSize: Int): DataFrame =
    WindowOps.fixedBatches(examples, batchSize, Seq("split"), Seq("row_idx"))
      .groupBy(col("split"), col("batch_id"))
      .agg(
        sort_array(collect_list(struct(col("pos_in_batch"), col("input"), col("target"))))
          .as("packed"))
      .select(col("split"), col("batch_id"),
        transform(col("packed"), p => p.getField("input")).as("inputs"),
        transform(col("packed"), p => p.getField("target")).as("targets"))
}
