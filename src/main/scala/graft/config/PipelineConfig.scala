package graft.config

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper, PropertyNamingStrategies}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** The config-driven "query language": Scala case classes mirroring the
  * reference's pydantic models (RunConfig / Extraction / Transformation,
  * /root/reference/powerdatapipeline/datapipeline/config.py:56-154) and
  * its JSON shape (config/datafusion_config_*.json).
  *
  * Validation implements the *intended* semantics — the reference's
  * `relative_path_validator` raises "file does not exist" precisely when
  * the file DOES exist (config.py:49-50, SURVEY §2.12 #4) and
  * `one_of_many_validator` prints an unformatted `{{fields}}` template
  * (config.py:38); both fixed here by construction.
  *
  * Jackson (jackson-module-scala ships with Spark) parses snake_case JSON
  * into camelCase fields; unknown keys are ignored so reference configs
  * load unchanged.
  */
case class FeatureSpecJson(
    featureType: String = "",
    outputMode: String = "",
    features: Seq[String] = Nil) {
  def validate(): Unit = {
    val valid: Map[String, Set[String]] = Map(
      "numerical" -> Set("plain", "normalized", "rescaled"),
      "int" -> Set("int", "one_hot"),
      "string" -> Set("int", "one_hot"),
      "datetimestamp_seconds" -> Set("plain", "cyclical_minute", "cyclical_hour",
        "cyclical_day", "cyclical_minute_hour_day"))
    require(valid.contains(featureType), s"unknown feature_type: $featureType")
    require(valid(featureType).contains(outputMode),
      s"output_mode $outputMode invalid for feature_type $featureType")
    require(features.nonEmpty, "feature spec needs at least one column")
  }
}

case class ExtractionConfig(
    csvFolder: String = "",
    csvFileTrain: String = "",
    useExistingColumnnames: Boolean = true,
    nRows: Long = Long.MaxValue,
    columnsOriginal: Seq[String] = Nil,
    columnsSelected: Seq[String] = Nil,
    columnsAdded: Seq[String] = Nil,
    columnDatetime: String = "",
    columnDatetimedict: Map[String, String] = Map.empty,
    timeIntervalOriginal: Long = 1L) {
  def csvPath: String = s"$csvFolder/$csvFileTrain"
  def validate(): Unit = {
    require(csvFileTrain.nonEmpty, "csv_file_train is required")
    require(nRows > 0, "n_rows must be positive")
    require(timeIntervalOriginal > 0, "time_interval_original must be positive")
    if (!useExistingColumnnames)
      require(columnsOriginal.nonEmpty,
        "columns_original required when use_existing_columnnames=false")
  }
}

case class TransformationConfig(
    features: Seq[FeatureSpecJson] = Nil,
    timeIntervalDesired: Long = 0L,
    nRowsToAdaptFeaturespace: Long = 10000L) {
  def validate(): Unit = {
    features.foreach(_.validate())
    require(timeIntervalDesired >= 0, "time_interval_desired must be >= 0")
    require(nRowsToAdaptFeaturespace > 0, "n_rows_to_adapt_featurespace must be positive")
  }
}

case class DataPipelineConfig(
    extraction: ExtractionConfig = ExtractionConfig(),
    transformation: TransformationConfig = TransformationConfig())

case class LoggingConfig(plotEnabled: Boolean = false, plotDirectory: String = "plots/")

case class RunConfig(
    dataPipeline: DataPipelineConfig = DataPipelineConfig(),
    logging: LoggingConfig = LoggingConfig()) {
  def validate(): RunConfig = {
    dataPipeline.extraction.validate()
    dataPipeline.transformation.validate()
    this
  }
}

object PipelineConfig {
  private lazy val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.setPropertyNamingStrategy(PropertyNamingStrategies.SNAKE_CASE)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** Parse + validate a reference-shaped JSON config (the analog of
    * `get_config_dict`, utilities.py:13-30).
    */
  def fromJson(json: String): RunConfig =
    mapper.readValue(json, classOf[RunConfig]).validate()

  def fromFile(path: String): RunConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
