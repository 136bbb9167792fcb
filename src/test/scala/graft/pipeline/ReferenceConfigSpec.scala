package graft.pipeline

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.config.PipelineConfig

/** The strongest switch-compatibility claim: parse the reference's ACTUAL
  * shipped config files (read-only, from /root/reference) — not
  * re-creations — and run the pipeline end-to-end on CSVs synthesized to
  * each config's declared schema.
  */
class ReferenceConfigSpec extends SparkSpec {

  private val cfgDir = "/root/reference/powerdatapipeline/config"

  private def available: Boolean = Files.isDirectory(Paths.get(cfgDir))

  private def writeTemp(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_refcfg")
    val p = dir.resolve(name)
    Files.write(p, lines.mkString("\n").getBytes)
    p.toString
  }

  test("all three shipped datafusion configs parse unchanged") {
    assume(available)
    val parsed = Seq("der", "smartmeter", "nodeload").map { n =>
      n -> PipelineConfig.fromFile(s"$cfgDir/datafusion_config_$n.json")
    }.toMap
    assert(parsed("der").dataPipeline.extraction.timeIntervalOriginal == 1L)
    assert(parsed("der").dataPipeline.extraction.nRows == 200000L)
    assert(parsed("smartmeter").dataPipeline.extraction.columnsAdded ==
      Seq("datetimestamp", "datetimestampseconds"))
    assert(parsed("nodeload").dataPipeline.extraction.timeIntervalOriginal == 900L)
    parsed.values.foreach { c =>
      assert(c.dataPipeline.transformation.timeIntervalDesired == 300L)
      assert(c.dataPipeline.transformation.features.nonEmpty)
    }
  }

  test("shipped smartmeter config runs end-to-end on a schema-conforming CSV") {
    assume(available)
    val cfg = PipelineConfig.fromFile(s"$cfgDir/datafusion_config_smartmeter.json")
    val cols = cfg.dataPipeline.extraction.columnsSelected
    val header = cols.mkString(",")
    val rows = (0 until 8).map { i =>
      val mm = (i * 30) % 60
      val hh = (i * 30) / 60
      f"2016-02-01,$hh%02d:$mm%02d:00," + cols.drop(2).indices.map(j => s"${1.0 + i + j}").mkString(",")
    }
    val csv = writeTemp("sm.csv", header +: rows)
    val prep = Pipeline.run(spark, cfg, pathOverride = Some(csv), auditInterval = true)
    // 1800s -> 300s upsample: 8 rows x 6
    assert(prep.df.count() == 48)
    // spec order from the REAL config: 2 normalized loads + 6 cyclical
    assert(prep.outputColumns.size == 8)
  }

  test("shipped nodeload config runs end-to-end on a schema-conforming CSV") {
    assume(available)
    val cfg = PipelineConfig.fromFile(s"$cfgDir/datafusion_config_nodeload.json")
    val header = cfg.dataPipeline.extraction.columnsSelected.mkString(",")
    val rows = (0 until 8).map { i =>
      val mm = (i * 15) % 60
      val hh = (i * 15) / 60
      f"2023-06-01 $hh%02d:$mm%02d:00,${10.0 + i},${20.0 + i},${30.0 + i}"
    }
    val csv = writeTemp("nl.csv", header +: rows)
    val prep = Pipeline.run(spark, cfg, pathOverride = Some(csv), auditInterval = true)
    assert(prep.df.count() == 24) // 900s -> 300s
    assert(prep.outputColumns.size == 3 + 6)
  }

  test("shipped DER config runs end-to-end with its n_rows/limit semantics") {
    assume(available)
    val cfg = PipelineConfig.fromFile(s"$cfgDir/datafusion_config_der.json")
    val header = cfg.dataPipeline.extraction.columnsSelected.mkString(",")
    val rows = (0 until 1200).map { i =>
      s"${1672531200 + i}.0," + (0 until 4).map(j => s"${100.0 + i + j}").mkString(",")
    }
    val csv = writeTemp("der.csv", header +: rows)
    val prep = Pipeline.run(spark, cfg, pathOverride = Some(csv), auditInterval = true)
    assert(prep.df.count() == 4) // 1s -> 300s downsample over 1200s span
    assert(prep.outputColumns.size == 4 + 2) // 4 normalized + cyclical_minute pair
  }
}
