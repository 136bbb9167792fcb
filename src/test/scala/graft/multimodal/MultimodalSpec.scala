package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  lazy val assets = Multimodal.assetsFromDocuments(Tables.documents(spark, sf)).cache()

  test("asset table matches the schema contract") {
    assert(assets.schema("payload").dataType.typeName == "binary")
    assert(assets.schema("meta").dataType.typeName == "struct")
    assert(assets.count() == Tables.documents(spark, sf).count())
  }

  test("metadata n_bytes equals payload length") {
    val bad = assets.filter(length(col("payload")).cast("long") =!= col("meta.n_bytes")).count()
    assert(bad == 0)
  }

  test("decodeStub runs batched per partition and is deterministic") {
    val d1 = Multimodal.decodeStub(spark, assets).collect().map(f => f.asset_id -> f.checksum).toMap
    val d2 = Multimodal.decodeStub(spark, assets.repartition(7)).collect()
      .map(f => f.asset_id -> f.checksum).toMap
    assert(d1 == d2) // partitioning must not change results
    assert(d1.nonEmpty)
  }

  test("decoded features have the declared dim and bounded range") {
    val f = Multimodal.decodeStub(spark, assets, featDim = 6).head()
    assert(f.feat.length == 6)
    assert(f.feat.forall(x => x >= 0.0 && x <= 1.0))
  }
}
