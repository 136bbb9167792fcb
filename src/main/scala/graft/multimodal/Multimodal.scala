package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed in partition-local batches.
  *
  * The decode step itself (image/audio/video) is STUBBED — the codec
  * libraries are not in this container — behind [[decodeStub]], a
  * deterministic fake that derives features from the raw bytes. What IS
  * real and tested: the schema contract, the binary column handling, the
  * `mapPartitions`-batched execution shape (the Scala analog of
  * `mapInPandas`: one iterator per partition, batch-amortized setup, no
  * per-row codec init), and the partitioning story (payload bytes never
  * shuffle; features detach from payloads before any wide operation).
  */
object Multimodal {

  /** Schema contract for a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
    )), nullable = false),
  ))

  /** Wrap a text table as a binary asset table (the test stand-in for
    * real media bytes): payload = UTF-8 bytes of `text`.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("media_type"),
      struct(length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("source").as("source")).as("meta"))

  case class DecodedFeatures(asset_id: Long, n_bytes: Long, checksum: Long, feat: Array[Double])

  /** STUB decode: a real implementation would decode image/audio bytes
    * and emit an embedding; this deterministic fake derives a tiny
    * "feature vector" from the payload bytes so the batching/schema
    * plumbing is fully exercisable. Runs per partition — codec setup
    * (here: none) would be amortized per partition exactly as a real
    * decoder's would.
    */
  def decodeStub(spark: SparkSession, assets: DataFrame, featDim: Int = 4): Dataset[DecodedFeatures] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would go here (decoder handles, model load)
        it.map { case (id, bytes) =>
          val n = if (bytes == null) 0L else bytes.length.toLong
          var sum = 0L
          var i = 0
          while (i < (if (bytes == null) 0 else bytes.length)) {
            sum = (sum * 131 + (bytes(i) & 0xff)) & 0xffffffffL
            i += 1
          }
          val feat = Array.tabulate(featDim)(j => ((sum >> (8 * j)) & 0xff) / 255.0)
          DecodedFeatures(id, n, sum, feat)
        }
      }
  }
}
