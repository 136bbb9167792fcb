package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Perceptual-hash image dedup: dHash bit-exactness vs the closed-form
  * pixel generator, the pigeonhole completeness of Hamming banding, and
  * planted 1-px-perturbed replica recall through the full candidate →
  * verify pipeline.
  */
class ImagePhashSpec extends SparkSpec {
  import spark.implicits._

  // the synthetic corpus's closed-form pixel channels (the same formula
  // multimodal_pixels' oracle uses; Multimodal.imgPx is private)
  private def px(id: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((id + 13L * x + 31L * y) % 256).toInt,
    ((2L * id + 7L * x + 3L * y) % 256).toInt,
    ((5L * id + 11L * x + 17L * y) % 256).toInt)

  private def dims(id: Long): (Int, Int) = ((id % 7 + 2).toInt, (id % 5 + 2).toInt)

  /** Reference dHash56 straight from a pixel function — what the DuckDB
    * oracle computes; the decoder must reproduce it from real bytes.
    */
  private def refHash(w: Int, h: Int, f: (Int, Int) => (Int, Int, Int)): Long = {
    var hash = 0L
    for (j <- 0 until 8; i <- 0 until 8) {
      val (r, g, b) = f(i * w / 8, j * h / 8)
      val lum = 299L * r + 587L * g + 114L * b
      if (i > 0) {
        val (r0, g0, b0) = f((i - 1) * w / 8, j * h / 8)
        val lum0 = 299L * r0 + 587L * g0 + 114L * b0
        if (lum > lum0) hash |= 1L << (j * 7 + (i - 1))
      }
    }
    hash
  }

  test("dhash56 decodes real BMP/PNG bytes to the closed-form hash; containers agree") {
    val ids = (0L until 70L).toSeq
    val payloads = ids.flatMap { id =>
      val (w, h) = dims(id)
      // BOTH containers for the SAME raster: a perceptual hash must not
      // see the encoding, so the BMP and the PNG of one image get
      // distinct asset ids but identical hashes
      Seq((id * 2, Multimodal.bmp24(w, h, px(id))),
          (id * 2 + 1, Multimodal.pngRgb24(w, h, px(id))))
    }
    val got = Multimodal.dhash56(spark, payloads.toDF("asset_id", "payload"))
      .collect().map(p => p.asset_id -> p.phash).toMap
    assert(got.size == ids.size * 2)
    ids.foreach { id =>
      val (w, h) = dims(id)
      val want = refHash(w, h, px(id))
      assert(got(id * 2) == want, s"BMP hash mismatch for id $id")
      assert(got(id * 2 + 1) == want, s"PNG hash mismatch for id $id")
      assert((want >> 56) == 0L, "hash must stay within 56 bits")
    }
  }

  test("hamming banding is pigeonhole-complete: every hash pair within distance 7 is a candidate") {
    val hashes = Multimodal.dhash56(spark,
        Multimodal.syntheticPixelPayloads(spark, Tables.documents(spark, sf)))
      .toDF().select(col("phash")).distinct()
    val vals = hashes.as[Long].collect()
    val close = for {
      a <- vals; b <- vals
      if a < b && java.lang.Long.bitCount(a ^ b) <= 7
    } yield (a, b)
    val cand = Dedup.hammingBandPairs(hashes, "phash", nBands = 8, bitsPerBand = 7)
      .as[(Long, Long)].collect().toSet
    assert(close.nonEmpty, "corpus slice should contain close hash pairs")
    close.foreach { p => assert(cand.contains(p), s"missed pair $p") }
  }

  test("planted 1-px-perturbed replicas: bounded distance, full recall through candidate+verify") {
    val ids = (0L until 80L).toSeq
    val Off = 100000L
    val payloads = ids.flatMap { id =>
      val (w, h) = dims(id)
      val orig = px(id) _
      // the replica: one source pixel's red channel shifted — a local
      // edit (watermark pixel, hot pixel, tiny retouch)
      val pert = (x: Int, y: Int) => {
        val (r, g, b) = orig(x, y)
        if (x == 0 && y == 0) (((r + 96) % 256), g, b) else (r, g, b)
      }
      // keep each id's container format (even BMP / odd PNG, like the
      // corpus payloads) so the pair isolates the pixel change
      def enc(f: (Int, Int) => (Int, Int, Int)) =
        if (id % 2 == 0) Multimodal.bmp24(w, h, f) else Multimodal.pngRgb24(w, h, f)
      Seq((id, enc(orig)), (id + Off, enc(pert)))
    }
    val hashed = Multimodal.dhash56(spark, payloads.toDF("asset_id", "payload")).toDF()
    val byId = hashed.as[(Long, Long)].collect().toMap
    // a 1-px change reaches only the grid cells sampling that pixel; all
    // of them shift by the same luminance delta, so comparisons BETWEEN
    // changed cells cancel and only one boundary comparison per affected
    // row can flip: distance <= 4 rows' worth here (h >= 2)
    val dists = ids.map(id => id -> java.lang.Long.bitCount(byId(id) ^ byId(id + Off)))
    assert(dists.forall(_._2 <= 4), s"unexpectedly large perturbation: $dists")
    assert(dists.exists(_._2 >= 1), "perturbation should flip at least one bit somewhere")
    // full pipeline over the planted corpus: distinct hashes → banding →
    // verify <= 6; every planted pair at distance 1..6 MUST come back
    val verified = Dedup.hammingBandPairs(hashed.select(col("phash")), "phash",
        nBands = 8, bitsPerBand = 7)
      .withColumn("hamming", expr("CAST(bit_count(phash_a ^ phash_b) AS BIGINT)"))
      .filter(col("hamming") <= 6)
      .select(col("phash_a"), col("phash_b"))
      .as[(Long, Long)].collect().toSet
    val wanted = dists.collect { case (id, d) if d >= 1 && d <= 6 =>
      val (a, b) = (byId(id), byId(id + Off))
      (math.min(a, b), math.max(a, b))
    }
    wanted.foreach { p =>
      assert(verified.contains(p), s"planted near-dup pair $p not recalled")
    }
    // distance-0 replicas are exact perceptual dups: same hash, same group
    dists.collect { case (id, 0) => id }.foreach { id =>
      assert(byId(id) == byId(id + Off))
    }
  }
}
