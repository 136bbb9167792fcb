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

  test("decodePixels matches the closed-form generator and is partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val bmps = Multimodal.syntheticBmpPayloads(spark, docs)
    val d1 = Multimodal.decodePixels(spark, bmps).collect()
    assert(d1.length == docs.count()) // every BMP decodes
    d1.foreach { p =>
      val id = p.asset_id
      val w = (id % 7 + 2).toInt; val h = (id % 5 + 2).toInt
      assert(p.width == w && p.height == h && p.n_px == w.toLong * h)
      val px = for (y <- 0 until h; x <- 0 until w) yield (x, y)
      assert(p.sum_r == px.map { case (x, y) => (id + 13L * x + 31L * y) % 256 }.sum)
      assert(p.sum_g == px.map { case (x, y) => (2L * id + 7L * x + 3L * y) % 256 }.sum)
      assert(p.sum_b == px.map { case (x, y) => (5L * id + 11L * x + 17L * y) % 256 }.sum)
      assert(p.mean_r == p.sum_r.toDouble / p.n_px)
    }
    val d2 = Multimodal.decodePixels(spark, bmps.repartition(7)).collect()
    assert(d1.map(p => p.asset_id -> p.sum_r).toMap ==
      d2.map(p => p.asset_id -> p.sum_r).toMap) // partitioning must not change results
  }

  test("decodePixels decodes a real ImageIO-written PNG (format-independent path)") {
    // round-trip: build a BufferedImage, encode it as a REAL PNG via
    // ImageIO.write, decode through the same production path as BMP
    val w = 5; val h = 3
    val im = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      im.setRGB(x, y, ((10 * x + y) << 16) | ((20 * x) << 8) | (30 * y))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(im, "png", baos))
    import spark.implicits._
    val one = Seq((1L, baos.toByteArray)).toDF("asset_id", "payload")
    val p = Multimodal.decodePixels(spark, one).head()
    assert(p.width == w && p.height == h && p.n_px == w * h)
    val px = for (y <- 0 until h; x <- 0 until w) yield (x, y)
    assert(p.sum_r == px.map { case (x, y) => 10L * x + y }.sum)
    assert(p.sum_g == px.map { case (x, _) => 20L * x }.sum)
    assert(p.sum_b == px.map { case (_, y) => 30L * y }.sum)
  }

  test("decodePixels drops undecodable payloads instead of failing") {
    import spark.implicits._
    val junk = Seq((1L, "not an image".getBytes), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("asset_id", "payload")
    assert(Multimodal.decodePixels(spark, junk).count() == 0)
  }

  test("decodeWav matches the closed-form generator and is partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val wavs = Multimodal.syntheticWavPayloads(spark, docs)
    val d1 = Multimodal.decodeWav(spark, wavs).collect()
    assert(d1.length == docs.count()) // every WAV decodes
    d1.foreach { a =>
      val id = a.asset_id
      val n = (id % 50 + 10).toInt
      val vals = (0 until n).map(i => (id * 31 + i.toLong * 17) % 65536 - 32768)
      assert(a.sample_rate == 8000 + (id % 3) * 4000 && a.n_channels == 1)
      assert(a.n_samples == n)
      assert(a.sum_s == vals.sum && a.sum_abs == vals.map(math.abs).sum)
      assert(a.min_s == vals.min && a.max_s == vals.max)
      assert(a.mean_s == vals.sum.toDouble / n)
    }
    val d2 = Multimodal.decodeWav(spark, wavs.repartition(7)).collect()
    assert(d1.map(a => a.asset_id -> a.sum_s).toMap ==
      d2.map(a => a.asset_id -> a.sum_s).toMap)
  }

  test("decodeWav decodes a real AudioSystem-written WAV (format interop)") {
    // round-trip: encode samples with javax.sound.sampled (JDK built-in)
    // and decode through the production chunk-walking parser
    import javax.sound.sampled._
    val samples = Array[Short](100, -200, 32767, -32768, 0, 5)
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = (s & 0xff).toByte; bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(16000f, 16, 1, true, false) // s16 LE mono
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    val got = Multimodal.parseWav(7L, baos.toByteArray)
    assert(got.isDefined, "AudioSystem WAV must parse")
    val a = got.get
    assert(a.sample_rate == 16000 && a.n_channels == 1 && a.n_samples == samples.length)
    assert(a.sum_s == samples.map(_.toLong).sum)
    assert(a.min_s == -32768 && a.max_s == 32767)
  }

  test("parseWav rejects non-WAV, truncated, and non-PCM-16 payloads") {
    assert(Multimodal.parseWav(1, null).isEmpty)
    assert(Multimodal.parseWav(1, "RIFFxxxxWAVE".getBytes).isEmpty) // no chunks
    assert(Multimodal.parseWav(1, "not audio at all, just text bytes here".getBytes).isEmpty)
    // a valid WAV truncated mid-data must be dropped, not mis-summed
    val ok = Multimodal.wavPcm16Mono(8000, Array[Short](1, 2, 3, 4), infoBytes = 3)
    assert(Multimodal.parseWav(1, ok).isDefined)
    assert(Multimodal.parseWav(1, ok.dropRight(3)).isEmpty)
    // 8-bit PCM (bits=16 flipped to 8) must be rejected: patch the fmt chunk
    val eight = ok.clone()
    eight(12 + 8 + 14) = 8 // bitsPerSample LSB inside "fmt " body
    assert(Multimodal.parseWav(1, eight).isEmpty)
  }

  // ------------------------------------------------------------------
  // parseImageHeader: pure-Scala PNG IHDR / JPEG SOFn byte parsing
  // ------------------------------------------------------------------

  private def hexBytes(hx: String): Array[Byte] =
    hx.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def be16(v: Int) = f"$v%04X"
  private def be32(v: Int) = f"$v%08X"

  private def png(w: Int, h: Int, depth: Int = 8, color: Int = 6): Array[Byte] =
    hexBytes("89504E470D0A1A0A 0000000D 49484452 " +
      be32(w) + be32(h) + f"$depth%02X$color%02X" + "000000 00000000")

  test("parseImageHeader reads PNG IHDR fields") {
    assert(Multimodal.parseImageHeader(png(640, 480)) == Some(("png", 640, 480, 8, 6)))
    assert(Multimodal.parseImageHeader(png(70000, 3, depth = 16, color = 2))
      == Some(("png", 70000, 3, 16, 2))) // >u16 width exercises the u32 read
  }

  test("parseImageHeader scans JPEG markers to SOFn past multiple variable segments") {
    // SOI, APP0 (JFIF, 16 bytes), APP1 (odd 5-byte length), COM, fill
    // bytes before the SOF marker, then SOF2 (progressive, still a frame
    // header), then EOI
    val jpeg = hexBytes(
      "FFD8" +
      "FFE0 0010 4A46494600 0101 00 0048 0048 00 00" +
      "FFE1 0005 616263" +
      "FFFE 0004 5858" +
      "FFFF" + // fill byte before marker
      "FFC2 0011 10 " + be16(1080) + be16(1920) + " 03 012200 021101 031101" +
      "FFD9")
    assert(Multimodal.parseImageHeader(jpeg) == Some(("jpeg", 1920, 1080, 16, 3)))
  }

  test("parseImageHeader skips standalone markers and rejects non-images") {
    // RST0 + TEM standalone markers between SOI and SOF0
    val weird = hexBytes("FFD8 FFD0 FF01 FFC0 0011 08 " + be16(2) + be16(3) +
      " 03 012200 021101 031101 FFD9")
    assert(Multimodal.parseImageHeader(weird) == Some(("jpeg", 3, 2, 8, 3)))
    assert(Multimodal.parseImageHeader(null).isEmpty)
    assert(Multimodal.parseImageHeader(Array.empty[Byte]).isEmpty)
    assert(Multimodal.parseImageHeader("plain text bytes, not an image".getBytes).isEmpty)
    // EOI before any SOF → no dimensions
    assert(Multimodal.parseImageHeader(hexBytes("FFD8FFD9")).isEmpty)
    // truncated mid-segment
    assert(Multimodal.parseImageHeader(hexBytes("FFD8FFE000")).isEmpty)
    // DHT (C4) must NOT be mistaken for a SOF
    assert(Multimodal.parseImageHeader(hexBytes("FFD8 FFC4 0004 0000 FFD9")).isEmpty)
    // marker desync (non-FF where a marker must start)
    assert(Multimodal.parseImageHeader(hexBytes("FFD8 00FF")).isEmpty)
  }

  test("decodeHeaders over synthetic payloads matches the id-derived dimensions") {
    val docs = Tables.documents(spark, sf)
    val decoded = Multimodal.decodeHeaders(spark,
      Multimodal.syntheticImagePayloads(docs)).collect()
    assert(decoded.length == docs.count()) // every payload parses
    decoded.foreach { hdr =>
      val id = hdr.asset_id
      assert(hdr.width == id % 997 + 1 && hdr.height == id % 499 + 1)
      if (id % 2 == 0) assert(hdr.format == "png" && hdr.bit_depth == 8 && hdr.color == 6)
      else assert(hdr.format == "jpeg" && hdr.bit_depth == 8 && hdr.color == 3)
    }
  }
}
