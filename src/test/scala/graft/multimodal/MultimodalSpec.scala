package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("documents wrap into binary assets with metadata") {
    val assets = Multimodal.assetsFromDocuments(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    val a = assets.orderBy("asset_id").head()
    assert(a.mime == "application/octet-stream")
    assert(a.media.nonEmpty)
    assert(a.duration_ms == new String(a.media, "UTF-8").length * 10L)
  }

  test("feature extraction: histogram is normalized and deterministic") {
    val f = Multimodal.decodeStub("aaaa".getBytes("UTF-8"))
    // 'a' = 0x61 → bin 6 gets everything
    assert(f(6) == 1.0f)
    assert(f.sum == 1.0f)
    assert(Multimodal.decodeStub(Array.empty[Byte]).forall(_ == 0f))

    val feats = Multimodal.extractFeatures(
      Multimodal.assetsFromDocuments(Tables.documents(spark, "/root/testdata/sf0.001")))
    val r = feats.orderBy("asset_id").head()
    assert(r.features.length == 16)
    assert(math.abs(r.features.sum - 1.0f) < 1e-4)
    assert(r.n_bytes > 0)
    // the checksum witness is the unsigned byte sum of the payload
    assert(r.byte_sum > 0 && r.byte_sum <= r.n_bytes * 255)
    val direct = Multimodal.assetsFromDocuments(
      Tables.documents(spark, "/root/testdata/sf0.001")).orderBy("asset_id").head()
    assert(r.byte_sum == direct.media.map(_ & 0xFF).map(_.toLong).sum)
  }

  test("resize downsamples to a fixed byte budget, deterministically") {
    val assets = Multimodal.assetsFromDocuments(
      Tables.documents(spark, "/root/testdata/sf0.001").limit(5))
    val resized = Multimodal.resizeAssets(assets, outBytes = 64).collect()
    assert(resized.forall(_.media.length == 64))
    assert(resized.forall(a => a.width == 8 && a.height == 8))
    // deterministic: same input → same bytes
    val again = Multimodal.resizeAssets(assets, outBytes = 64).collect()
    assert(resized.map(_.media.toSeq).toSeq == again.map(_.media.toSeq).toSeq)
    // nearest-neighbor property: every output byte occurs in the input
    val src = assets.collect().map(a => a.asset_id -> a.media.toSet).toMap
    resized.foreach(a => assert(a.media.forall(src(a.asset_id).contains)))
    // empty payload stays empty, no crash
    val empty = Multimodal.resizeAssets(
      assets.map(_.copy(media = Array.emptyByteArray)), 64).collect()
    assert(empty.forall(_.media.isEmpty))
    // a payload shorter than the budget is kept as-is, never stretched
    val short = Multimodal.resizeAssets(
      assets.map(a => a.copy(media = a.media.take(10))), 64).collect()
    assert(short.forall(_.media.length == 10))
    // invalid budget fails fast at the driver, not inside a task
    intercept[IllegalArgumentException] {
      Multimodal.resizeAssets(assets, outBytes = 0)
    }
  }

  /** A 4x2 PNG with known pixels: left half black (luma 0 → bin 0), right
    * half white (luma 255 → bin 15). Real bytes through the JDK's real
    * encoder, so the decode under test is a genuine codec round-trip.
    */
  private def testPng(w: Int = 4, h: Int = 2): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real image decode: PNG bytes through the batch feature path") {
    val png = testPng()
    // direct decode sanity: real codec, correct dims + pixels
    val img = Multimodal.decodeImage(png).get
    assert(img.getWidth == 4 && img.getHeight == 2)
    val hist = Multimodal.luminanceHistogram(img)
    assert(hist(0) == 0.5f && hist(15) == 0.5f && hist.sum == 1.0f)

    // through Spark: image mime routes to the real decoder
    val assets = Seq(
      Multimodal.MediaAsset(1L, "image/png", png, 4, 2, 0L),
      // same bytes under a non-image mime take the byte-histogram fallback
      Multimodal.MediaAsset(2L, "application/octet-stream", png, 4, 2, 0L),
      // corrupt image degrades to the fallback instead of failing the batch
      Multimodal.MediaAsset(3L, "image/png", "notapng".getBytes("UTF-8"), 0, 0, 0L)
    ).toDS()
    val feats = Multimodal.extractFeatures(assets).collect().map(f => f.asset_id -> f).toMap
    assert(feats(1L).features.toSeq == hist.toSeq)
    assert(feats(2L).features.toSeq == Multimodal.decodeStub(png).toSeq)
    assert(feats(3L).features.toSeq ==
      Multimodal.decodeStub("notapng".getBytes("UTF-8")).toSeq)
    // the checksum witness is mime-independent: same bytes, same byte_sum
    assert(feats(1L).byte_sum == feats(2L).byte_sum)
    assert(feats(1L).byte_sum == png.map(_ & 0xFF).map(_.toLong).sum)
  }

  test("real image resize: nearest-neighbor downsample, PNG re-encode") {
    val png = testPng(w = 8, h = 4)
    val assets = Seq(
      Multimodal.MediaAsset(1L, "image/png", png, 8, 4, 0L),
      Multimodal.MediaAsset(2L, "text/plain", "hello".getBytes("UTF-8"), 0, 0, 0L)
    ).toDS()
    val out = Multimodal.resizeImages(assets, outW = 2, outH = 2)
      .collect().map(a => a.asset_id -> a).toMap
    val r = out(1L)
    assert(r.width == 2 && r.height == 2 && r.mime == "image/png")
    val back = Multimodal.decodeImage(r.media).get
    assert(back.getWidth == 2 && back.getHeight == 2)
    // nearest-neighbor on the half-black/half-white source: column 0 black,
    // column 1 white (samples land at source x=0 and x=4)
    for (y <- 0 until 2) {
      assert((back.getRGB(0, y) & 0xFFFFFF) == 0x000000)
      assert((back.getRGB(1, y) & 0xFFFFFF) == 0xFFFFFF)
    }
    // non-decodable payload passes through untouched
    assert(out(2L).media.toSeq == "hello".getBytes("UTF-8").toSeq)
    assert(out(2L).mime == "text/plain")
    // deterministic re-encode: same input → same PNG bytes
    val again = Multimodal.resizeImages(assets, 2, 2).collect()
      .map(a => a.asset_id -> a.media.toSeq).toMap
    assert(again(1L) == r.media.toSeq)
    intercept[IllegalArgumentException] {
      Multimodal.resizeImages(assets, 0, 2)
    }
  }

  test("dhash: hand-checked byte route; planted near-identical PNGs pair up") {
    // byte route: strictly increasing 72-byte payload → every row-gradient
    // comparison fires → all 64 bits set
    val inc = Array.tabulate(72)(_.toByte)
    assert(Multimodal.dhash64(
      Multimodal.dhashGrid("application/octet-stream", inc)) == -1L)
    // empty payload → zero grid → no bits
    assert(Multimodal.dhash64(
      Multimodal.dhashGrid("text/plain", Array.emptyByteArray)) == 0L)
    intercept[IllegalArgumentException] { Multimodal.dhash64(new Array[Int](71)) }

    def gradPng(f: Int => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val v = f(x) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // a and b: the same left-to-right brightening structure with entirely
    // different pixel values — perceptual twins, different bytes; c is the
    // reversed gradient (all comparisons flip)
    val a = gradPng(x => x * 8)
    val b = gradPng(x => 16 + x * 6)
    val c = gradPng(x => 248 - x * 8)
    assert(!java.util.Arrays.equals(a, b))
    assert(Multimodal.dhash64(Multimodal.dhashGrid("image/png", a)) == -1L)
    assert(Multimodal.dhash64(Multimodal.dhashGrid("image/png", c)) == 0L)
    // mime routing: the SAME bytes under a non-image mime hash the bytes,
    // not the pixels
    assert(Multimodal.dhash64(Multimodal.dhashGrid("text/plain", a)) != -1L)

    val assets = Seq(
      Multimodal.MediaAsset(1L, "image/png", a, 32, 32, 0L),
      Multimodal.MediaAsset(2L, "image/png", b, 32, 32, 0L),
      Multimodal.MediaAsset(3L, "image/png", c, 32, 32, 0L)).toDS()
    val pairs = Multimodal.imageDupPairs(assets)
      .orderBy("asset_a", "asset_b").as[(Long, Long, Int)].collect().toSeq
    // the perceptual twins pair at hamming 0; the reversed gradient
    // (hamming 64 from both) is excluded
    assert(pairs == Seq((1L, 2L, 0)))
  }

  test("frame sampling slices n evenly spaced windows") {
    val assets = Multimodal.assetsFromDocuments(
      Tables.documents(spark, "/root/testdata/sf0.001").limit(3))
    val frames = Multimodal.sampleFrames(assets, n = 4)
    val counts = frames.groupBy("asset_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ == 4))
    val sizes = frames.select(octet_length(col("frame_bytes"))).as[Int].collect()
    assert(sizes.forall(s => s > 0 && s <= 32))
  }
}
