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
