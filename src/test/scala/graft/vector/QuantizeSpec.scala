package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("quantization audit: hand-computed codes and errors on a tiny dim") {
    // one dimension, values 0.0 and 1.0: lo=0 hi=1, codes 0 and 255;
    // dequant(0) = 0.5/256, dequant(255) = 255.5/256
    val embs = Seq(
      (1L, Seq(0.0f)), (2L, Seq(1.0f)))
      .toDF("vec_id", "embedding")
    val row = Quantize.quantizationAudit(embs, dims = 1).collect().head
    assert(row.getInt(0) == 0)
    assert(row.getDouble(1) == 0.0 && row.getDouble(2) == 1.0)
    assert(row.getLong(3) == 2L)
    val e0 = 0.0 - 0.5 / 256.0
    val e1 = 1.0 - 255.5 / 256.0
    val mse = (BigDecimal(e0 * e0).setScale(12, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(e1 * e1).setScale(12, BigDecimal.RoundingMode.HALF_UP)).toDouble / 2
    assert(math.abs(row.getDouble(4) - mse) < 1e-15)
    assert(math.abs(row.getDouble(5) - math.max(e0.abs, e1.abs)) < 1e-15)
  }

  test("quantization audit: constant dimension quantizes losslessly") {
    // hi == lo -> code 0, dequant must equal... dequant = lo + 0.5*(0)/256
    // = lo exactly, so error is 0
    val embs = Seq((1L, Seq(0.5f, 3.0f)), (2L, Seq(0.5f, -1.0f)))
      .toDF("vec_id", "embedding")
    val rows = Quantize.quantizationAudit(embs, dims = 2).collect()
    val dim0 = rows.find(_.getInt(0) == 0).get
    assert(dim0.getDouble(4) == 0.0 && dim0.getDouble(5) == 0.0)
    // varying dim errors are bounded by a bucket width
    val dim1 = rows.find(_.getInt(0) == 1).get
    assert(dim1.getDouble(5) <= (3.0 - -1.0) / 256.0)
    intercept[IllegalArgumentException] { Quantize.quantizationAudit(embs, 0) }
  }

  test("quantization audit: max error bounded by half a bucket on real data") {
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rows = Quantize.quantizationAudit(embs, dims = 64)
      .select(col("hi") - col("lo"), col("max_abs_err"))
      .as[(Double, Double)].collect()
    assert(rows.length == 64)
    rows.foreach { case (width, maxErr) =>
      assert(maxErr <= width / 256.0 / 2.0 + 1e-12,
        s"err $maxErr exceeds half-bucket ${width / 512.0}")
    }
  }
}
