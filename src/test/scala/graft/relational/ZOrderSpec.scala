package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave for the differential check. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("morton2: known bit patterns and differential vs reference") {
    val rows = Seq((3L, 1L), (0L, 0L), (65535L, 0L), (0L, 65535L), (12345L, 54321L))
      .toDF("x", "y")
    val got = rows.select(col("x"), col("y"),
        ZOrder.morton2(col("x"), col("y"), 16).as("z"))
      .as[(Long, Long, Long)].collect().toSeq
    // x=0b11,y=0b01 -> bits 0(x0),1(y0),2(x1) -> 0b0111 = 7
    assert(got.find(r => r._1 == 3L && r._2 == 1L).get._3 == 7L)
    got.foreach { case (x, y, z) => assert(z == mortonRef(x, y, 16), s"($x,$y)") }
    intercept[IllegalArgumentException] { ZOrder.morton2(col("x"), col("y"), 0) }
  }

  test("zorderBy clusters both dimensions (tighter per-chunk spans than 1-D sort)") {
    // a 64x64 grid; after z-sort, any contiguous chunk of 256 rows must
    // span far less than the full y range (a 1-D x sort would leave y
    // spanning the whole domain in every chunk)
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")
    val sorted = ZOrder.zorderBy(grid, col("x"), col("y"), 6)
      .as[(Long, Long)].collect()
    val worstYSpan = sorted.grouped(256).map { chunk =>
      chunk.map(_._2).max - chunk.map(_._2).min
    }.max
    assert(worstYSpan <= 16, s"worst chunk y-span $worstYSpan") // 256 rows = a 16x16 z-block
  }

  test("clustering depth: perfectly clustered key has depth 1, shuffled key overlaps") {
    // key == probe: each 10-wide file holds one disjoint probe range
    val clustered = (0L until 100L).map(i => (i, i)).toDF("k", "p")
    val good = ZOrder.clusteringDepth(clustered, col("k"), col("p"),
      "good", fileWidth = 10L)
      .as[(String, Long, Long, Double, Double)].collect().head
    assert(good == (("good", 10L, 1L, 1.0, 0.1)))
    // probe uncorrelated with key (bit-reversed-ish): every file spans
    // most of the probe domain -> depth near n_files
    val shuffled = (0L until 100L).map(i => (i, (i * 37) % 100)).toDF("k", "p")
    val bad = ZOrder.clusteringDepth(shuffled, col("k"), col("p"),
      "bad", fileWidth = 10L)
      .as[(String, Long, Long, Double, Double)].collect().head
    assert(bad._2 == 10L && bad._3 == 10L, s"expected full overlap, got $bad")
  }

  test("layout comparison: z-order beats insert order on the probe column") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val out = ZOrder.layoutComparison(li)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(out("zorder") < out("natural"),
      s"z-order should scan a smaller file fraction: $out")
  }
}
