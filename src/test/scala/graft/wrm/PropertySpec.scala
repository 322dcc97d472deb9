package graft.wrm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5 rebuild strategy): parser drop-invariants and
  * the classification partition of the (id, name) space. Uses raw
  * scalacheck generators with fixed seeds (scalatest+scalacheck bridge is
  * not in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val idGen: Gen[String] = Gen.oneOf(
    Gen.numStr.map(_.take(6)),
    Gen.alphaNumStr.map("fb" + _.take(4)),
    Gen.alphaNumStr.map(_.take(6)))
  private val nameGen: Gen[String] = Gen.oneOf(
    Gen.alphaStr.map("BIKE " + _.take(5)),
    Gen.alphaStr.map("Station " + _.take(5)),
    Gen.const(""))

  test("classification is a total partition into station/bike/unknown") {
    val pairs = samples(Gen.zip(idGen, nameGen), 200)
    assert(pairs.size > 100)
    val out = pairs.toDF("station_id", "name")
      .select(Enhance.recordType(col("station_id"), col("name")).as("rt"))
      .as[String].collect()
    assert(out.length == pairs.length)
    assert(out.forall(Schemas.recordTypes.contains))
    // replicate the rules in plain Scala and require agreement
    val expected = pairs.map { case (id, name) =>
      if (id.nonEmpty && id.forall(c => c >= '0' && c <= '9') && !name.startsWith("BIKE")) "station"
      else if (id.startsWith("fb") && name.startsWith("BIKE")) "bike"
      else "unknown"
    }
    assert(out.toSeq == expected)
  }

  test("composite split: only rows with exactly 2 pipes survive parsing") {
    val compositeGen = Gen.oneOf(
      "1705147845.1|3600|-3600", // valid
      "1705147845.1|3600",       // too few
      "1705147845.1|1|2|3",      // too many
      "garbage", "", "|||")
    val comps = samples(compositeGen, 200)
    val df = comps.zipWithIndex.map { case (c, i) => (s"00$i", c) }
      .toDF("station_id", "composite_ts")
      .withColumn("_parts", split(col("composite_ts"), "\\|"))
      .filter(size(col("_parts")) === 3)
    val expected = comps.count(_.count(_ == '|') == 2)
    assert(df.count() == expected)
  }

  test("fingerprint stays within [0, 1e9+7) for arbitrary ascii text") {
    val texts = samples(Gen.asciiPrintableStr.map(_.take(50)), 100)
    val fps = texts.zipWithIndex.map(t => (t._2.toLong, t._1))
      .toDF("doc_id", "text")
      .select(graft.text.TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[Long].collect()
    assert(fps.length == texts.length)
    assert(fps.forall(fp => fp >= 0 && fp < 1000000007L))
  }

  test("simhash band boundaries partition all 64 bits for every band count") {
    // the integer-division layout simhashDupPairs relies on: bands b cover
    // [b*64/bands, (b+1)*64/bands) — non-empty, in range, disjoint, total
    (1 to 64).foreach { bands =>
      val spans = (0 until bands).map(b => (b * 64 / bands, (b + 1) * 64 / bands))
      assert(spans.forall { case (lo, hi) => lo >= 0 && hi <= 64 && hi > lo },
        s"bad span for bands=$bands: $spans")
      assert(spans.map { case (lo, hi) => hi - lo }.sum == 64)
      assert(spans.sliding(2).forall {
        case Seq((_, h1), (l2, _)) => h1 == l2
        case _ => true
      })
    }
  }

  test("simhash banding is pigeonhole-complete: hamming <= 3 shares a band") {
    // candidate generation bands the 64-bit fingerprint into 4×16 bits; any
    // two fingerprints within hamming distance 3 MUST collide in >= 1 band
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val fp = rnd.nextLong()
      val flips = rnd.nextInt(4) // 0..3 bit flips
      val positions = Seq.fill(flips)(rnd.nextInt(64)).distinct
      val fp2 = positions.foldLeft(fp)((acc, b) => acc ^ (1L << b))
      val bandsA = (0 until 4).map(b => (fp >>> (b * 16)) & 0xFFFFL)
      val bandsB = (0 until 4).map(b => (fp2 >>> (b * 16)) & 0xFFFFL)
      assert(bandsA.zip(bandsB).exists { case (x, y) => x == y },
        s"no shared band for $fp vs $fp2 (${positions.length} flips)")
    }
  }

  test("minhash est_jaccard is within [0,1] and 1 for identical docs (random corpora)") {
    val textGen = Gen.listOfN(30, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
      .map(_.mkString(" "))
    val texts = samples(textGen, 40)
    val docs = texts.zipWithIndex.map(t => (t._2.toLong, t._1)).toDF("doc_id", "text")
    val pairs = graft.text.TextDedup.minhashDupPairs(docs, threshold = 0.0).collect()
    pairs.foreach { r =>
      val est = r.getAs[Double]("est_jaccard")
      val j = r.getAs[Double]("jaccard")
      assert(est >= 0.0 && est <= 1.0)
      assert(j >= 0.0 && j <= 1.0)
    }
  }
}
