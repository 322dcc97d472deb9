package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Pins the md5-p61 hash family against independent references: the base
  * parse against a hand-computed md5 prefix (cross-checked with DuckDB's
  * fold — same constant), and the Mersenne mulAddMod against BigInt.
  */
class Md5P61Spec extends AnyFunSuite {

  test("base = first 15 hex chars of md5 as base-16") {
    // md5('hello') = 5d41402abc4b2a76b9719d911017c592
    // 0x5d41402abc4b2a7 = 419982666956583591 (DuckDB fold agrees)
    assert(Md5P61.base("hello") == 419982666956583591L)
    assert(Md5P61.base("hello") == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
    // empty string: md5('') = d41d8cd98f00b204e9800998ecf8427e
    assert(Md5P61.base("") == java.lang.Long.parseLong("d41d8cd98f00b20", 16))
    // multi-byte UTF-8 goes through byte-level md5, same as SQL md5
    assert(Md5P61.base("héllo") ==
      Md5P61.base("héllo".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  test("mulAddMod matches BigInt modular arithmetic (incl. DuckDB cross-check)") {
    val M = BigInt(Md5P61.M)
    // DuckDB: CAST((CAST(2^60-1 AS HUGEINT)*(2^60-1) + 5) % (2^61-1) AS BIGINT)
    assert(Md5P61.mulAddMod((1L << 60) - 1, (1L << 60) - 1, 5L) == 576460752303423493L)
    val rnd = new scala.util.Random(42)
    (1 to 20000).foreach { _ =>
      val x = rnd.nextLong() & ((1L << 61) - 1)
      val a = rnd.nextLong() & ((1L << 61) - 1)
      val b = rnd.nextLong() & ((1L << 61) - 1)
      val expected = ((BigInt(x) * BigInt(a) + BigInt(b)) mod M).toLong
      assert(Md5P61.mulAddMod(x, a, b) == expected,
        s"mulAddMod($x, $a, $b)")
    }
    // edge cases: zeros and M-1 operands
    val edge = Seq(0L, 1L, Md5P61.M - 1, (1L << 60) - 1, (1L << 60))
    for (x <- edge; a <- edge; b <- edge) {
      val expected = ((BigInt(x) * BigInt(a) + BigInt(b)) mod M).toLong
      assert(Md5P61.mulAddMod(x, a, b) == expected)
    }
  }

  test("family constants are deterministic and A is odd/nonzero") {
    (0 until 64).foreach { f =>
      assert((Md5P61.familyA(f) & 1L) == 1L)
      assert(Md5P61.familyA(f) == Md5P61.familyA(f))
      assert(Md5P61.familyB(f) >= 0L && Md5P61.familyB(f) < (1L << 60))
    }
  }
}
