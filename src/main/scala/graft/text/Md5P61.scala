package graft.text

import org.apache.spark.unsafe.types.UTF8String

/** ANSI-expressible hash family backing the "md5" mode of the dedup/LSH
  * kernels ([[TextExprs.MinHashSignature]], [[TextExprs.SimHash64]],
  * [[graft.vector.VectorExprs.LshBucket]]).
  *
  * Definitions (identical in Scala and DuckDB SQL):
  *  - `base(s)` = first 15 hex chars of `md5(s)` read as a base-16 integer
  *    (60 bits, always non-negative). DuckDB: a `list_reduce` fold over
  *    `substr(md5(s), i, 1)` — see [[duckBase]].
  *  - family rehash `h_f(s) = (base(s) * A_f + B_f) mod (2^61 - 1)` with
  *    `A_f = base("graft_a:" + f) | 1`, `B_f = base("graft_b:" + f)`.
  *    One md5 per input regardless of family count; the rehash is exact
  *    modular arithmetic both engines express (DuckDB via HUGEINT, here
  *    via a 128-bit Mersenne-prime fold).
  *
  * xxhash64 stays the scale default everywhere — md5 mode exists so the
  * most novel kernels (MinHash/SimHash/LSH dedup) have REAL DuckDB oracle
  * rows instead of rows-only checks. The hash is a parameter of the
  * algorithms, not their semantics.
  */
object Md5P61 {

  /** Mersenne prime 2^61 - 1 — the rehash modulus. */
  val M: Long = (1L << 61) - 1

  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(bytes) as a base-16 long (60 bits). */
  def base(bytes: Array[Byte]): Long = {
    val md = localMd.get()
    md.reset()
    val d = md.digest(bytes)
    // first 8 digest bytes big-endian == first 16 hex chars; >>> 4 drops
    // the 16th hex char, leaving exactly the 15-char base-16 value
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  def base(s: UTF8String): Long = base(s.getBytes)
  def base(s: String): Long =
    base(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** `(x*a + b) mod (2^61 - 1)`, exact for 0 ≤ x,a,b < 2^61: 128-bit
    * product via multiplyHigh, folded with 2^61 ≡ 1 (mod M).
    */
  def mulAddMod(x: Long, a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(x, a)
    val lo = x * a
    // bits 61..124 of the product: hi*8 and lo>>>61 occupy disjoint bits
    var s = (lo & M) + ((lo >>> 61) | (hi << 3))
    s = (s & M) + (s >>> 61)
    var r = s + b
    r = (r & M) + (r >>> 61)
    if (r >= M) r - M else r
  }

  /** Multiplier of family f — `| 1` guarantees it is nonzero mod M. */
  def familyA(f: Int): Long = base("graft_a:" + f) | 1L
  def familyB(f: Int): Long = base("graft_b:" + f)

  /** DuckDB SQL fragment computing `base(expr)` — shared by every md5-mode
    * oracle so the transliteration is written exactly once. Lambda
    * variables use a `__h` prefix so they can never shadow an outer column
    * referenced by `expr` (a plain `i` here once silently captured the
    * caller's dim index, collapsing every LSH coefficient of a plane to
    * the same value).
    */
  def duckBase(expr: String): String = duckBaseHex(s"md5($expr)")

  /** Same fold over an ALREADY-COMPUTED md5 hex column. Hot-path CTEs
    * (per-shingle / per-token) must hoist `md5(x)` into a prior
    * projection and fold via this form — referencing `md5(x)` inside the
    * lambda re-evaluates the digest for every one of the 15 elements
    * (measured ~15× the oracle runtime).
    */
  def duckBaseHex(hexExpr: String): String =
    "list_reduce(list_transform(generate_series(1, 15), __hi -> " +
      s"CAST(strpos('0123456789abcdef', substr($hexExpr, __hi, 1)) - 1 AS BIGINT))" +
      ", (__ha, __hb) -> __ha * 16 + __hb)"

  /** DuckDB CTE producing (f, af, bf) for families 0..k-1. */
  def duckFams(k: Int): String =
    s"""fams AS (
       |  SELECT f,
       |    ${duckBase("'graft_a:' || CAST(f AS VARCHAR)")} | 1 AS af,
       |    ${duckBase("'graft_b:' || CAST(f AS VARCHAR)")} AS bf
       |  FROM range($k) t(f))""".stripMargin

  /** DuckDB SQL fragment for the family rehash of a BIGINT column `h`
    * against fams columns `af`/`bf`.
    */
  def duckRehash(h: String, af: String = "af", bf: String = "bf"): String =
    s"CAST((CAST($h AS HUGEINT) * $af + $bf) % $M AS BIGINT)"
}
