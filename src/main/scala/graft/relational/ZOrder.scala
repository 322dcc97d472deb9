package graft.relational

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two dimension keys
  * into one sort key so that sorting by it co-locates rows that are close
  * in BOTH dimensions — the data-layout pass behind multi-dimensional file
  * skipping (each parquet file's min/max footer then prunes on either
  * predicate, not just the leading sort column).
  *
  * At 100 TB this is a LAYOUT operator: `zorderBy` is one range-partitioned
  * sort (the same cost class as any clustered write), and the key itself is
  * a pure bit-twiddling expression — 2·bits shift/and/or terms, fully
  * inside whole-stage codegen, no UDF, no shuffle of its own.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative long columns:
    * bit i of x → bit 2i, bit i of y → bit 2i+1.
    */
  def morton2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"morton2 bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The identical interleave as a DuckDB SQL fragment — generated from the
    * same loop so the two engines cannot drift.
    */
  def duckMorton2(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  /** Range-partitioned sort by the interleaved key — the clustered-write
    * layout pass. Downstream `.write` produces files whose per-file min/max
    * spans are tight in both dimensions.
    */
  def zorderBy(df: DataFrame, x: Column, y: Column, bits: Int): DataFrame =
    df.orderBy(morton2(x, y, bits))

  // ---- queries -------------------------------------------------------------

  private val Bits = 16

  /** q83: lineitem z-ordered on (price bucket, quantity). floor() is
    * explicit in BOTH engines (Spark's long cast truncates, DuckDB's
    * rounds — floor removes the divergence).
    */
  val qZOrder = GraftQuery(
    "q83_zorder_layout",
    (s, dir) => {
      val x = least(floor(col("l_extendedprice") / 16.0), lit(65535.0)).cast("long")
      val y = least(floor(col("l_quantity")), lit(65535.0)).cast("long")
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          morton2(x, y, Bits).as("zorder"))
        .orderBy(col("zorder"), col("l_orderkey"), col("l_linenumber"))
    },
    Some(s"""
      SELECT l_orderkey, l_linenumber,
             ${duckMorton2(
               "CAST(least(floor(l_extendedprice / 16.0), 65535.0) AS BIGINT)",
               "CAST(least(floor(l_quantity), 65535.0) AS BIGINT)", Bits)} AS zorder
      FROM lineitem
      ORDER BY zorder, l_orderkey, l_linenumber"""))

  val queries: Seq[GraftQuery] = Seq(qZOrder)
}
