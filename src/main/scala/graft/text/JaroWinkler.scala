package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native codegen'd Catalyst
  * expression.
  *
  * Semantics are pinned (by a differential harness against DuckDB
  * `jaro_winkler_similarity`, itself the rapidfuzz formulation) to:
  *   - either side empty → 0.0 (checked BEFORE equality, so ""≡"" → 0.0);
  *   - equal non-empty strings → 1.0;
  *   - Jaro: match window `max(|a|,|b|)/2 - 1`, transpositions halved;
  *   - Winkler boost `j + l·0.1·(1-j)` with common prefix `l ≤ 4`,
  *     applied only when `j > 0.7` (strict).
  *
  * Unlike a UDF, `doGenCode` emits a direct static call, so the kernel
  * stays inside whole-stage codegen with no boxing / Row conversion —
  * the same pattern as Spark's own `levenshtein`. The DP scratch arrays
  * are allocated per call but bounded by the string lengths; name-length
  * strings never hit the allocator hard, and escape analysis typically
  * stack-allocates them.
  */
object JaroWinkler {

  /** Kernel over UTF8String code points. Static-forwarder-friendly:
    * Scala emits a static `similarity` on class `JaroWinkler`, which the
    * generated Java calls directly.
    */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val sa = a.toString
    val sb = b.toString
    val la = sa.length
    val lb = sb.length
    if (la == 0 || lb == 0) return 0.0
    if (sa == sb) return 1.0
    val md = math.max(la, lb) / 2 - 1
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - md)
      val hi = math.min(lb, i + md + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && sa.charAt(i) == sb.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (sa.charAt(i) != sb.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && sa.charAt(l) == sb.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  case class JaroWinklerSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType) {
        TypeCheckResult.TypeCheckSuccess
      } else {
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, string) arguments, got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaro_winkler"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.text.JaroWinkler.similarity($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): JaroWinklerSim =
      copy(left = newLeft, right = newRight)
  }

  /** Column-API wrapper (mirrors `functions.levenshtein`). */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinklerSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
