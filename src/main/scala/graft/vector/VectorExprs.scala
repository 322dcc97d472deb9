package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector kernels.
  *
  * The zip_with/aggregate forms (kept in Similarity as the composable
  * reference implementation) evaluate lambdas interpreted per element; for
  * 64-float embeddings that overhead swamps the arithmetic. These run one
  * tight JIT-compiled loop per row over the raw ArrayData.
  */
object VectorExprs {

  private def toDouble(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case _ => throw new IllegalArgumentException(s"unsupported element type $et")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Cosine similarity of two numeric arrays in double precision;
    * 0.0 when either norm is zero (matches Similarity.cosine).
    */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val tx = elemType(left)
      val ty = elemType(right)
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        val xi = toDouble(x, i, tx)
        val yi = toDouble(y, i, ty)
        dot += xi * yi; nx += xi * xi; ny += yi * yi
        i += 1
      }
      if (nx == 0.0 || ny == 0.0) java.lang.Double.valueOf(0.0)
      else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
      copy(left = l, right = r)
  }

  /** Random-hyperplane LSH bucket: bit p = sign of Σ x_i·coeff(p,i), with
    * deterministic pseudo-random coefficients — no RNG state, stable
    * across partitionings and runs. `planeOffset` selects an independent
    * hyperplane family, giving multiple hash TABLES (OR-amplification)
    * from the same expression.
    *
    * `hashMode` "xx" (default): coefficients from xxhash64. "md5":
    * coefficients from [[graft.text.Md5P61]] — `(base % 2000 - 1000)/1000`
    * — so a DuckDB oracle can derive the identical hyperplanes. Either
    * way coefficients depend only on (plane, dim index): they are
    * computed once per task and cached, not per row.
    */
  case class LshBucket(child: Expression, planes: Int, planeOffset: Int = 0,
                       hashMode: String = "xx")
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    private val useMd5 = graft.text.TextExprs.isMd5Mode(hashMode)

    private def coeff(p: Int, i: Int): Double =
      if (useMd5)
        (graft.text.Md5P61.base(s"graft_lsh:$p:$i") % 2000L - 1000L) / 1000.0
      else {
        val h = XxHash64Function.hash(p.toLong * 65536L + i, LongType, 42L)
        (((h % 2000L) + 2000L) % 2000L - 1000L) / 1000.0
      }

    // benign-race cache (both builders compute identical values); grows if
    // a later row has more dims than the first
    @transient private var cache: Array[Array[Double]] = _
    private def coeffs(n: Int): Array[Array[Double]] = {
      var c = cache
      if (c == null || (planes > 0 && c(0).length < n)) {
        c = Array.tabulate(planes)(p => Array.tabulate(n)(i => coeff(planeOffset + p, i)))
        cache = c
      }
      c
    }

    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val t = elemType(child)
      val n = x.numElements()
      val cs = coeffs(n)
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val row = cs(p)
        var score = 0.0
        var i = 0
        while (i < n) {
          score += toDouble(x, i, t) * row(i)
          i += 1
        }
        if (score >= 0) bucket |= (1L << p)
        p += 1
      }
      java.lang.Long.valueOf(bucket)
    }
    override protected def withNewChildInternal(c: Expression): LshBucket = copy(child = c)
  }

  /** Argmax-cosine against a small driver-collected centroid matrix,
    * evaluated as a narrow per-row map — the broadcast-argmin shape that
    * keeps k-means assignment shuffle-free (the alternative, crossJoin +
    * groupBy(vec_id) argmax, shuffles every corpus vector per iteration).
    * Ties break toward the lower cell id. Returns struct(cell, sim).
    */
  case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("sim", DoubleType, nullable = false)))
    @transient private lazy val norms: Array[Double] =
      centroids.map { ce =>
        var s = 0.0; var i = 0
        while (i < ce.length) { s += ce(i).toDouble * ce(i).toDouble; i += 1 }
        math.sqrt(s)
      }
    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val t = elemType(child)
      val nx = {
        var s = 0.0; var i = 0
        while (i < x.numElements()) { val xi = toDouble(x, i, t); s += xi * xi; i += 1 }
        math.sqrt(s)
      }
      var best = 0; var bestSim = Double.NegativeInfinity
      var c = 0
      while (c < centroids.length) {
        val ce = centroids(c)
        var dot = 0.0
        val n = math.min(x.numElements(), ce.length)
        var i = 0
        while (i < n) { dot += toDouble(x, i, t) * ce(i); i += 1 }
        val sim = if (nx == 0.0 || norms(c) == 0.0) 0.0 else dot / (nx * norms(c))
        if (sim > bestSim) { bestSim = sim; best = c }
        c += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](best, bestSim))
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroid =
      copy(child = c)
  }

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def nearestCentroid(emb: Column, centroids: Array[Array[Float]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(emb), centroids))

  def lshBucket(emb: Column, planes: Int, planeOffset: Int = 0,
                hashMode: String = "xx"): Column =
    ColumnBridge.column(LshBucket(ColumnBridge.expression(emb), planes, planeOffset, hashMode))
}
