package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  /** Gram-matrix aggregate over quantized (long) vectors: ONE buffer per
    * partition holding the full upper-triangle Σqᵢqⱼ plus the per-dim
    * sums Σqᵢ and the row count — everything the centering-free
    * covariance identity needs, in a single pass with no row expansion.
    *
    * The composable form (flatten/transform pair explode → groupBy(i,j))
    * computes the identical sums (differential spec) but materializes
    * d(d+1)/2 struct rows PER VECTOR before the aggregate swallows them
    * — a constant-factor-2080 row blowup at d=64 whose per-row iterator
    * overhead swamps the multiply-adds. This buffer does the d² loop in
    * one tight JIT pass per vector; partial aggregation ships one
    * O(d²)-long buffer per partition (the MinHashSketch shape).
    *
    * Buffer layout: [0, P) pair products row-major upper-tri, [P, P+d)
    * per-dim sums, [P+d] count, where P = d(d+1)/2. Sized lazily on the
    * first vector (d is data-defined); empty partitions merge as
    * identity. All-long arithmetic — exact and order-independent. The
    * accumulators are exact to ~9.2M rows of ±1e6-quantized components
    * (2⁶³ / 1e12); beyond that Math.addExact/multiplyExact throw
    * ArithmeticException rather than silently wrapping — callers at that
    * scale shard the aggregate (e.g. group by a hash bucket and combine
    * the per-bucket Grams in double precision, an error-free split since
    * each bucket's sums are exact).
    *
    * Output: array<struct<i,j,p,xi,xj,n>> (1-based dims), the same rows
    * the composable groupBy produced, so downstream cov math is shared.
    */
  case class GramMatrix(
      child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]]
      with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("j", LongType, nullable = false),
      StructField("p", LongType, nullable = false),
      StructField("xi", LongType, nullable = false),
      StructField("xj", LongType, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

    private def bufLen(d: Int): Int = d * (d + 1) / 2 + d + 1
    /** Inverse of bufLen: d(d+3)/2 + 1 = L → d. */
    private def dimOf(len: Int): Int = {
      val d = ((math.sqrt(9.0 + 8.0 * (len - 1)) - 3.0) / 2.0).round.toInt
      require(bufLen(d) == len, s"corrupt gram buffer length $len")
      d
    }

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v == null) return buf
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      val b = if (buf.isEmpty) new Array[Long](bufLen(d)) else buf
      require(b.length == bufLen(d),
        s"gram dim mismatch: buffer d=${dimOf(b.length)}, row d=$d")
      val q = new Array[Long](d)
      var i = 0
      while (i < d) { q(i) = arr.getLong(i); i += 1 }
      val base = d * (d + 1) / 2
      // addExact/multiplyExact (intrinsics — same cost as + / * on JVMs
      // that matter): past ~9.2M rows of ±1e6-quantized components the
      // plain sums would silently wrap and corrupt the covariance; the
      // exact ops make overflow fail LOUDLY instead, which at 100 TB is
      // the difference between a crashed job and a wrong model.
      var k = 0
      i = 0
      while (i < d) {
        val qi = q(i)
        var j = i
        while (j < d) {
          b(k) = Math.addExact(b(k), Math.multiplyExact(qi, q(j)))
          k += 1; j += 1
        }
        b(base + i) = Math.addExact(b(base + i), qi)
        i += 1
      }
      b(base + d) += 1L
      b
    }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      if (b1.isEmpty) return b2
      if (b2.isEmpty) return b1
      require(b1.length == b2.length, "gram dim mismatch in merge")
      var i = 0
      while (i < b1.length) { b1(i) = Math.addExact(b1(i), b2(i)); i += 1 }
      b1
    }
    override def eval(buf: Array[Long]): Any = {
      if (buf.isEmpty) return new GenericArrayData(Array.empty[Any])
      val d = dimOf(buf.length)
      val base = d * (d + 1) / 2
      val n = buf(base + d)
      val out = new Array[Any](base)
      var k = 0
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](i + 1L, j + 1L, buf(k), buf(base + i), buf(base + j), n))
          k += 1; j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
      buf.foreach(bb.putLong)
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong())
    }
    override def withNewMutableAggBufferOffset(o: Int): GramMatrix =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): GramMatrix =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): GramMatrix =
      copy(child = c)
  }

  /** LOSSLESS coarse-cell candidate filter for exact argmax-cosine seed
    * assignment (SemDeDup's two-level prune): given m coarse centers (any
    * quantizer — SemDedup trains them with [[IvfIndex]]'s Lloyd machinery
    * over the seed set) and per-cell cover radii r_j = max member angle
    * (sentinel r_j < 0 for a memberless cell), emit every cell that could
    * contain the globally-nearest seed.
    *
    * Math: argmax cosine ≡ argmin angle (acos is strictly decreasing), and
    * angular distance is a metric on the sphere. Both directions of the
    * triangle inequality are used, so centers need NOT be seeds:
    *  - upper bound: every member s of a nonempty cell j has θ(x,s) ≤
    *    θ(x,c_j) + r_j, so the best seed angle θ* ≤ U = min_j (θ_j + r_j);
    *  - lower bound: a seed s in cell j has θ(x,s) ≥ θ(x,c_j) − r_j, so a
    *    cell with θ_j − r_j > U + eps cannot hold the argmax (nor any
    *    exact tie) and is pruned.
    * `eps` (1e-6 rad) absorbs double/acos rounding — acos amplifies a
    * 1e-15 cosine error to ≤ ~5e-8 rad near ±1 — so fp noise can only
    * ENLARGE the candidate set, never drop the true argmax.
    *
    * Zero norms use the engine's pinned cosine-0 convention (θ = π/2):
    *  - zero-norm INPUT → every nonempty cell is a candidate (no pruning);
    *  - a zero-norm SEED forces its cell's radius ≥ π/2 (its convention
    *    angle to any center is π/2), keeping both bounds valid for it;
    *  - for a zero-norm CENTER the caller pins r_j = π (its angles are
    *    synthetic, not a metric): the cell is never pruned and its U
    *    contribution θ_j + π ≥ π is trivially a correct upper bound.
    *
    * On clusterable corpora (real embeddings) candidate sets are O(1)
    * cells; on pathological uniform high-dim data radii approach π/2 and
    * the filter degrades to all-cells — still EXACT, just un-pruned (no
    * exact method beats brute force on unclusterable data).
    */
  case class CandidateCells(child: Expression, centroids: Array[Array[Float]],
                            radii: Array[Double], eps: Double)
      extends UnaryExpression with CodegenFallback {
    require(centroids.length == radii.length,
      s"centroids (${centroids.length}) and radii (${radii.length}) must align")
    require(radii.exists(_ >= 0.0), "at least one cell must have members")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val norms: Array[Double] =
      centroids.map { ce =>
        var s = 0.0; var i = 0
        while (i < ce.length) { s += ce(i).toDouble * ce(i).toDouble; i += 1 }
        math.sqrt(s)
      }
    private def clampAcos(c: Double): Double =
      math.acos(math.max(-1.0, math.min(1.0, c)))
    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val t = elemType(child)
      val m = centroids.length
      val nonEmpty = (0 until m).filter(radii(_) >= 0.0)
      val nx = {
        var s = 0.0; var i = 0
        while (i < x.numElements()) { val xi = toDouble(x, i, t); s += xi * xi; i += 1 }
        math.sqrt(s)
      }
      if (nx == 0.0) // cosine pinned to 0 against everything: no bound holds
        return new GenericArrayData(nonEmpty.toArray)
      val theta = new Array[Double](m)
      var u = Double.PositiveInfinity
      var c = 0
      while (c < m) {
        if (radii(c) >= 0.0) {
          val ce = centroids(c)
          var dot = 0.0
          val n = math.min(x.numElements(), ce.length)
          var i = 0
          while (i < n) { dot += toDouble(x, i, t) * ce(i); i += 1 }
          val sim = if (norms(c) == 0.0) 0.0 else dot / (nx * norms(c))
          theta(c) = clampAcos(sim)
          if (theta(c) + radii(c) < u) u = theta(c) + radii(c)
        }
        c += 1
      }
      val out = new Array[Int](m)
      var k = 0
      c = 0
      while (c < m) {
        if (radii(c) >= 0.0 && theta(c) - radii(c) <= u + eps) { out(k) = c; k += 1 }
        c += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, k))
    }
    override protected def withNewChildInternal(c: Expression): CandidateCells =
      copy(child = c)
  }

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def candidateCells(emb: Column, centroids: Array[Array[Float]],
                     radii: Array[Double], eps: Double = 1e-6): Column =
    ColumnBridge.column(
      CandidateCells(ColumnBridge.expression(emb), centroids, radii, eps))

  def nearestCentroid(emb: Column, centroids: Array[Array[Float]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(emb), centroids))

  def lshBucket(emb: Column, planes: Int, planeOffset: Int = 0,
                hashMode: String = "xx"): Column =
    ColumnBridge.column(LshBucket(ColumnBridge.expression(emb), planes, planeOffset, hashMode))

  def gramMatrix(qv: Column): Column =
    ColumnBridge.column(
      GramMatrix(ColumnBridge.expression(qv)).toAggregateExpression())
}
