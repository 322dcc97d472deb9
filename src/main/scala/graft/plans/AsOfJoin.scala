package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF JOIN — a whole-operator Catalyst extension (SURVEY §7.3 /
  * build-prompt option (c): LogicalPlan + Strategy + SparkPlan, registered
  * through SparkSessionExtensions).
  *
  * Semantics (matching DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.t >= r.t`): every left row joins the single right row sharing its key
  * with the greatest right-time ≤ left-time; unmatched left rows keep
  * nulls. Spark SQL has no native as-of join — composing it from window
  * functions requires a union + double sort; this operator is a single
  * co-partitioned merge.
  *
  * Scale design: both sides hash-cluster on the join key (one shuffle
  * each — same layout as a sort-merge join) and sort within partitions by
  * (key, time); the merge is a streaming two-pointer pass holding ONE
  * candidate row of state, O(n+m) per partition with no buffering of
  * either side. Null keys never match (SQL equality semantics); the merge
  * skips them explicitly since sort order would otherwise group them.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression] = Nil)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression] = Nil)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Right ordering includes the optional tiebreak columns: among right
    * rows sharing (key, time) the merge keeps the LAST consumed, i.e. the
    * tiebreak-maximum — making the matched row deterministic when the
    * time column alone is not unique (SURVEY §7.4.2 convention).
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    ((rightKeys :+ rightTime) ++ rightTiebreak).map(SortOrder(_, Ascending)))

  // the merge streams left rows through unchanged — expose the left
  // child's partitioning/ordering so downstream grouping on the same keys
  // skips a redundant exchange/sort
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        rightOutput.length)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      var candidate: InternalRow = null
      var candidateKey: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val keyHasNull = (0 until lKey.numFields).exists(lKey.isNullAt)
        if (keyHasNull) {
          joined(lRow, nullRight)
        } else {
          if (candidateKey != null && keyOrd.compare(candidateKey, lKey) != 0) {
            candidate = null; candidateKey = null
          }
          val lTimeRow = lTimeProj(lRow).copy()
          if (lTimeRow.isNullAt(0)) {
            // SQL ASOF semantics: NULL left time satisfies no `l.t >= r.t`
            // predicate — never matches (natural ordering would otherwise
            // pair NULL with NULL-time right rows).
            joined(lRow, nullRight)
          } else {
            var done = false
            while (!done && rBuf.hasNext) {
              val rKey = rKeyProj(rBuf.head)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) { rBuf.next() } // right side behind: discard
              else if (c == 0) {
                val rTimeRow = rTimeProj(rBuf.head)
                // NULL right time never matches; it sorts first within the
                // key group, so discard and keep scanning.
                if (rTimeRow.isNullAt(0)) { rBuf.next() }
                else if (timeOrd.compare(rTimeRow, lTimeRow) <= 0) {
                  candidate = rBuf.next().copy()
                  candidateKey = lKey.copy()
                } else done = true
              } else done = true
            }
            joined(lRow, if (candidate != null) candidate else nullRight)
          }
        }
      }.map(resultProj)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of join: when the right side is small (the
  * fact-to-dimension case — events against a slowly-changing dimension),
  * collect it into a per-key time-sorted index and broadcast; the left
  * side is probed with a binary search per row — NO shuffle or sort of
  * the (100 TB) left side at all.
  */
case class BroadcastAsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression] = Nil)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // left flows through untouched — no distribution/ordering requirements
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val rightOutput = right.output
    val rKeys = rightKeys
    val rTime = rightTime
    val rTie = rightTiebreak
    val lKeys = leftKeys
    val lTime = leftTime
    val leftOutput = left.output
    val outAttrs = output
    val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
    val tieOrd = RowOrdering.createNaturalAscendingOrdering(rTie.map(_.dataType))

    // driver-side index build: keyRow -> time-sorted (timeRow, row) array
    val rKeyProj = UnsafeProjection.create(rKeys, rightOutput)
    val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOutput)
    val rTieProj = UnsafeProjection.create(rTie, rightOutput)
    val index = new java.util.HashMap[InternalRow, Array[(InternalRow, InternalRow, InternalRow)]]()
    val grouped = right.executeCollect().toSeq
      .map(r => (rKeyProj(r).copy(), rTimeProj(r).copy(), rTieProj(r).copy(), r.copy()))
      // null keys never equality-match; null times never satisfy l.t >= r.t
      .filterNot { case (k, t, _, _) =>
        (0 until k.numFields).exists(k.isNullAt) || t.isNullAt(0) }
      .groupBy(_._1)
    grouped.foreach { case (k, rows) =>
      val sorted: Array[(InternalRow, InternalRow, InternalRow)] = rows
        .sortWith { (a, b) =>
          val c = timeOrd.compare(a._2, b._2)
          if (c != 0) c < 0 else tieOrd.compare(a._3, b._3) < 0
        }
        .map(t => (t._2: InternalRow, t._3: InternalRow, t._4: InternalRow))
        .toArray
      index.put(k, sorted)
    }
    val broadcastIndex = sparkContext.broadcast(index)

    val lTimeType = lTime.dataType
    left.execute().mapPartitions { lIter =>
      val idx = broadcastIndex.value
      // generated orderings are not serializable — build per partition
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeType))
      val lKeyProj = UnsafeProjection.create(lKeys, leftOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOutput)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        rightOutput.length)
      val joined = new JoinedRow
      lIter.map { lRow =>
        val arr = idx.get(lKeyProj(lRow))
        val matched =
          if (arr == null) nullRight
          else {
            val lt = lTimeProj(lRow)
            if (lt.isNullAt(0)) nullRight // NULL left time never matches
            else {
              // binary search: greatest position with time <= lt
              var lo = 0; var hi = arr.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (timeOrd.compare(arr(mid)._1, lt) <= 0) { ans = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              if (ans < 0) nullRight else arr(ans)._3
            }
          }
        resultProj(joined(lRow, matched))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy (injected via GraftExtensions): size-based choice
  * mirroring Spark's broadcast-join selection — a right side whose
  * estimated size fits the autoBroadcastJoinThreshold gets the broadcast
  * exec (no left shuffle); otherwise the co-partitioned merge.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      val threshold = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      if (threshold > 0 && r.stats.sizeInBytes <= threshold)
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
      else
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

/** User-facing API. */
object AsOf {
  /** As-of join `left` to `right` on equality keys + time: for each left
    * row, the latest right row with rightTime ≤ leftTime. Right columns
    * must not collide with left column names (alias beforehand — custom
    * logical nodes bypass the self-join dedup the analyzer applies to
    * `Join`).
    */
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String,
           rightTiebreak: Seq[String] = Nil): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in ${p.output.map(_.name).mkString(",")}"))
    val plan = AsOfJoinPlan(lp, rp,
      leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
      attr(lp, leftTime), attr(rp, rightTime),
      rightTiebreak.map(attr(rp, _)))
    org.apache.spark.sql.graftbridge.DatasetBridge.ofRows(left.sparkSession, plan)
  }
}
