package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Bridge

/** Native as-of join: the extension ladder's tier (c) — a custom
  * `LogicalPlan` + `SparkStrategy` + physical `SparkPlan` — for the one
  * operator where composing built-ins provably leaves work on the
  * table. Spark itself has a LOGICAL `AsOfJoin` node (pandas
  * `merge_asof`) but no physical operator: `RewriteAsOfJoin` lowers it
  * to groupBy(keys) + sort-within + window-scan, and graft's own
  * [[graft.operators.AsofJoin]] uses the union+window form. Both are
  * O(n+m) per key, but both pay for it in materialized state: the
  * union widens every row to |left|+|right| columns (left payload rides
  * through the shuffle null-padded with right payload and vice versa)
  * and the running `last(_, ignoreNulls)` window holds a frame buffer
  * per partition.
  *
  * This operator instead declares what a distributed as-of REALLY
  * needs — `ClusteredDistribution` on the key for BOTH children,
  * per-partition order (key, ts) / (key, ts, tieBreak) — and lets
  * `EnsureRequirements` plan the exchanges and sorts (so AQE still
  * coalesces both sides consistently, a custom exec inherits that for
  * free). `doExecute` is then a zero-state streaming merge: one
  * forward pass over each side per partition, ONE buffered right row
  * (the current best match, copied), each side shuffled at its own
  * natural width. Semantics match [[graft.operators.AsofJoin.asof]]
  * exactly: latest right row with `r.ts <= l.ts` per key, ties broken
  * by the LAST right row in ascending `tieBreak` order (DuckDB
  * `ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts` convention).
  *
  * NULL semantics (SQL, pinned in AsofNativeSpec): a NULL key or NULL
  * timestamp on either side never matches — the equi-join and `<=`
  * comparison both reject NULLs. Left rows with NULLs still appear,
  * null-padded. [[graft.operators.AsofJoin.asof]] implements the same
  * contract (it drops null-key/null-ts RIGHT rows before its union),
  * so the two forms are interchangeable per workload.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression]) extends BinaryNode {

  // left row always emitted (LEFT as-of join); right side null-padded
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one-to-one lowering of [[AsofJoinNode]]. Injected
  * by [[graft.GraftExtensions]] and self-registered by
  * [[AsofJoinNative.asof]] via `spark.experimental.extraStrategies`.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, tb) =>
      AsofJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of key types differ: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // the whole distributed contract lives in these two declarations:
  // EnsureRequirements inserts compatible hash exchanges + sorts, AQE
  // coalesces the two shuffles as one group (non-union binary node)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreak)).map(SortOrder(_, Ascending)))

  // left rows stream through in their sorted order, so both survive
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "left rows with a match"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(output, output)
      val nullRight = new GenericInternalRow(right.output.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // lookahead right row not yet consumed (sort output buffers are
        // reused, so anything held across next() calls is copied)
        private var rRow: InternalRow = _
        // best match so far and the key it belongs to
        private var matched: InternalRow = _
        private var matchedKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          val lValid = !lKey.anyNull && !lTime.isNullAt(0)
          var done = !lValid // null key/time never equi-matches
          while (!done) {
            if (rRow == null) {
              if (rIter.hasNext) rRow = rIter.next()
              else done = true
            }
            if (!done) {
              val rKey = rKeyProj(rRow)
              if (rKey.anyNull || rTimeProj(rRow).isNullAt(0)) {
                rRow = null // NULL key/time right rows match nothing
              } else {
                val c = keyOrd.compare(rKey, lKey)
                if (c > 0) done = true // right is ahead; stop
                else if (c < 0) rRow = null // right is behind; skip
                else if (timeOrd.compare(rTimeProj(rRow), lTime) <= 0) {
                  // candidate: later candidates (greater ts, then
                  // greater tie-break) overwrite — last one wins
                  matched = rRow.copy()
                  matchedKey = lKey.copy()
                  rRow = null
                } else done = true // right row is in l's future; hold it
              }
            }
          }
          val hit = lValid && matched != null &&
            keyOrd.compare(matchedKey, lKey) == 0
          numOutputRows += 1
          if (hit) { numMatched += 1; resultProj(joined(l, matched)) }
          else resultProj(joined(l, nullRight))
        }
      }
    }
  }
}

/** DataFrame-level wrapper with the same signature and semantics as
  * [[graft.operators.AsofJoin.asof]] (spec-pinned row-identical), so
  * callers can switch forms per workload: union+window when the sides
  * are near-equal width and a second sort hurts, native when payloads
  * are wide or the window buffer is the bottleneck.
  */
object AsofJoinNative {

  /** Registers [[AsofJoinStrategy]] in the session (idempotent, public
    * `experimental.extraStrategies` API — works in sessions launched
    * without `spark.sql.extensions=graft.GraftExtensions`). */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cur = s.experimental.extraStrategies
    if (!cur.contains(AsofJoinStrategy))
      s.experimental.extraStrategies = cur :+ AsofJoinStrategy
  }

  /** @param rightPayload right columns carried to the match (renamed as
    *                     given; names must not collide with left's).
    * @param tieBreak     deterministic order among right rows sharing a
    *                     timestamp — the LAST one in this order wins.
    *                     NOTE: the order is the STRING order of the
    *                     space-joined casts, byte-compatible with
    *                     [[graft.operators.AsofJoin.asof]]'s `_tie`
    *                     window key, so the two forms stay row-identical
    *                     even on tied timestamps (AsofNativeSpec pins
    *                     parity on a tie-heavy workload).
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Map[String, String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val payload = rightPayload.toSeq
    require(payload.map(_._2).forall(d => !left.columns.contains(d)),
      "payload destination names must not collide with left columns")
    // re-alias every right column: fresh ExprIds, so the (common)
    // self-as-of — left and right filtered off the SAME scan — cannot
    // produce ambiguous attributes in the node's expressions
    val tieCols =
      if (tieBreak.isEmpty) Nil
      else Seq(org.apache.spark.sql.functions
        .concat_ws(" ", tieBreak.map(c0 => col(c0).cast("string")): _*)
        .as("__tb"))
    val rSel = right.select(
      keys.map(k => col(k).as(s"__rk_$k")) ++
        Seq(col(rightTs).as("__rts")) ++ tieCols ++
        payload.map { case (src, dst) => col(src).as(dst) }: _*)
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(rSel)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"as-of: no column '$name' in ${plan.output.map(_.name)}"))
    val node = AsofJoinNode(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, s"__rk_$k")),
      attr(lPlan, leftTs), attr(rPlan, "__rts"),
      if (tieBreak.isEmpty) Nil else Seq(attr(rPlan, "__tb")))
    Bridge.ofRows(spark, node)
      .drop(keys.map(k => s"__rk_$k") ++ Seq("__rts") ++
        (if (tieBreak.isEmpty) Nil else Seq("__tb")): _*)
  }
}
