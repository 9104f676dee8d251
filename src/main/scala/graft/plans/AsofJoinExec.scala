package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical as-of join: one pass over two co-partitioned,
  * (key, time)-sorted children.
  *
  * Plan shape (inserted automatically by `EnsureRequirements` from the
  * declared requirements below — the operator itself never shuffles):
  *
  *   Exchange hashpartitioning(keys)     Exchange hashpartitioning(keys)
  *   Sort (keys, time)                   Sort (keys, time, payload…)
  *              └────────── AsofJoinExec (streaming merge) ──┘
  *
  * Per partition it advances the right iterator exactly once past each
  * right row (classic sorted-merge): a right row is *consumed* when its
  * (key, time) sorts ≤ the current left row's (key, time); the last
  * consumed row's key+payload are held, and each left row emits the
  * held payload iff the held key equals its own (else nulls — left
  * outer). Requiring the right sort to extend through the payload
  * columns makes the exact-timestamp tie deterministic: consume-last ≡
  * greatest payload tuple, the same rule the composed window form and
  * the DuckDB oracle use.
  *
  * 100 TB math vs the composed union+window form (`TimeJoin.asofJoin`):
  * both shuffle n_l + n_r rows once on the key, but the union form
  * carries every payload column on every LEFT row through the shuffle
  * as a null placeholder, sorts the union as ONE buffer inside
  * WindowExec, and evaluates a `last(_, ignoreNulls)` frame per payload
  * column; this operator shuffles each side with only its own columns,
  * sorts the two (smaller) sides independently, and merges in O(n_l +
  * n_r) with one held row of state — no window buffer, no tag column,
  * no post-filter. The trade: it sits outside whole-stage codegen (a
  * custom exec has no `doGenCode`), which is the standard cost of a
  * foreign operator and is bounded to this one stage boundary.
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightPayload: Seq[Attribute],
    // forward = match the EARLIEST right row with (key, time) ≥ the
    // left row's, holding the lookahead instead of consuming it; the
    // shared ascending (key, time, payload) right sort makes the
    // forward tie rule "smallest payload tuple" (first ≥) exactly as
    // it makes the backward rule "greatest" (last ≤) — one sort
    // requirement serves both directions
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  // co-partition both sides on the join key; EnsureRequirements inserts
  // the exchanges (or reuses an existing compatible partitioning)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // left sorted by (key, time); right additionally by payload so that
  // consume-last resolves exact-time ties to the greatest payload tuple
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightPayload)).map(SortOrder(_, Ascending)))

  // the merge is 1:1 with left rows in left order — both properties
  // survive, so a downstream groupBy(key) or window over (key, time)
  // re-neither shuffles nor re-sorts
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes  = leftKeys.map(_.dataType)
    val sortTypes = keyTypes :+ leftTime.dataType
    val leftOut   = left.output
    val rightOut  = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lT = leftTime; val rT = rightTime
    val payload = rightPayload
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lSortProj   = UnsafeProjection.create(lKeys :+ lT, leftOut)
      val rSortProj   = UnsafeProjection.create(rKeys :+ rT, rightOut)
      val lKeyProj    = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj    = UnsafeProjection.create(rKeys, rightOut)
      val payloadProj = UnsafeProjection.create(payload, rightOut)
      // bind the result against NULLABLE payload attrs: unmatched left
      // rows see the all-null row, and a non-nullable binding would
      // read a primitive 0 instead of null
      val resultProj  = UnsafeProjection.create(
        outAttrs, leftOut ++ payload.map(_.withNullability(true)))
      // natural orderings over the projected (key, time) / (key) rows —
      // both sides project to the same types, so one ordering serves both
      val sortOrd = RowOrdering.createNaturalAscendingOrdering(sortTypes)
      val keyOrd  = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullPayload = new GenericInternalRow(payload.size)
      val joined = new JoinedRow
      // one right row of lookahead + one held (key, payload) of state —
      // the operator's whole memory footprint, independent of skew
      var rHead: InternalRow = null
      var rHeadSort: UnsafeRow = null
      var heldKey: UnsafeRow = null
      var heldPayload: UnsafeRow = null

      if (forward) {
        // forward merge: discard right rows STRICTLY before the left
        // row, then the lookahead itself is the candidate match (not
        // consumed — the same right row can serve later left rows).
        // Discards are safe: left is iterated in the same (key, time)
        // order, so a right row below the current left row is below
        // every later one too.
        lIter.map { l =>
          val lSort = lSortProj(l)
          var scanning = true
          while (scanning) {
            if (rHead == null && rIter.hasNext) {
              rHead = rIter.next()
              // projection buffers are reused; the lookahead must own its bytes
              rHeadSort = rSortProj(rHead).copy()
            }
            if (rHead != null && sortOrd.compare(rHeadSort, lSort) < 0) {
              rHead = null
            } else scanning = false
          }
          numOutputRows += 1
          if (rHead != null && keyOrd.compare(rKeyProj(rHead), lKeyProj(l)) == 0)
            resultProj(joined(l, payloadProj(rHead)))
          else
            resultProj(joined(l, nullPayload))
        }
      } else lIter.map { l =>
        val lSort = lSortProj(l)
        var scanning = true
        while (scanning) {
          if (rHead == null && rIter.hasNext) {
            rHead = rIter.next()
            // projection buffers are reused; the lookahead must own its bytes
            rHeadSort = rSortProj(rHead).copy()
          }
          if (rHead != null && sortOrd.compare(rHeadSort, lSort) <= 0) {
            heldKey = rKeyProj(rHead).copy()
            heldPayload = payloadProj(rHead).copy()
            rHead = null
          } else scanning = false
        }
        numOutputRows += 1
        if (heldKey != null && keyOrd.compare(heldKey, lKeyProj(l)) == 0)
          resultProj(joined(l, heldPayload))
        else
          resultProj(joined(l, nullPayload))
      }
    }
  }
}
