package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** The WHOLE-OPERATOR extension tier: a custom logical plan + planner
  * strategy + physical operator for the backward as-of join, registered
  * through the public extension points (`SparkSessionExtensions
  * .injectPlannerStrategy` / `spark.experimental.extraStrategies`).
  *
  * Same semantics as the composed union+window encoding
  * ([[graft.operators.AsOfJoin]], which stays the default): for each left
  * row, the single right row with the greatest right ts ≤ the left ts in
  * the same key group, left-outer, inclusive ties. The physical shape is
  * what a time-series engine runs natively: both sides hash-clustered by
  * key (ONE exchange each — `requiredChildDistribution`), sorted by
  * (key, ts) in-partition (`requiredChildOrdering`), then a linear
  * two-pointer merge per partition holding ONE candidate right row —
  * never the |L|×|R| inequality-join blowup, no union row inflation, no
  * window-frame machinery. At 100 TB the cost is the same two keyed
  * exchanges as the composed form; the merge replaces the window pass.
  *
  * Contract (same as the composed form): right side deduped to one row
  * per (key, ts); null keys/timestamps are out of scope (right rows with
  * nulls are discarded, left rows with nulls match nothing).
  */
object AsOfJoinNative {

  /** Backward as-of join via the native operator. Output: all left
    * columns (original names) then all right columns as `prev_<col>`. */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val spark = left.sparkSession
    // planner strategy, idempotently, through the PUBLIC extension point
    // for already-built sessions (GraftExtensions covers build-time)
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    // fresh exprIds on the right via aliases: left and right commonly
    // derive from the same scan (purchases vs clicks), and a custom node
    // gets none of the analyzer's self-join dedupRight treatment
    val r2 = right.select(right.columns.map(c => col(c).as(s"__asof_$c")).toSeq: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"as-of column not found: $n"))
    val rightOut = right.columns.toSeq.map { c =>
      val a = attr(rPlan, s"__asof_$c")
      AttributeReference(s"prev_$c", a.dataType, nullable = true)()
    }
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, ts),
      attr(rPlan, s"__asof_$key"), attr(rPlan, s"__asof_$ts"), rightOut)
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
  }
}

/** Logical node: pure structure — the planner strategy below maps it 1:1
  * to [[AsOfJoinExec]]. `references` covers BOTH children's full output
  * (every left column passes through, every right column is payload), so
  * column pruning cannot strip what the ordinal-bound merge reads. */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightOut: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ rightOut

  override def references: AttributeSet =
    AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy ([[SparkStrategy]]): plans [[AsOfJoinNode]], declines
  * everything else. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, rk, rts, rightOut) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, rightOut) :: Nil
    case _ => Nil
  }
}

/** Physical operator: requires both children clustered by key (the
  * planner inserts one exchange per side, co-partitioned — the
  * sort-merge-join distribution contract) and sorted by (key, ts); then
  * executes a per-partition two-pointer merge that carries exactly one
  * candidate right row. */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    rightOut: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightOut

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lKeyIdx >= 0 && lTsIdx >= 0 && rKeyIdx >= 0 && rTsIdx >= 0,
      "as-of key/ts attributes must resolve against the children")
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val outTypes = (left.output ++ rightOut).map(_.dataType).toArray
    val rightArity = right.output.size
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      // `pending` = next unconsumed right row; `candidate` = copy of the
      // latest right row whose (key, ts) ≤ the current left position
      var pending: InternalRow = null
      var candidate: InternalRow = null
      var candidateKey: Any = null
      li.map { lrow =>
        val lKey = if (lrow.isNullAt(lKeyIdx)) null else lrow.get(lKeyIdx, keyType)
        val lTs = if (lrow.isNullAt(lTsIdx)) null else lrow.get(lTsIdx, tsType)
        if (lKey != null && lTs != null) {
          var advancing = true
          while (advancing) {
            if (pending == null && ri.hasNext) pending = ri.next()
            if (pending == null) advancing = false
            else {
              val rKey = if (pending.isNullAt(rKeyIdx)) null
                else pending.get(rKeyIdx, keyType)
              val rTs = if (pending.isNullAt(rTsIdx)) null
                else pending.get(rTsIdx, tsType)
              if (rKey == null || rTs == null) pending = null // out of scope
              else {
                val c = keyOrd.compare(rKey, lKey)
                if (c < 0) pending = null // key fully passed; discard
                else if (c == 0 && tsOrd.compare(rTs, lTs) <= 0) {
                  candidate = pending.copy()
                  candidateKey = rKey
                  pending = null
                } else advancing = false // right is ahead; stop
              }
            }
          }
        }
        val m =
          if (lKey != null && candidate != null &&
            keyOrd.compare(candidateKey, lKey) == 0) candidate
          else nullRight
        proj(joined(lrow, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
