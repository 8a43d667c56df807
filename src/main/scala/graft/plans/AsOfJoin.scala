package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A genuine custom operator, end to end (SURVEY.md §4 "As-of join —
  * custom exec"): logical node → planner strategy → physical BinaryExecNode
  * running a single-pass partition-local merge. For each left row, the
  * right row with the greatest `rightTime <= leftTime` for the same key
  * (left outer semantics).
  *
  * Physical contract: both sides hash-cluster on the key (co-partitioned by
  * EnsureRequirements, exactly like a sort-merge join) and sort by
  * (key, time); the merge then needs O(1) state per partition — ONE
  * buffered right row — versus the window trick's full-timeline
  * materialization per user. Keys and times are LongType in v1.
  *
  * The oracle-checked registry op (`join_asof`) keeps the pure-DataFrame
  * window formulation; this exec is the performance path, asserted
  * result-identical in AsOfSpec.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  // right side is outer — its attributes become nullable
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lt = leftTime
    val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (leftIter, rightIter) =>
      val lkProj = UnsafeProjection.create(Seq(lk, lt), leftOut)
      val rkProj = UnsafeProjection.create(Seq(rk, rt), rightOut)
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow()
      // bind against the NULLABLE view of the right side — the original
      // right attributes may be non-nullable, which would codegen field
      // reads without null checks and turn the outer-join null row into 0s
      val outAttrs = leftOut ++ rightOut.map(_.withNullability(true))
      val out = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        private var rightHead: InternalRow = _
        private var rightHeadKey = 0L
        private var rightHeadTime = 0L
        private var matched: InternalRow = _ // last right row with key == current probe key
        private var matchedKey = 0L
        // NULL keys/times never match (DuckDB ASOF semantics): null-keyed
        // right rows are skipped, null-keyed left rows emit the outer null
        // row. Nulls sort first under the required ascending order, so
        // skipping them up front cannot skip past a live match.
        private def advanceRightHead(): Unit = {
          rightHead = null
          while (rightHead == null && rightIter.hasNext) {
            val candidate = rightIter.next()
            val kt = rkProj(candidate)
            if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
              rightHead = candidate
              rightHeadKey = kt.getLong(0)
              rightHeadTime = kt.getLong(1)
            }
          }
        }
        advanceRightHead()

        override def hasNext: Boolean = leftIter.hasNext
        override def next(): InternalRow = {
          val l = leftIter.next()
          val kt = lkProj(l)
          if (kt.isNullAt(0) || kt.isNullAt(1)) return out(joined(l, nullRight))
          val key = kt.getLong(0)
          val time = kt.getLong(1)
          // consume right rows up to (key, time); remember the last same-key one
          while (rightHead != null &&
            (rightHeadKey < key || (rightHeadKey == key && rightHeadTime <= time))) {
            if (rightHeadKey == key) {
              matched = rightHead.copy()
              matchedKey = key
            }
            advanceRightHead()
          }
          val r = if (matched != null && matchedKey == key) matched else nullRight
          out(joined(l, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the exec. Injected via
  * [[graft.GraftExtensions]] or `AsOfJoin.install`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** User-facing constructor: asof(left, right, keys/times) -> DataFrame. */
object AsOfJoin {

  def install(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      s.experimental.extraStrategies = s.experimental.extraStrategies :+ AsOfJoinStrategy
    }

  /** Left as-of join: for each left row, the latest right row with
    * rightTime <= leftTime on the same key. Key/time columns must be
    * bigint and are given by NAME (resolved against each side's analyzed
    * output). Column name collisions between sides are the caller's to
    * avoid (alias beforehand), as with any join.
    */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String): DataFrame = {
    val s = leftDf.sparkSession
    install(s)
    val lPlan = GraftSqlBridge.analyzed(leftDf)
    val rPlan = GraftSqlBridge.analyzed(rightDf)
    def resolve(plan: LogicalPlan, name: String): Expression = {
      val attr = plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${plan.output.map(_.name)}"))
      // The merge exec reads keys/times with getLong — enforce the documented
      // bigint contract instead of silently producing garbage matches.
      if (attr.dataType != org.apache.spark.sql.types.LongType)
        throw new IllegalArgumentException(
          s"as-of key/time column $name must be BIGINT, got ${attr.dataType.sql}")
      attr
    }
    GraftSqlBridge.ofRows(s, AsOfJoinPlan(lPlan, rPlan,
      resolve(lPlan, leftKey), resolve(rPlan, rightKey),
      resolve(lPlan, leftTime), resolve(rPlan, rightTime)))
  }
}
