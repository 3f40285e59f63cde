package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.functions.col

/** The as-of join as a FIRST-CLASS PHYSICAL OPERATOR — the custom-
  * operator preference order's last rung (LogicalPlan + Strategy +
  * SparkPlan, registered via `SparkSessionExtensions` /
  * `experimental.extraStrategies`), implemented for the one temporal
  * operator the engine uses everywhere ([[graft.operators.AsOfJoin]]
  * is the composed union+window form; q44/q111 ride it).
  *
  * Execution shape: EnsureRequirements gives both children a
  * ClusteredDistribution on the key and a (key, time) sort — the
  * same single shuffle the union+window form pays — and the operator
  * itself is then a ZERO-BUFFER partition-local merge: one pass over
  * each side, one retained right row per key (the current as-of
  * candidate), no window buffer at all. That is the scale story at
  * 100 TB: memory per task is O(1) beyond the sort, versus the
  * window form's carry-forward over the unioned frame.
  *
  * Semantics match [[graft.operators.AsOfJoin.asof]] and DuckDB ASOF:
  * for each left row, the LAST right row of the same key with
  * `rightTime <= leftTime` (ties at equal time include the row;
  * among duplicate right (key, time) rows the last in sort order
  * wins — pre-aggregate the right side to unique (key, time) for
  * full determinism). Left rows with a null key or time, and right
  * rows likewise, join nothing / are skipped.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKey, p.rightKey, p.leftTime, p.rightTime,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "rows with an as-of match"))

  protected override def doExecute(): RDD[InternalRow] = {
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      // merge state: one buffered unconsumed right row, one retained
      // candidate (copied — input rows are reused buffers)
      var pending: InternalRow = null
      var candidate: InternalRow = null
      var candidateKey: Any = null
      lIter.map { lrow =>
        val lkv = lk.eval(lrow)
        val ltv = lt.eval(lrow)
        if (lkv == null || ltv == null) {
          outRows += 1
          proj(joined(lrow, nullRight))
        } else {
          if (candidate != null && keyOrd.compare(candidateKey, lkv) != 0) {
            candidate = null; candidateKey = null
          }
          var advance = true
          while (advance) {
            if (pending == null && rIter.hasNext) pending = rIter.next()
            if (pending == null) advance = false
            else {
              val rkv = rk.eval(pending)
              if (rkv == null) pending = null // nulls sort first: skip
              else {
                val c = keyOrd.compare(rkv, lkv)
                if (c < 0) pending = null // right key behind: drop
                else if (c > 0) advance = false // right ahead: stop
                else {
                  val rtv = rt.eval(pending)
                  if (rtv == null) pending = null
                  else if (timeOrd.compare(rtv, ltv) <= 0) {
                    candidate = pending.copy(); candidateKey = lkv
                    pending = null // later same-key rows may still match
                  } else advance = false // future right row: stop
                }
              }
            }
          }
          outRows += 1
          if (candidate != null) matched += 1
          proj(joined(lrow,
            if (candidate != null) candidate else nullRight))
        }
      }
    }
  }
}

object AsOfJoinPhysical {

  /** As-of join `left` to `right` through [[AsOfJoinExec]]. Right
    * columns must be pre-renamed to avoid collisions (the output is
    * left ++ right). The right side is re-aliased internally so a
    * self-sourced right (same table as left) gets fresh expression
    * ids. */
  def asofExec(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    GraftSqlShim.addStrategy(spark, AsOfJoinStrategy)
    val r2 = right.select(right.columns.toSeq.map(c => col(c).as(c)): _*)
    val lp = left.queryExecution.analyzed
    val rp = r2.queryExecution.analyzed
    val clash = lp.output.map(_.name).intersect(rp.output.map(_.name))
    require(clash.isEmpty,
      s"asofExec: rename right columns, names collide: ${clash.mkString(", ")}")
    def a(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asofExec: no column '$n'"))
    GraftSqlShim.ofRows(spark, AsOfJoinPlan(lp, rp,
      a(lp, leftKey), a(rp, rightKey), a(lp, leftTime), a(rp, rightTime)))
  }
}
