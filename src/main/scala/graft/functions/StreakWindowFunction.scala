package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{
  AggregateWindowFunction, Ascending, AttributeReference, CurrentRow,
  Expression, If, Literal, RowFrame, SortOrder, SpecifiedWindowFrame,
  UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Custom WINDOW FUNCTION — the fourth and last custom-expression kind
  * (scalar: CosineSimilarity; aggregate: SseAggregator; generator:
  * ShingleGenerator): a running-streak counter implemented exactly the
  * way Spark builds `row_number`/`rank` internally — an
  * [[AggregateWindowFunction]] whose per-row update is a DECLARATIVE
  * expression (`if (flag) streak + 1 else 0`) over a running row
  * frame, so WindowExec folds it into its single ordered pass and the
  * update itself is codegen'd like any Catalyst expression.
  *
  * Why it exists: "length of the current run of rows satisfying P" is
  * non-associative (a reset-to-zero fold), so built-ins need the
  * gaps-and-islands composition — two CHAINED Window operators (reset
  * position, then the subtraction that consumes it), which share the
  * sort but each buffer and walk every partition. The custom function
  * is ONE Window operator — one buffered pass per partition instead
  * of two at 100 TB, and no intermediate rn/last_reset columns
  * widening the shuffle rows.
  * ExtensionsSpec proves result ≡ the two-window composition AND
  * counts the physical Window operators (1 vs 2); qce grades it
  * against the DuckDB gaps-and-islands replay. */
case class RunningStreak(flag: Expression) extends AggregateWindowFunction {

  private lazy val streak =
    AttributeReference("streak", LongType, nullable = false)()

  override def children: Seq[Expression] = Seq(flag)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(streak)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))
  override lazy val updateExpressions: Seq[Expression] =
    Seq(If(flag, org.apache.spark.sql.catalyst.expressions.Add(
      streak, Literal(1L)), Literal(0L)))
  override lazy val evaluateExpression: Expression = streak

  override def prettyName: String = "running_streak"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RunningStreak =
    copy(flag = newChildren(0))
}

object RunningStreak {
  /** Column-world entry point. The classic `.over(windowSpec)` sugar
    * only recognizes Spark's own function registry, so the
    * WindowExpression is assembled directly in Catalyst terms —
    * partition keys, ascending order keys, and the running row frame
    * every AggregateWindowFunction runs on. */
  def runningStreak(flag: Column, partitionBy: Seq[Column],
      orderBy: Seq[Column]): Column =
    ColumnBridge.column(WindowExpression(
      RunningStreak(ColumnBridge.expression(flag)),
      WindowSpecDefinition(
        partitionBy.map(ColumnBridge.expression),
        orderBy.map(c => SortOrder(ColumnBridge.expression(c), Ascending)),
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))))
}
