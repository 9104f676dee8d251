package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Logical as-of join: for each left row, annotate it with the payload
  * of the most recent right row having `rightTime <= leftTime` within
  * the same join key (left-outer semantics — unmatched left rows carry
  * nulls). Spark has no ASOF JOIN node (reference semantics:
  * `MovieLensRecommender.py` has none either — this is mandate surface,
  * the point-in-time join every feature-store/training pipeline needs),
  * so this is the engine's one whole-operator extension: a custom
  * logical node planned by [[AsofJoinStrategy]] into [[AsofJoinExec]],
  * registered through the sanctioned seams
  * (`SparkSessionExtensions.injectPlannerStrategy` at session build /
  * `spark.experimental.extraStrategies` at runtime).
  *
  * Contract (enforced by the builder in
  * [[graft.operators.TimeJoin.asofJoinNative]]):
  *  - `leftKeys`/`rightKeys` are equal-arity, type-aligned key columns;
  *  - `leftTime`/`rightTime` share one orderable type;
  *  - `rightPayload` ⊆ right.output carries the annotation columns,
  *    re-emitted nullable (name collisions with left are the caller's
  *    to avoid, exactly as for the composed window form);
  *  - among right rows tied on (key, time), the greatest payload tuple
  *    wins — the same deterministic tie rule the composed q36 pins, so
  *    one DuckDB oracle replays both forms.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightPayload: Seq[Attribute],
    // false = backward (most recent right ≤ leftTime, greatest payload
    // on ties); true = forward (earliest right ≥ leftTime, smallest
    // payload on ties) — pandas merge_asof's `direction`
    forward: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] into [[AsofJoinExec]]. Everything else falls
  * through (`Nil`) to Spark's built-in strategies. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsofJoinPlan =>
      AsofJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.rightPayload, j.forward, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}
