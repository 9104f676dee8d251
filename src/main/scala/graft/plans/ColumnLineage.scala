package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** qbb: COLUMN-LEVEL LINEAGE from the Catalyst analyzed plan — the
  * impact-analysis primitive a governance layer needs ("which source
  * columns feed this report column?") extracted from the SAME plan
  * representation the optimizer consumes, not from parsing SQL text.
  * One bottom-up pass over the analyzed `LogicalPlan`: leaf relations
  * seed each output attribute with its (table, column) identity (table
  * = parquet path basename), every `Alias` anywhere above unions the
  * sources of the attributes it references, and attribute passthrough
  * (joins, filters, sorts, limits) is free because Catalyst preserves
  * `ExprId`s. This is VALUE lineage (what flows into the column), not
  * control lineage (filters/join keys that gate rows) — the standard
  * narrow definition.
  *
  * The graded query runs the extractor over q03 (lineitem ⋈ orders →
  * aggregate → top-k) and is checked against the pinned truth table:
  * the mapping is a property of the ENGINE's plan, so the oracle is a
  * VALUES literal — any Catalyst change that silently re-plumbed a
  * column would fail the hash.
  *
  * Scale note: the extractor walks the PLAN (dozens of nodes), not the
  * data — it costs microseconds regardless of corpus size; the graded
  * row set is |output columns| × |their sources|. */
object ColumnLineage {

  /** (output column, source table, source column) triples, one per
    * source column transitively feeding the output column. */
  def lineage(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val memo = scala.collection.mutable.Map[ExprId, Set[(String, String)]]()
    def walk(p: LogicalPlan): Unit = {
      p.children.foreach(walk)
      p match {
        case lr: LogicalRelation =>
          val table = lr.relation match {
            case fs: HadoopFsRelation =>
              fs.location.rootPaths.headOption
                .map(_.getName.stripSuffix(".parquet"))
                .getOrElse("unknown")
            case other => other.getClass.getSimpleName
          }
          lr.output.foreach(a => memo(a.exprId) = Set((table, a.name)))
        case leaf: LeafNode =>
          leaf.output.foreach(a =>
            memo.getOrElseUpdate(a.exprId, Set(("unknown", a.name))))
        case node =>
          node.expressions.foreach { e =>
            e.foreach {
              case al: Alias =>
                memo(al.exprId) = al.child
                  .collect { case a: Attribute => a }
                  .flatMap(a => memo.getOrElse(a.exprId, Set.empty))
                  .toSet
              case _ => ()
            }
          }
      }
    }
    walk(plan)
    plan.output.flatMap(a =>
      memo.getOrElse(a.exprId, Set(("unresolved", a.name))).toSeq
        .map { case (t, c) => (a.name, t, c) })
      .sortBy(identity)
  }

  /** qbb: the extractor over q03's plan, graded against pinned truth. */
  def q03Lineage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lineage(graft.operators.Relational.joinRevenueTopK(spark, dir))
      .toDF("out_col", "src_table", "src_col")
      .orderBy("out_col", "src_table", "src_col")
  }

  /** Pinned truth for q03's dataflow: the group keys pass through from
    * orders; revenue folds two lineitem columns. A Catalyst change
    * that re-plumbed any column fails this hash. */
  def q03LineageOracle: String = """
    SELECT * FROM (VALUES
      ('o_orderkey', 'orders', 'o_orderkey'),
      ('o_orderpriority', 'orders', 'o_orderpriority'),
      ('revenue', 'lineitem', 'l_discount'),
      ('revenue', 'lineitem', 'l_extendedprice'))
      AS t(out_col, src_table, src_col)
    ORDER BY out_col, src_table, src_col"""
}
