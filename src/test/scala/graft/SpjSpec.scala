package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Storage-partitioned join (qdz/qe0): co-sharded txn tables join and
  * aggregate with ZERO shuffle exchanges, differently-sharded tables
  * fall back to a correct shuffle, and the results stay exact. */
class SpjSpec extends SparkSpec {

  private def withSpj[T](f: => T): T = {
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
    val old = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f
    finally old.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  /** Executes and counts shuffle exchanges BELOW the join — the final
    * single-row global aggregate always folds through one tiny
    * SinglePartition exchange; what SPJ eliminates is the two
    * key-shuffles feeding the join. */
  private def joinShuffles(df: DataFrame): Int = {
    df.collect()
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    val joins = strip(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty, "query planned no join")
    joins.map(_.collect {
      case s: ShuffleExchangeLike => s
      case q: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => q
    }.size).sum
  }

  private def mkTable(name: String, valExpr: String, shards: Int,
      div: Long): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graft.$name")
    spark.sql(s"""
      CREATE TABLE graft.$name (k BIGINT, v BIGINT) USING graft_txn
      TBLPROPERTIES ('key'='k','shards'='$shards','layout_div'='$div')""")
    spark.sql(s"INSERT INTO graft.$name SELECT id, $valExpr FROM range(1000)")
  }

  test("co-sharded join runs with zero shuffles and exact results") {
    graft.sources.GraftTxnCatalog.register(spark)
    mkTable("spj_a", "id * 2", 8, 1000L)
    mkTable("spj_b", "id * 3", 8, 1000L)
    withSpj {
      val q = spark.sql("""
        SELECT count(1) AS n, sum(a.v * b.v) AS s
        FROM graft.spj_a a JOIN graft.spj_b b ON a.k = b.k""")
      val n = joinShuffles(q)
      val row = q.collect()(0)
      assert(row.getLong(0) == 1000L)
      // sum of 6k^2 for k in 0..999
      assert(row.getLong(1) == (0L until 1000L).map(k => 6L * k * k).sum)
      assert(n == 0, s"expected zero shuffles:\n${q.queryExecution.executedPlan}")
    }
  }

  test("differently-sharded tables fall back to a shuffled join") {
    graft.sources.GraftTxnCatalog.register(spark)
    mkTable("spj_c", "id * 2", 8, 1000L)
    mkTable("spj_d", "id * 3", 8, 500L) // same shards, different divisor
    withSpj {
      val q = spark.sql("""
        SELECT count(1) AS n FROM graft.spj_c c JOIN graft.spj_d d ON c.k = d.k""")
      val n = joinShuffles(q)
      assert(q.collect()(0).getLong(0) == 1000L)
      assert(n > 0, "incompatible layouts must shuffle, not claim co-partitioning")
    }
  }

  test("group-by on the key aggregates with zero shuffles") {
    graft.sources.GraftTxnCatalog.register(spark)
    mkTable("spj_e", "id % 7", 8, 1000L)
    withSpj {
      val q = spark.sql(
        "SELECT k, sum(v) AS s FROM graft.spj_e GROUP BY k ORDER BY k LIMIT 5")
      // the ORDER BY/LIMIT may shuffle; count only exchanges BELOW the agg
      val agg = {
        q.collect()
        def strip(p: SparkPlan): SparkPlan = p match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case other                    => other
        }
        strip(q.queryExecution.executedPlan).collect {
          case h: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => h
        }
      }
      assert(agg.nonEmpty)
      // head = TOP-most grouped aggregate: the classic plan's exchange
      // sits between final and partial, inside the final's subtree
      val below = agg.head.collect { case s: ShuffleExchangeLike => s }.size
      assert(below == 0,
        s"group-by on the key must not shuffle:\n${q.queryExecution.executedPlan}")
    }
  }
}
