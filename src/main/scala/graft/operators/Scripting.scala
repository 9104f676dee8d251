package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** qbi: SQL SCRIPTING — Spark 4's procedural SQL surface
  * (BEGIN…END, DECLARE, WHILE, SET with scalar subqueries), the entry
  * point for users who write stored-procedure-style logic instead of
  * DataFrame code. The script is a data-driven convergence loop: walk
  * a price threshold upward in 10k steps until the rows above it fall
  * under 5% of the table — the "find the operating point" procedure
  * every alerting/tiering pipeline has, written exactly as a DBA
  * would.
  *
  * Execution shape: loop state is three driver-side scalars; every
  * iteration is ONE distributed scan (the scalar subquery), so a
  * 100 TB run costs iterations × one aggregate scan — the honest cost
  * of an irreducible convergence loop. When the loop body is
  * grid-enumerable (this one is), production should prefer the
  * closed form the ORACLE uses — one grid×table aggregation instead
  * of k scans — which is precisely what equality against the oracle
  * certifies: the procedural script and the set-based rewrite agree. */
object Scripting {

  def sqlScript(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem")
    val enabled = spark.conf.get("spark.sql.scripting.enabled", "true")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try spark.sql(
      """BEGIN
        |  DECLARE k BIGINT = 0;
        |  DECLARE n_above BIGINT = 0;
        |  DECLARE n_total BIGINT = 0;
        |  DECLARE iters BIGINT = 0;
        |  SET n_total = (SELECT count(1) FROM lineitem);
        |  SET n_above = n_total;
        |  WHILE n_above * 20 >= n_total DO
        |    SET k = k + 10000;
        |    SET n_above = (SELECT count(1) FROM lineitem
        |                   WHERE l_extendedprice > k);
        |    SET iters = iters + 1;
        |  END WHILE;
        |  SELECT k AS threshold, n_above, n_total, iters;
        |END""".stripMargin)
    finally spark.conf.set("spark.sql.scripting.enabled", enabled)
  }

  /** Closed-form replay of [[sqlScript]]'s loop: the smallest grid
    * threshold whose tail falls under 5%, from ONE grid×table
    * aggregation. `iters` = threshold/10000 because the script walks
    * the grid from 0 in single steps. */
  val sqlScriptOracle: String = """
    WITH t AS (SELECT CAST(count(1) AS BIGINT) AS n_total FROM lineitem),
    g AS (SELECT (range + 1) * 10000 AS k FROM range(0, 100)),
    c AS (
      SELECT g.k,
             CAST(sum(CASE WHEN l.l_extendedprice > g.k THEN 1 ELSE 0 END)
               AS BIGINT) AS n_above
      FROM g CROSS JOIN lineitem l GROUP BY g.k),
    hit AS (
      SELECT c.k, c.n_above, t.n_total
      FROM c CROSS JOIN t
      WHERE c.n_above * 20 < t.n_total
      ORDER BY c.k LIMIT 1)
    SELECT CAST(k AS BIGINT) AS threshold, n_above, n_total,
           CAST(k // 10000 AS BIGINT) AS iters
    FROM hit"""

  /** qbo: PARAMETERIZED SQL + IDENTIFIER — the injection-safe template
    * surface (SPARK-44140/44180): VALUES bind through named parameter
    * markers (`:minp`), and table/column NAMES bind through
    * `IDENTIFIER(:param)` — the only safe way to template "group this
    * metric by a caller-chosen column over a caller-chosen table",
    * which every multi-tenant reporting layer does. String-splicing
    * either one is the classic SQL-injection hole; this query binds
    * BOTH kinds and the oracle replays the fully-resolved statement.
    * The plan is identical to the literal query — parameters resolve
    * at analysis time, so pushdown/pruning are unaffected. */
  def paramIdentifier(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_pq")
    spark.sql(
      """SELECT IDENTIFIER(:grp) AS grp_val,
        |       count(1) AS n,
        |       sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |         AS total_cents
        |FROM IDENTIFIER(:tbl)
        |WHERE o_totalprice > :minp
        |GROUP BY IDENTIFIER(:grp)
        |ORDER BY grp_val""".stripMargin,
      Map("grp" -> "o_orderpriority", "tbl" -> "orders_pq",
        "minp" -> 100000))
  }

  /** The resolved statement, replayed literally. */
  val paramIdentifierOracle: String = """
    SELECT o_orderpriority AS grp_val,
           CAST(count(1) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    WHERE o_totalprice > 100000
    GROUP BY o_orderpriority
    ORDER BY grp_val"""

  /** qbt: SQL-DEFINED FUNCTIONS (SPARK-46246, Spark 4) — reusable
    * logic declared in PURE SQL, no JVM code: a scalar function
    * (`doc_density`, an e6 chars-per-token score) and a TABLE function
    * (`src_docs(s)`, a parameterized view over documents). These are
    * the engine's answer to "let analysts package logic without
    * shipping jars": the bodies INLINE into the calling plan at
    * analysis time (they are Catalyst expressions/subqueries, not
    * black-box UDFs), so codegen, pushdown, and pruning all still
    * apply — which the oracle certifies by replaying the INLINED
    * statement. Graded: per-source doc counts, the summed scalar-UDF
    * score, and a table-UDF scalar subquery riding every row. */
  def sqlUdf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("n_toks",
        size(split(col("text"), " ")).cast("long"))
    docs.createOrReplaceTempView("docs_su")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION doc_density(nc BIGINT, nt BIGINT)
        |RETURNS BIGINT RETURN nc * 1000000 div greatest(nt, 1)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION src_docs(s STRING)
        |RETURNS TABLE(doc_id BIGINT, n_chars BIGINT)
        |RETURN SELECT doc_id, n_chars FROM docs_su WHERE source = s""".stripMargin)
    spark.sql(
      """SELECT source,
        |       count(1) AS n_docs,
        |       sum(doc_density(n_chars, n_toks)) AS density_sum_e6,
        |       (SELECT count(1) FROM src_docs('src3')) AS tvf_n_src3
        |FROM docs_su
        |GROUP BY source
        |ORDER BY source""".stripMargin)
  }

  /** qbv: ANSI TRY-FAMILY — Spark 4 runs ANSI mode by default, where
    * division by zero, integral overflow, bad casts, and out-of-bounds
    * array access THROW (the silent-null data corruption of legacy
    * mode is gone). The `try_*` functions are the per-expression
    * escape hatch: same semantics, but a failing row yields NULL
    * instead of killing the job — the right tool when a feed is known
    * dirty in one column and quarantining beats failing. Each hazard
    * class here is PLANTED with exact arithmetic (÷0 at linenumber=3,
    * Long.MaxValue overflow except when quantity rounds to 0 — never
    * on this fixture — a non-numeric cast on the returnflag
    * letter, index-7 access on a 6-element array), so the graded
    * null/ok counts are pure modular arithmetic the oracle replays.
    * SourcesSpec holds the negative control: the un-guarded ANSI
    * expression throws on the same rows. */
  def ansiTry(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_linenumber").cast("long").as("ln"),
      col("l_quantity").cast("long").as("qty"),
      col("l_returnflag").as("prio"))
    li.select(
        expr("try_divide(qty, ln - 3)").as("div0"),
        expr("try_add(9223372036854775807L, qty)").as("ovf"),
        expr("try_cast(prio AS INT)").as("badcast"),
        expr("try_element_at(sequence(1L, 6L), 7)").as("oob"))
      .select(explode(array(
        struct(lit("div0").as("hazard"), col("div0").isNull.as("is_null")),
        struct(lit("overflow").as("hazard"), col("ovf").isNull.as("is_null")),
        struct(lit("badcast").as("hazard"), col("badcast").isNull.as("is_null")),
        struct(lit("oob_index").as("hazard"), col("oob").isNull.as("is_null"))))
        .as("h"))
      .groupBy(col("h.hazard").as("hazard"))
      .agg(sum(when(col("h.is_null"), 1L).otherwise(0L)).as("n_null"),
        sum(when(!col("h.is_null"), 1L).otherwise(0L)).as("n_ok"))
      .orderBy("hazard")
  }

  /** Planted-arithmetic replay of [[ansiTry]]. */
  val ansiTryOracle: String = """
    WITH li AS (
      SELECT l_linenumber AS ln, CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem),
    h AS (
      SELECT 'div0' AS hazard, ln = 3 AS is_null FROM li
      UNION ALL
      SELECT 'overflow', qty > 0 FROM li
      UNION ALL
      SELECT 'badcast', true FROM li
      UNION ALL
      SELECT 'oob_index', true FROM li)
    SELECT hazard,
           CAST(sum(CASE WHEN is_null THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(sum(CASE WHEN is_null THEN 0 ELSE 1 END) AS BIGINT)
             AS n_ok
    FROM h GROUP BY hazard ORDER BY hazard"""

  /** [[sqlUdf]] with both function bodies inlined — what the analyzer
    * produces; equality proves the SQL-UDF layer is sugar, not
    * semantics. */
  val sqlUdfOracle: String = """
    WITH d AS (
      SELECT source, n_chars, len(string_split(text, ' ')) AS n_toks
      FROM documents)
    SELECT source,
           CAST(count(1) AS BIGINT) AS n_docs,
           CAST(sum(n_chars * 1000000 // greatest(n_toks, 1)) AS BIGINT)
             AS density_sum_e6,
           (SELECT CAST(count(1) AS BIGINT) FROM documents
            WHERE source = 'src3') AS tvf_n_src3
    FROM d GROUP BY source ORDER BY source"""
}
