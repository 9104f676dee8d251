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
    * RelationalSpec holds the negative control: the un-guarded ANSI
    * expression throws on the same rows.
    *
    * The probe set is a deterministic 1/8 sample (l_orderkey % 8 = 0):
    * three of the four hazards fire on EVERY probed row, and a caught
    * `try_*` failure costs a full JVM exception construct-and-unwind
    * (~8 µs with Spark's deep evaluator stacks — measured here: the
    * unsampled query spent 16.6 s at sf0.1, ~95% of it exception
    * machinery). Semantically the sample grades the identical hazard
    * classes; running the hazards over all rows measured the JVM, not
    * the engine. At 100 TB the same doctrine applies in reverse to
    * users: `try_*` over a column that fails on most rows is an
    * anti-pattern — guard with a predicate, keep try_* for the rare
    * tail. */
  def ansiTry(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .where(col("l_orderkey") % 8 === 0)
      .select(
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
      FROM lineitem WHERE l_orderkey % 8 = 0),
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

  /** qc7: CORRELATED LATERAL JOINS — the SQL shape analysts reach for
    * when "per row of the outer table, run this subquery" is the
    * natural phrasing: top-2 orders per sampled customer (a LATERAL
    * with ORDER BY + LIMIT) joined with a per-customer LATERAL
    * aggregate. What the query certifies is the PLANNER, not the
    * syntax: Catalyst decorrelates both shapes — the LIMIT lateral
    * becomes `WindowGroupLimit` + `row_number` over a single orders
    * scan (the same physical plan as the hand-written q11 per-group
    * top-k, asserted in RelationalSpec), and the aggregate lateral
    * becomes an outer-joined pre-aggregation with the classic
    * COUNT-bug compensation (`if (isnull(alwaysTrue)) 0 else n`) —
    * so neither lateral executes per-outer-row. A naive engine runs
    * the subquery N times; at 100 TB decorrelation is the difference
    * between one shuffle and a million scans. Customers with no
    * orders would drop via the inner lateral (this synthetic fixture
    * gives every customer orders, so the graded set is exactly the
    * sampled customers — RelationalSpec pins that equality). */
  def lateralTopk(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_lt")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_lt")
    spark.sql(
      """SELECT c.c_custkey, t.o_orderkey,
        |       CAST(round(t.o_totalprice * 100) AS BIGINT) AS price_cents,
        |       a.n_orders,
        |       CAST(round(a.max_price * 100) AS BIGINT) AS max_cents
        |FROM customer_lt c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders_lt o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |JOIN LATERAL (
        |  SELECT count(1) AS n_orders, max(o_totalprice) AS max_price
        |  FROM orders_lt o WHERE o.o_custkey = c.c_custkey) a
        |WHERE c.c_custkey % 20 = 0
        |ORDER BY c.c_custkey, price_cents DESC, o_orderkey""".stripMargin)
  }

  /** DuckDB replays the same LATERAL statement (comma-lateral form). */
  val lateralTopkOracle: String = """
    SELECT c.c_custkey, t.o_orderkey,
           CAST(round(t.o_totalprice * 100) AS BIGINT) AS price_cents,
           CAST(a.n_orders AS BIGINT) AS n_orders,
           CAST(round(a.max_price * 100) AS BIGINT) AS max_cents
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t,
    LATERAL (
      SELECT count(1) AS n_orders, max(o_totalprice) AS max_price
      FROM orders o WHERE o.o_custkey = c.c_custkey) a
    WHERE c.c_custkey % 20 = 0
    ORDER BY c.c_custkey, price_cents DESC, o_orderkey"""

  /** qc8: SQL PIPE SYNTAX (SPARK-49555, Spark 4) — the `|>` operator
    * chain that reads top-to-bottom the way dataflow actually runs:
    * FROM → JOIN → WHERE → AGGREGATE → post-agg WHERE (= HAVING) →
    * EXTEND (derived column) → SELECT → ORDER BY. The surface claim
    * is that pipes are PARSE-TIME sugar over the same Catalyst plan:
    * the segment filter still reaches the parquet scan as a pushed
    * filter and the aggregate still splits partial/final (both
    * asserted in RelationalSpec), and the oracle replays the
    * equivalent nested-SQL statement. Pipes matter for the 100 TB
    * user because pipelines written incrementally stay reviewable —
    * each `|>` stage is independently runnable — without trading any
    * plan quality for it. */
  def pipeSyntax(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_ps")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_ps")
    spark.sql(
      """FROM orders_ps
        ||> JOIN customer_ps c ON o_custkey = c.c_custkey
        ||> WHERE c.c_mktsegment = 'BUILDING'
        ||> AGGREGATE count(1) AS n,
        |     sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |     GROUP BY o_orderpriority
        ||> WHERE n >= 5
        ||> EXTEND cents DIV n AS avg_cents
        ||> SELECT o_orderpriority AS prio, n, cents, avg_cents
        ||> ORDER BY prio""".stripMargin)
  }

  /** The pipe chain rewritten as the equivalent nested statement. */
  val pipeSyntaxOracle: String = """
    SELECT o_orderpriority AS prio,
           CAST(count(1) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             // count(1) AS BIGINT) AS avg_cents
    FROM orders JOIN customer c ON o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o_orderpriority
    HAVING count(1) >= 5
    ORDER BY prio"""

  /** qc9: COLLATED GROUPING (SPARK-46830, Spark 4) — grouping and
    * equality under a named collation instead of binary bytes:
    * deterministic mixed-case variants of the document source key
    * (upper / Initcap / raw by doc_id mod 3) collapse into ONE group
    * under `UTF8_LCASE` while binary grouping sees three. Graded per
    * collated group: the folded key, row count, the number of
    * distinct RAW spellings merged (binary count-distinct inside a
    * collated group — the two collation strengths composing in one
    * aggregate), and a mass checksum. The oracle replays with
    * lower()-keyed grouping, exact on this ASCII corpus. Plan note,
    * measured here: collated keys hash-partition fine but fall back
    * to SortAggregate (no hash-agg over collation-aware comparators
    * yet, SPARK-49611 lineage) — one extra sort per side vs binary
    * keys, the honest current cost of collated grouping at scale;
    * RelationalSpec pins the merge semantics instead of the physical
    * operator so a future hash-capable Spark stays green. */
  def collatedGrouping(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir).createOrReplaceTempView("docs_cg")
    spark.sql(
      """SELECT min(lower(key_raw)) AS key,
        |       count(1) AS n_docs,
        |       count(DISTINCT key_raw) AS n_variants,
        |       sum(n_chars) AS chars_sum
        |FROM (
        |  SELECT CASE
        |           WHEN doc_id % 3 = 0 THEN upper(source)
        |           WHEN doc_id % 3 = 1
        |             THEN concat(upper(substring(source, 1, 1)),
        |                         substring(source, 2))
        |           ELSE source END AS key_raw,
        |         n_chars
        |  FROM docs_cg)
        |GROUP BY collate(key_raw, 'UTF8_LCASE')
        |ORDER BY key""".stripMargin)
  }

  /** lower()-keyed replay — identical folding on an ASCII corpus. */
  val collatedGroupingOracle: String = """
    WITH d AS (
      SELECT CASE
               WHEN doc_id % 3 = 0 THEN upper(source)
               WHEN doc_id % 3 = 1
                 THEN concat(upper(substring(source, 1, 1)),
                             substring(source, 2))
               ELSE source END AS key_raw,
             n_chars
      FROM documents)
    SELECT lower(key_raw) AS key,
           CAST(count(1) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT key_raw) AS BIGINT) AS n_variants,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum
    FROM d GROUP BY lower(key_raw) ORDER BY key"""

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
