package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator row from SURVEY §2, expressed
  * Spark-first, with a DuckDB oracle in `oracleSql`. Determinism conventions
  * (SURVEY §5.2): every query ends in a total ORDER BY; double aggregates go
  * through exact decimal accumulation (`Summaries.exactSum`) so the result is
  * independent of partition/aggregation order; column names are aliased
  * identically on both sides.
  */
object SparkEntry {
  import Tables.t

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---- shared helpers -----------------------------------------------------

  private def exactSum(c: Column, scale: Int = 2) = Summaries.exactSum(c, scale)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §7.2 minimum slice — P7 date filter + A1/A4 multi-agg + O1 sort
    // (reference flagship computation re-shaped onto lineitem, TPC-H-Q1-like)
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("cnt"),
          exactSum(col("l_quantity")).as("sum_qty"),
          exactSum(col("l_extendedprice")).as("sum_base_price"),
          exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
          Summaries.exactAvg(col("l_discount"), 6).as("avg_disc"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // D1 — dedup keep-most-recent (reference app.py:233-242) via
    // Window/row_number with explicit tie-break (SURVEY §7.5)
    "q02_dedup_keep_latest" -> ((s, d) => {
      Dedup
        .keepLatest(
          t(s, d, "lineitem"),
          keys = Seq("l_orderkey", "l_partkey", "l_suppkey"),
          recency = Seq("l_shipdate"),
          tieBreak = Seq(col("l_linenumber")))
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_partkey", "l_suppkey")
    }),

    // D2 — all-columns distinct (reference app.py:242)
    "q03_distinct" -> ((s, d) => {
      Dedup
        .distinctRows(t(s, d, "orders").select("o_orderstatus", "o_orderpriority"))
        .orderBy("o_orderstatus", "o_orderpriority")
    }),

    // A1 — group-by count, NULL group kept (reference app.py:245-261)
    "q04_group_count" -> ((s, d) => Summaries.groupCount(t(s, d, "events"), "event_type")),

    // P8/F7 — multi-column case-insensitive keyword mask (app.py:263-270)
    "q05_keyword_filter" -> ((s, d) => {
      val e = t(s, d, "events")
      e.filter(Clean.keywordAny(Seq(col("event_type"), col("props")), Clean.FailurePattern))
        .select("event_id", "event_type", "user_id")
        .orderBy("event_id")
    }),

    // U1 — unionByName with missing columns null-filled (app.py:325 concat)
    "q06_union_by_name" -> ((s, d) => {
      val li  = t(s, d, "lineitem")
      val cut = lit("1997-01-01").cast("timestamp")
      val a = li.filter(col("l_shipdate") < cut).select("l_orderkey", "l_linenumber", "l_quantity")
      val b = li.filter(col("l_shipdate") >= cut).select("l_orderkey", "l_linenumber", "l_extendedprice")
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
      // the ORDER BY must cover every column to be total; Spark's asc is
      // nulls-first, matching the oracle's explicit NULLS FIRST.
      Ingest.unionAllByName(Seq(a, b))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    }),

    // J1 — inner equi-join fact⋈fact with aggregation
    "q07_join_inner" -> ((s, d) => {
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"), "inner")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("cnt"),
          exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    // J2 — left outer join keeping unmatched
    "q08_join_left" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"), exactSum(col("o_totalprice")).as("total_spent"))
        .orderBy(col("c_custkey"))
    }),

    // J3 — left semi (EXISTS)
    "q09_join_semi" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J3 — left anti (NOT EXISTS)
    "q10_join_anti" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J4 — broadcast dim chain (region=5, nation=25 rows: never shuffle them)
    "q11_join_broadcast" -> ((s, d) => {
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), exactSum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name"))
    }),

    // J5 — theta (non-equi) join: equi on brand + range on size
    "q12_join_theta" -> ((s, d) => {
      val a = t(s, d, "part").select(col("p_brand"), col("p_size").as("size_a"))
      val b = t(s, d, "part").select(col("p_brand").as("brand_b"), col("p_size").as("size_b"))
      a.join(b, col("p_brand") === col("brand_b") && col("size_a") < col("size_b"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("p_brand"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
         CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_discount AS DECIMAL(27,6))) AS DOUBLE) / count(l_discount) AS avg_disc
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q02_dedup_keep_latest" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_shipdate
         FROM lineitem
         QUALIFY row_number() OVER (PARTITION BY l_orderkey, l_partkey, l_suppkey
                                    ORDER BY l_shipdate DESC, l_linenumber) = 1
         ORDER BY l_orderkey, l_partkey, l_suppkey""",
    "q03_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
         ORDER BY o_orderstatus, o_orderpriority""",
    "q04_group_count" ->
      """SELECT event_type, count(*) AS qtd FROM events
         GROUP BY event_type ORDER BY qtd DESC, event_type ASC NULLS FIRST""",
    "q05_keyword_filter" ->
      """SELECT event_id, event_type, user_id FROM events
         WHERE COALESCE(regexp_matches(lower(CAST(event_type AS VARCHAR)), 'fail|timed out|faulty|lost|error'), false)
            OR COALESCE(regexp_matches(lower(CAST(props AS VARCHAR)), 'fail|timed out|faulty|lost|error'), false)
         ORDER BY event_id""",
    "q06_union_by_name" ->
      """SELECT * FROM (
           SELECT l_orderkey, l_linenumber, l_quantity, CAST(NULL AS DOUBLE) AS l_extendedprice
           FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
           UNION ALL
           SELECT l_orderkey, l_linenumber, CAST(NULL AS DOUBLE), l_extendedprice
           FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01')
         ORDER BY l_orderkey, l_linenumber,
                  l_quantity NULLS FIRST, l_extendedprice NULLS FIRST""",
    "q07_join_inner" ->
      """SELECT o_orderpriority, count(*) AS cnt,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q08_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q09_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q10_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q11_join_broadcast" ->
      """SELECT r_name, count(*) AS n_customers,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS sum_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q12_join_theta" ->
      """SELECT a.p_brand, count(*) AS n_pairs
         FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_size < b.p_size
         GROUP BY a.p_brand ORDER BY a.p_brand""",
  )
}
