package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's canonical query set (SURVEY.md §2.b / §2.c), re-targeted
  * onto the driver's TPC-H-ish testdata. Each query exists in two first-class
  * forms: a DataFrame chain (`run`) and ANSI SQL for the DuckDB oracle
  * (`oracle`) — mirroring the reference's notebook, where the SQL text is the
  * whole query IR (ipynb cell 1, `execute_db_query`).
  *
  * Determinism rules (SURVEY.md §5.1): every query carries a total ORDER BY
  * over its output keys, and every floating-point aggregate goes through
  * [[Reference.msum]] — fixed-point integer summation — so Spark's and
  * DuckDB's different reduction orders cannot produce different doubles.
  * Per-row `+ - * /` needs no such care: IEEE-754 ops on identical inputs are
  * bit-identical in both engines.
  *
  * Scale notes (100 TB posture): all queries are declarative single-pass
  * scans + hash aggregates; Catalyst pushes filters/projections into the
  * Parquet scan, aggregation is partial (map-side) + final, top-k compiles to
  * TakeOrderedAndProject (no global sort), and the dimension joins broadcast.
  */
object Reference {

  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The `events.ts` physical shape has varied across testdata generations:
    * TIMESTAMP(NANOS) parquet (unreadable as a Spark timestamp — SURVEY.md
    * §7 risk 2; sessions set `spark.sql.legacy.parquet.nanosAsLong=true` and
    * the column arrives as Long nanos) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (arrives as TIMESTAMP_NTZ under Spark's default
    * NTZ inference). This loader normalizes every shape to a proper
    * TimestampType column: ns→µs truncation uses integer `div`, not `/` (a
    * double round-trip would lose precision above 2^53), and the NTZ cast is
    * value-preserving because every session here pins
    * `spark.sql.session.timeZone=UTC`.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    // scan-parallelism repair: the single-row-group events file caps the
    // scan at one task, and every consumer does per-row work (ts
    // normalization, json props parsing, window prep) before its first
    // exchange — measured 1.5-2x on the funnel/retention/graph queries at
    // sf0.1, no consumer regressed. No-op on well-split inputs.
    graft.ops.Layout.repairScanParallelism(
      normalizeTs(s.read.parquet(s"$dir/events.parquet")))

  /** Shape-adaptive ts normalization shared by the batch and streaming
    * event loaders — see [[events]] for the inventory of source shapes.
    */
  def normalizeTs(raw: DataFrame, tsCol: String = "ts"): DataFrame =
    raw.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn(tsCol,
          col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }

  /** Fixed-point sum of a double column that carries at most 4 decimal
    * digits: scale to integer units, sum exactly as Long, scale back. The
    * result is bit-identical regardless of reduction order or engine —
    * a Long sum is associative, and Long→Double is exact below 2^53.
    * At 100 TB this also beats Kahan-style compensation: it is a plain
    * codegen'd integer sum with map-side partial aggregation.
    */
  private val Scale = 10000.0
  def msum(e: Column): Column =
    sum(round(e * Scale, 0).cast("long")).cast("double") / Scale
  /** DuckDB-side text of [[msum]] — keep in lockstep. */
  def msumSql(e: String): String =
    s"CAST(SUM(CAST(round(($e) * 10000) AS BIGINT)) AS DOUBLE) / 10000"

  /** Single-scan row doubling — simulates the reference's 2×-load artifact
    * (SURVEY §6) without scanning the source twice: a 2-element generator
    * multiplies cardinality in the same pass (`UNION ALL self` reads the
    * parquet twice). The generator can't be pruned away: it changes row
    * count, so Catalyst must keep it even with the output column dropped.
    */
  def doubled(df: DataFrame): DataFrame = {
    require(!df.columns.contains("__copy"),
      "doubled() would clobber an existing __copy column")
    df.withColumn("__copy", explode(array(lit(1), lit(2)))).drop("__copy")
  }

  /** Deterministic mean built on the same fixed-point sum. */
  def mavg(e: Column): Column =
    sum(round(e * Scale, 0).cast("long")).cast("double") / Scale / count(lit(1))
  def mavgSql(e: String): String =
    s"${msumSql(e)} / COUNT(*)"

  // ---------------------------------------------------------------- Q1: scan + LIMIT
  // Reference: `select * from renewable_power_plants_de limit 20` (ipynb cell 3).
  // LIMIT without ORDER BY is nondeterministic on a distributed scan, so the
  // re-target pins a total order over the primary key.
  private val q01 = Q(
    "q01_limit",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))
        // (l_orderkey, l_linenumber) is NOT unique in the testdata — the
        // order must be total over every output column or tie order (and
        // the LIMIT boundary) depends on scan partitioning
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))
        .limit(20),
    Some(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  l_returnflag LIMIT 20""".stripMargin))

  // ---------------------------------------------------------------- Q2: COUNT(*)
  // Reference: get_table_shape rows_query (ipynb cell 1).
  private val q02 = Q(
    "q02_count",
    (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("n_rows")),
    Some("SELECT COUNT(*) AS n_rows FROM lineitem"))

  // ----------------------------------------- Q3/Q4: projection + scalar arithmetic
  // Reference: per-source capacity sums with date filter + ORDER BY (ipynb
  // cells 5/7): scalar +/*, aliases, `where day >= date('1990-01-01')`.
  // Raw double arithmetic on purpose — identical bits in Spark and DuckDB.
  private val q03 = Q(
    "q03_project_arith",
    (s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("charged"))
        // total order over ALL output columns — (l_orderkey, l_linenumber)
        // ties exist in the testdata (q01's note)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ship_day"),
          col("net_price"), col("charged")),
    Some(
      """SELECT l_orderkey, l_linenumber,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
        |  l_extendedprice * (1 - l_discount) AS net_price,
        |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber, ship_day, net_price, charged""".stripMargin))

  // -------------------------------------------------- Q5/Q6: DISTINCT projection
  // Reference: the capacity timeseries was double-loaded; `select distinct …`
  // is load-bearing (ipynb cell 11: 22,588 → 11,294 rows). The re-target
  // reproduces the duplication artifact with UNION ALL of the table with
  // itself, then dedups.
  private val q05 = Q(
    "q05_distinct",
    (s, dir) =>
      doubled(t(s, dir, "lineitem"))
        .where(col("l_shipdate") >= lit("1999-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_returnflag"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
        .distinct()
        .orderBy(col("l_orderkey"), col("l_returnflag"), col("ship_day")),
    Some(
      """SELECT DISTINCT l_orderkey, l_returnflag, strftime(l_shipdate, '%Y-%m-%d') AS ship_day
        |FROM (SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem)
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01'
        |ORDER BY l_orderkey, l_returnflag, ship_day""".stripMargin))

  // ------------------------------------------- Q7: GROUP BY + SUM + ORDER BY
  // Reference headline chart: `select technology, sum(electrical_capacity) …
  // group by technology order by 2 desc` (ipynb cell 21). Re-target is the
  // TPC-H Q1 shape: pricing summary by (returnflag, linestatus).
  private val q07 = Q(
    "q07_groupsum",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          msum(col("l_quantity")).as("sum_qty"),
          msum(col("l_extendedprice")).as("sum_base_price"),
          msum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          msum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${msumSql("l_quantity")} AS sum_qty,
         |  ${msumSql("l_extendedprice")} AS sum_base_price,
         |  ${msumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  ${msumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  // ---------------------------------------------------------- Q8: GROUP BY + AVG
  // Reference: avg(electrical_capacity) by technology (ipynb cell 23).
  private val q08 = Q(
    "q08_groupavg",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          mavg(col("l_quantity")).as("avg_qty"),
          mavg(col("l_extendedprice")).as("avg_price"),
          mavg(col("l_discount")).as("avg_disc"))
        .orderBy(col("l_returnflag")),
    Some(
      s"""SELECT l_returnflag,
         |  ${mavgSql("l_quantity")} AS avg_qty,
         |  ${mavgSql("l_extendedprice")} AS avg_price,
         |  ${mavgSql("l_discount")} AS avg_disc
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // ------------------------------------------ Q9: top-k (ORDER BY agg DESC LIMIT)
  // Reference: top-10 federal states by capacity (ipynb cell 25, `order by 2
  // desc limit 10`). Ties are broken by key so the top-k set is deterministic.
  // Catalyst compiles this to TakeOrderedAndProject — per-partition heaps, no
  // global sort, which is what you want at 1000 executors.
  private val q09 = Q(
    "q09_topk",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(msum(col("o_totalprice")).as("total_spent"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("total_spent").desc, col("o_custkey"))
        .limit(10),
    Some(
      s"""SELECT o_custkey, ${msumSql("o_totalprice")} AS total_spent, COUNT(*) AS n_orders
         |FROM orders GROUP BY o_custkey
         |ORDER BY total_spent DESC, o_custkey LIMIT 10""".stripMargin))

  // --------------------------- Q10: IN-subquery (semi-join) + IS NOT NULL + trim()
  // Reference: `where federal_state in (select federal_state from …) and lon
  // is not null … group by trim(nuts_1_region)` (ipynb cells 28/34/39). The
  // IN-subquery is a left-semi join in Catalyst; the DataFrame form states it
  // directly. The filtered `orders` side is small relative to lineitem, and
  // Spark broadcasts it under AQE when it fits.
  private val q10 = Q(
    "q10_semijoin",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").where(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      li.where(col("l_shipdate").isNotNull)
        .join(o, li("l_orderkey") === o("o_orderkey"), "left_semi")
        .groupBy(trim(col("l_returnflag")).as("flag"))
        .agg(msum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("flag"))
    },
    Some(
      s"""SELECT trim(l_returnflag) AS flag,
         |  ${msumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate IS NOT NULL
         |  AND l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
         |GROUP BY trim(l_returnflag)
         |ORDER BY flag""".stripMargin))

  // ------------------------------------- Q12: left equi-join chain (pandas P1/P2)
  // Reference: df_region.merge(nuts_names, left_on=…, right_on=…, how='left')
  // (ipynb cells 31/36/41) — left join on differing key names, then the inner
  // index join onto the map frame. Re-target: orders ←left— customer ←left—
  // nation, aggregated per nation. Both dimension tables are tiny → broadcast.
  private val q12 = Q(
    "q12_leftjoin",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          msum(col("o_totalprice")).as("total_price"))
        .orderBy(col("n_name").asc_nulls_first)
    },
    Some(
      s"""SELECT n_name, COUNT(*) AS n_orders, ${msumSql("o_totalprice")} AS total_price
         |FROM orders
         |LEFT JOIN customer ON o_custkey = c_custkey
         |LEFT JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name
         |ORDER BY n_name NULLS FIRST""".stripMargin))

  // ------------------------------------------------- Q13: full-row dropDuplicates
  // Reference: pandas drop_duplicates on the doubled geo frame (ipynb cells
  // 36/41). Same duplication artifact as Q5, full-row this time.
  private val q13 = Q(
    "q13_dedup",
    (s, dir) =>
      doubled(t(s, dir, "customer")).dropDuplicates().orderBy(col("c_custkey")),
    Some(
      """SELECT DISTINCT * FROM (SELECT * FROM customer UNION ALL SELECT * FROM customer)
        |ORDER BY c_custkey""".stripMargin))

  // ----------------------------------------------------------- Q14: min/max aggs
  // Reference: min/max for the choropleth color scale (ipynb cells 32/42).
  // min/max of doubles are exact (no summation) — no fixed-point needed.
  private val q14 = Q(
    "q14_minmax",
    (s, dir) =>
      t(s, dir, "lineitem").agg(
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("first_ship"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("last_ship"),
        countDistinct(col("l_orderkey")).as("n_orders")),
    Some(
      """SELECT min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
        |  strftime(min(l_shipdate), '%Y-%m-%d') AS first_ship,
        |  strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin))

  // ------------------------------------- Q15: daily series (forecast input, F1)
  // Reference: `select distinct day, … sum as y … where day >= 1980` feeds
  // Prophet (ipynb cell 13). Re-target: events.value aggregated per day —
  // the exact frame graft.forecast.TrendSeasonForecaster consumes. `ts` is
  // cast to DATE because the raw column is ns-precision (Spark truncates to
  // µs; comparing at day granularity sidesteps the mismatch — SURVEY §7 risk 2).
  private val q15 = Q(
    "q15_daily_series",
    (s, dir) =>
      events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("ds"))
        .agg(msum(col("value")).as("y"), count(lit(1)).as("n_events"))
        .orderBy(col("ds")),
    Some(
      s"""SELECT strftime(ts, '%Y-%m-%d') AS ds, ${msumSql("value")} AS y, COUNT(*) AS n_events
         |FROM events GROUP BY strftime(ts, '%Y-%m-%d') ORDER BY ds""".stripMargin))

  // ----------------------------------------------- Q16: window functions
  // Beyond the reference surface (SURVEY.md §2.e declares window/analytic
  // functions absent there) — included for engine completeness. Running
  // sums accumulate in fixed-point integer units: engines disagree on
  // windowed double summation internals (incremental vs segment-tree), and
  // integer sums are associative under both.
  private val q16 = Q(
    "q16_window",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("long").as("rn"),
          (sum(round(col("o_totalprice") * Scale, 0).cast("long"))
            .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
            .cast("double") / Scale).as("running_spend"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some(
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  CAST(SUM(CAST(round(o_totalprice * 10000) AS BIGINT)) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 10000
        |    AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin))

  // ----------------------------------------------- Q17: ROLLUP grouping sets
  // Also beyond the reference surface (declared absent) — subtotal + grand
  // total rows; NULL ordering pinned explicitly (Spark defaults NULLS FIRST
  // ascending, DuckDB NULLS LAST).
  private val q17 = Q(
    "q17_rollup",
    (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(msum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${msumSql("l_quantity")} AS sum_qty, COUNT(*) AS n_rows
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin))

  // ------------------------------------------- Q18: set operators INTERSECT/EXCEPT
  // Also beyond the reference surface (declared absent): customers active in
  // both 1995 and 1996 vs only 1995, tagged and unioned.
  private val q18 = Q(
    "q18_setops",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def active(year: Int) = o
        .where(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
          col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      val both = active(1995).intersect(active(1996)).select(lit("both").as("tag"), col("o_custkey"))
      val only95 = active(1995).except(active(1996)).select(lit("only_1995").as("tag"), col("o_custkey"))
      both.unionAll(only95).orderBy(col("tag"), col("o_custkey"))
    },
    Some(
      """SELECT 'both' AS tag, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
        |UNION ALL
        |SELECT 'only_1995' AS tag, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
        |ORDER BY tag, o_custkey""".stripMargin))

  // ------------------------------------------------------- Q19: PIVOT (wide)
  // The reference's capacity timeseries IS a pivoted wide table (one column
  // per country×source — SURVEY §1.1); this query produces that shape from
  // the long form: revenue per linestatus pivoted across returnflags.
  // Oracle uses conditional aggregation (identical semantics; DuckDB's
  // PIVOT statement can't be embedded in a plain SELECT).
  private val q19 = Q(
    "q19_pivot",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(msum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .select(col("l_linestatus"), col("A").as("rev_a"), col("N").as("rev_n"),
          col("R").as("rev_r"))
        .orderBy(col("l_linestatus")),
    Some(
      s"""SELECT l_linestatus,
         |  ${msumSql("CASE WHEN l_returnflag = 'A' THEN l_extendedprice * (1 - l_discount) END")} AS rev_a,
         |  ${msumSql("CASE WHEN l_returnflag = 'N' THEN l_extendedprice * (1 - l_discount) END")} AS rev_n,
         |  ${msumSql("CASE WHEN l_returnflag = 'R' THEN l_extendedprice * (1 - l_discount) END")} AS rev_r
         |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin))

  // ---------------------------------------------------- Q20: UNPIVOT (melt)
  // The inverse direction: the wide pricing summary melted back to
  // (key, metric, value) long form — Spark's native unpivot operator;
  // oracle as the equivalent UNION ALL.
  private val q20 = Q(
    "q20_unpivot",
    (s, dir) => {
      val wide = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(msum(col("l_quantity")).as("sum_qty"),
          msum(col("l_extendedprice")).as("sum_price"))
      wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price")),
        "metric", "value")
        .orderBy(col("l_returnflag"), col("metric"))
    },
    Some(
      s"""WITH wide AS (
         |  SELECT l_returnflag,
         |    ${msumSql("l_quantity")} AS sum_qty,
         |    ${msumSql("l_extendedprice")} AS sum_price
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
         |UNION ALL
         |SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
         |ORDER BY l_returnflag, metric""".stripMargin))

  // ------------------------------------- Q21: SQL-text path with CTE + HAVING
  // The notebook's entire query IR is SQL text (EP2); this entry runs
  // spark.sql(...) verbatim — CTE + HAVING + join, the same string DuckDB
  // executes (modulo nothing: it is engine-portable ANSI SQL).
  private val q21 = Q(
    "q21_cte_having",
    (s, dir) => {
      // view names carry the dir identity: interleaved runs against
      // different sfDirs on one session must not shadow each other
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      t(s, dir, "orders").createOrReplaceTempView(s"orders_v_$tag")
      t(s, dir, "customer").createOrReplaceTempView(s"customer_v_$tag")
      s.sql(
        s"""WITH big_spenders AS (
           |  SELECT o_custkey, ${msumSql("o_totalprice")} AS total_spent,
           |    COUNT(*) AS n_orders
           |  FROM orders_v_$tag
           |  GROUP BY o_custkey
           |  HAVING COUNT(*) >= 5)
           |SELECT b.o_custkey, b.total_spent, b.n_orders, c.c_mktsegment
           |FROM big_spenders b
           |JOIN customer_v_$tag c ON b.o_custkey = c.c_custkey
           |ORDER BY b.o_custkey""".stripMargin)
    },
    Some(
      s"""WITH big_spenders AS (
         |  SELECT o_custkey, ${msumSql("o_totalprice")} AS total_spent,
         |    COUNT(*) AS n_orders
         |  FROM orders
         |  GROUP BY o_custkey
         |  HAVING COUNT(*) >= 5)
         |SELECT b.o_custkey, b.total_spent, b.n_orders, c.c_mktsegment
         |FROM big_spenders b
         |JOIN customer c ON b.o_custkey = c.c_custkey
         |ORDER BY b.o_custkey""".stripMargin))

  // ------------------------------------------ Q22: CUBE + GROUPING markers
  // Completes the grouping-sets family started by q17 (ROLLUP): CUBE emits
  // every subset of the grouping keys, and grouping() disambiguates a real
  // NULL key from a subtotal marker — the operator a reporting layer needs
  // before it can trust coalesce(key, 'ALL'). Same physical shape as a plain
  // hash aggregate: Spark expands the grouping sets map-side, so it is one
  // shuffle, not one per subset.
  private val q22 = Q(
    "q22_cube",
    (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          msum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("g_rf"), col("g_ls"), col("sum_qty"), col("n"))
        .orderBy(col("g_rf"), col("g_ls"), col("returnflag"), col("linestatus")),
    Some(
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         |  coalesce(l_linestatus, 'ALL') AS linestatus,
         |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
         |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
         |  ${msumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY g_rf, g_ls, returnflag, linestatus""".stripMargin))

  // ----------------------------------- Q23: anti join (NOT EXISTS subquery)
  // The complement of q10's IN-subquery semi-join: customers who never
  // placed a high-value order (the filter is INSIDE the subquery, so this is
  // a true anti-join, not a filtered semi-join — every customer has SOME
  // order in this data). Spark plans the left_anti over the filtered key
  // projection; the filter pushes into the orders scan and the anti side
  // never widens rows.
  private val q23 = Q(
    "q23_antijoin",
    (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders")
            .where(col("o_totalprice") > 300000)
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
    Some(
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin))

  // ------------------------- Q24: correlated scalar subquery (SQL-text path)
  // Each customer's largest order, selected by a correlated scalar subquery
  // run verbatim through spark.sql (q21's engine-portable-SQL posture).
  // Catalyst decorrelates this into an aggregate + join — same plan family
  // as the window-function formulation, but exercising the subquery
  // rewrite machinery. max() of doubles is order-insensitive, so no msum
  // treatment is needed; ties (two orders at the customer max) surface as
  // multiple rows in BOTH engines identically.
  private val q24 = Q(
    "q24_corr_scalar",
    (s, dir) => {
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      t(s, dir, "orders").createOrReplaceTempView(s"orders_q24_$tag")
      s.sql(
        s"""SELECT o_custkey, o_orderkey, o_totalprice
           |FROM orders_q24_$tag o
           |WHERE o_totalprice = (SELECT max(o2.o_totalprice)
           |                      FROM orders_q24_$tag o2
           |                      WHERE o2.o_custkey = o.o_custkey)
           |ORDER BY o_custkey, o_orderkey""".stripMargin)
    },
    Some(
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice)
        |                      FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin))

  // ------------------------ Q25: rolling time-window aggregate (RANGE frame)
  // 7-day moving revenue over daily order totals — the time-series
  // companion to q16's row-frame windows. A RANGE frame over a gap-y date
  // axis differs from ROWS (missing days still shrink the window), which is
  // what makes it the right operator for irregular time series. Engine
  // determinism: the daily totals stay FIXED-POINT LONGS through the
  // windowed sum (a segment-tree window aggregator may reorder float adds;
  // integer adds are immune), scaled back to doubles once at the end.
  // Plan note: the unpartitioned window runs on ONE partition by design —
  // its input is the per-DAY aggregate (calendar-bounded: ~37 k rows per
  // century), not the fact table; the heavy reduction happened in the
  // partial+final groupBy before it.
  private val q25 = Q(
    "q25_rolling",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("day_int")).rangeBetween(-6, 0)
      t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 10000, 0).cast("long")).as("cents"))
        .withColumn("day_int", datediff(col("day"), lit("1992-01-01")))
        .withColumn("rev_7d", (sum(col("cents")).over(w).cast("double") / 10000))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          (col("cents").cast("double") / 10000).as("rev_day"), col("rev_7d"))
        .orderBy(col("day"))
    },
    Some(
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    SUM(CAST(round(o_totalprice * 10000) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1
        |)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(cents AS DOUBLE) / 10000 AS rev_day,
        |  CAST(SUM(cents) OVER (ORDER BY date_diff('day', DATE '1992-01-01', day)
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) / 10000 AS rev_7d
        |FROM daily ORDER BY day""".stripMargin))

  // --------------------- Q26: LATERAL correlated subquery (top-n per group)
  // The last member of the subquery family (q10 IN, q23 NOT EXISTS, q24
  // correlated scalar): a per-row LATERAL derived table — top-2 customers
  // by balance for EACH nation. Catalyst plans the correlated LIMIT as a
  // per-key window under a join, the same physical family as a
  // rank-and-filter, so no nation's customers are ever collected. The
  // identical engine-portable SQL runs on both engines (spark.sql text
  // path, q21 posture); raw doubles compare exactly (no aggregation).
  private val q26 = Q(
    "q26_lateral",
    (s, dir) => {
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      t(s, dir, "nation").createOrReplaceTempView(s"nation_q26_$tag")
      t(s, dir, "customer").createOrReplaceTempView(s"customer_q26_$tag")
      s.sql(
        s"""SELECT n.n_name, t.c_custkey, t.c_acctbal
           |FROM nation_q26_$tag n,
           |LATERAL (
           |  SELECT c_custkey, c_acctbal FROM customer_q26_$tag c
           |  WHERE c.c_nationkey = n.n_nationkey
           |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
           |) t
           |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin)
    },
    Some(
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        |) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin))

  // ------------------------------------------------ Q27: FULL OUTER JOIN
  // The one join type the suite didn't yet cover (q12 left, q10 semi, q23
  // anti): per-customer order stats FULL OUTER JOIN the high-balance
  // customer roster. Rows survive from BOTH unmatched sides — customers
  // whose every order is small but whose balance is high, and heavy
  // orderers with a low balance — so coalesce()-over-null is load-bearing,
  // not decorative. Physically this is one shuffle per side on the join
  // key (no broadcast: full outer cannot broadcast either side and keep
  // unmatched rows), which is exactly the plan a 100 TB reconciliation
  // between two fact extracts wants. Sums stay fixed-point (msum).
  private val q27 = Q(
    "q27_fullouter",
    (s, dir) => {
      val big = t(s, dir, "orders")
        .where(col("o_totalprice") > 250000)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_big"), msum(col("o_totalprice")).as("big_rev"))
      val rich = t(s, dir, "customer")
        .where(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_acctbal"))
      big.join(rich, col("o_custkey") === col("c_custkey"), "full_outer")
        .select(
          coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
          coalesce(col("n_big"), lit(0L)).as("n_big"),
          coalesce(col("big_rev"), lit(0.0)).as("big_rev"),
          col("c_acctbal").isNotNull.as("is_rich"))
        .orderBy(col("custkey"))
    },
    Some(
      s"""WITH big AS (
         |  SELECT o_custkey, COUNT(*) AS n_big,
         |    ${msumSql("o_totalprice")} AS big_rev
         |  FROM orders WHERE o_totalprice > 250000 GROUP BY o_custkey
         |), rich AS (
         |  SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000
         |)
         |SELECT coalesce(o_custkey, c_custkey) AS custkey,
         |  coalesce(n_big, 0) AS n_big,
         |  coalesce(big_rev, 0.0) AS big_rev,
         |  c_acctbal IS NOT NULL AS is_rich
         |FROM big FULL OUTER JOIN rich ON o_custkey = c_custkey
         |ORDER BY custkey""".stripMargin))

  // ---------------------------------------------- Q28: 6-table join (TPC-H Q5)
  // The reference's merge chain (ipynb cells 31→32) stops at two dimensions;
  // this generalizes it to the commonest real-user plan family the suite
  // didn't yet cover: a fact⋈fact join (lineitem⋈orders — both shuffle on
  // the order key) under a selective dimension chain
  // customer⋈supplier⋈nation⋈region with a region filter and the classic Q5
  // co-location constraint c_nationkey = s_nationkey. nation/region are
  // bounded (25/5 rows at any SF) and explicitly broadcast; customer and
  // supplier scale with SF, so they are left to the planner — AQE broadcasts
  // them while they fit and shuffles them when they don't, which is exactly
  // the 100 TB behavior wanted. Revenue is the 4dp-exact fixed-point sum of
  // l_extendedprice·(1−l_discount) (both factors ≤2dp, so the double product
  // is ≤4dp — msum's exactness domain).
  private val q28 = Q(
    "q28_q5join",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cst = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cst, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(
      s"""SELECT n_name,
         |  ${msumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin))

  // --------------------------------- Q29: part-filtered profit (TPC-H Q9 shape)
  // The second untouched-table family: lineitem⋈part under a substring part
  // filter (the Q9 LIKE), supplier⋈nation for the grouping attribute, and a
  // second fact join to orders for the year — five tables, two of them
  // fact-sized. No partsupp table exists in the testdata, so "profit" is the
  // discounted revenue rather than revenue − supplycost; the plan family
  // (scan-filtered mid-size dim + double fact join + broadcast tail) is the
  // point. o_year is cast to BIGINT on both engines (DuckDB's year() yields
  // BIGINT; Spark's year() yields INT — dtype-strict compare).
  private val q29 = Q(
    "q29_q9profit",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val prt = t(s, dir, "part").where(col("p_name").contains("widget"))
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val ord = t(s, dir, "orders")
      li.join(prt, col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(count(lit(1)).as("n_lines"),
          msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    },
    Some(
      s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  COUNT(*) AS n_lines,
         |  ${msumSql("l_extendedprice * (1.0 - l_discount)")} AS profit
         |FROM lineitem, part, supplier, nation, orders
         |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
         |  AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
         |  AND p_name LIKE '%widget%'
         |GROUP BY 1, 2
         |ORDER BY n_name, o_year DESC""".stripMargin))

  // ------------------------------------------------ Q30: wide pivot (34 columns)
  // The reference's capacity timeseries pivots to an 88k×40 wide frame
  // (ipynb cell 5); q19 exercised pivot at 3 output columns. This one
  // proves the conditional-aggregation plan scales in COLUMNS: ship-year
  // rows × day-of-month 1–31 revenue cells — 32 output columns, each cell
  // an exact fixed-point sum, one aggregation pass (no per-column scan).
  // Pivot values are pinned explicitly (1 to 31): Spark never runs the
  // distinct-values job, and the mirror generates the same 31 conditional
  // sums from the same range.
  private val q30 = Q(
    "q30_widepivot",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(year(col("l_shipdate")).cast("long").as("ship_year"),
          dayofmonth(col("l_shipdate")).as("dom"), col("l_extendedprice"))
        .groupBy(col("ship_year"))
        .pivot("dom", 1 to 31)
        .agg(msum(col("l_extendedprice")))
        .orderBy(col("ship_year")),
    Some {
      val cells = (1 to 31).map(d =>
        s"""  ${msumSql(s"CASE WHEN date_part('day', l_shipdate) = $d THEN l_extendedprice END")} AS "$d"""")
        .mkString(",\n")
      s"""SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         |$cells
         |FROM lineitem
         |GROUP BY 1
         |ORDER BY ship_year""".stripMargin
    })

  // --------------------------------- Q31: TPC-H Q17-shaped correlated average
  // Small-quantity outlier revenue for one brand: lineitems below 20% of
  // their own part's average quantity. The classic formulation is a
  // correlated scalar subquery (the oracle keeps that exact text — DuckDB
  // decorrelates it); the DataFrame form IS the decorrelated plan, declared
  // directly: broadcast brand dim bounds the fact scan, one per-part
  // aggregate builds the thresholds, one equi-join applies them — no
  // per-row re-aggregation anywhere, which is the only shape that survives
  // at 100 TB. Averages run on the msum fixed point (l_quantity is double
  // parquet — a float sum's reduction order would diverge across engines).
  private val q31 = Q(
    "q31_q17outlier",
    (s, dir) => {
      val bp = broadcast(t(s, dir, "part")
        .where(col("p_brand") === "Brand#1").select(col("p_partkey")))
      val brandLi = t(s, dir, "lineitem")
        .join(bp, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      // every lineitem row of a brand part is in brandLi, so the per-part
      // average over brandLi equals the correlated subquery's average
      val cuts = brandLi.groupBy(col("l_partkey"))
        .agg((lit(0.2) * mavg(col("l_quantity"))).as("qty_cut"))
      brandLi.join(cuts, "l_partkey")
        .where(col("l_quantity") < col("qty_cut"))
        .agg(round(msum(col("l_extendedprice")) / lit(7.0), 4).as("avg_yearly"),
          count(lit(1)).as("n_outlier_rows"))
    },
    Some(
      s"""SELECT
         |  round(${msumSql("l_extendedprice")} / 7.0, 4) AS avg_yearly,
         |  COUNT(*) AS n_outlier_rows
         |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |WHERE p.p_brand = 'Brand#1'
         |  AND l.l_quantity < (
         |    SELECT CAST(0.2 AS DOUBLE) * ${mavgSql("l2.l_quantity")}
         |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin))

  // ------------------------------- Q32: TPC-H Q21-shaped "sole late shipper"
  // Suppliers ranked by orders where they were the ONLY supplier to ship
  // late (> 90 days after the order date) on a multi-supplier order — the
  // classic EXISTS + NOT EXISTS double correlation. The oracle keeps that
  // text (DuckDB decorrelates it); the DataFrame side declares the
  // decorrelated plan: ONE fact⋈orders equi-join, ONE per-order aggregate
  // (distinct suppliers, distinct late suppliers, the lone late supplier via
  // max over a singleton), filter, re-aggregate by supplier — no per-row
  // EXISTS probes, which is the only shape that survives at 100 TB (the
  // correlated form re-scans lineitem per row).
  private val q32 = Q(
    "q32_q21waiting",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))) > 90)
            .as("late"))
      // two plain aggregates, NOT two count_distincts in one: multiple
      // distinct aggregates plan as an Expand that triples the joined
      // stream — at 100 TB that's the query's whole cost. Level 1 collapses
      // to (order, supplier, ever-late); level 2 counts what are now
      // distinct-by-construction rows.
      val perSupp = j.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("late"))
      val per = perSupp.groupBy(col("l_orderkey")).agg(
        count(lit(1)).as("n_supps"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late_supps"),
        max(when(col("late"), col("l_suppkey"))).as("late_supp"))
      per.where(col("n_supps") > 1 && col("n_late_supps") === 1)
        .groupBy(col("late_supp").as("suppkey"))
        .agg(count(lit(1)).as("n_waiting"))
        .orderBy(col("n_waiting").desc, col("suppkey"))
        .limit(20)
    },
    Some(
      """SELECT l1.l_suppkey AS suppkey,
        |  COUNT(DISTINCT l1.l_orderkey) AS n_waiting
        |FROM lineitem l1 JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE date_diff('day', CAST(o.o_orderdate AS DATE),
        |        CAST(l1.l_shipdate AS DATE)) > 90
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND date_diff('day', CAST(o3.o_orderdate AS DATE),
        |            CAST(l3.l_shipdate AS DATE)) > 90)
        |GROUP BY 1
        |ORDER BY n_waiting DESC, suppkey
        |LIMIT 20""".stripMargin))

  // --------------------------- Q33: TPC-H Q13-shaped customer distribution
  // The ONLY TPC-H classic whose outer join must keep its filter in the ON
  // clause: counting each customer's non-urgent orders, customers with NONE
  // must survive with c_count = 0 (a WHERE on the nullable side would turn
  // the outer join inner and drop them). The DataFrame side filters orders
  // BEFORE the left join — equivalent to ON-clause filtering for the
  // preserved side, and it lets the filter push into the orders scan. Then
  // the histogram-of-counts: a second aggregate over the first's output
  // (|customers| rows, then |distinct counts| rows — each strictly smaller).
  // (custdist DESC, c_count DESC) is total: c_count is the group key.
  private val q33 = Q(
    "q33_q13custdist",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey"))
      val o = t(s, dir, "orders")
        .where(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some(
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM customer c LEFT OUTER JOIN orders o
        |    ON o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  // ------------------------------- Q34: TPC-H Q22-shaped "global customers"
  // The scalar-subquery-gate + anti-join classic: customers whose balance
  // beats the positive-balance average AND who never placed an urgent order
  // (the testdata has no order-less customers, so the anti-join target is
  // the urgent subset — same shape, non-empty result). The DataFrame side
  // declares the decorrelated plan: the 1-row cut broadcasts into a
  // crossJoin gate (never a per-row re-aggregation), the anti join prunes
  // its right side to urgent orders' custkeys before shuffling. Averages
  // ride the mavg fixed point so the gate threshold is the identical double
  // in both engines.
  private val q34 = Q(
    "q34_q22balance",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val cut = c.where(col("c_acctbal") > lit(0.0))
        .agg(mavg(col("c_acctbal")).as("cut"))
      val urgent = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      c.crossJoin(broadcast(cut))
        .where(col("c_acctbal") > col("cut"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("numcust"),
          round(msum(col("c_acctbal")), 4).as("totacctbal"))
        .orderBy(col("segment"))
    },
    Some(
      s"""SELECT c_mktsegment AS segment, COUNT(*) AS numcust,
         |  round(${msumSql("c_acctbal")}, 4) AS totacctbal
         |FROM customer c
         |WHERE c.c_acctbal > (
         |    SELECT ${mavgSql("c2.c_acctbal")}
         |    FROM customer c2 WHERE c2.c_acctbal > CAST(0 AS DOUBLE))
         |  AND NOT EXISTS (
         |    SELECT 1 FROM orders o
         |    WHERE o.o_custkey = c.c_custkey
         |      AND o.o_orderpriority = '1-URGENT')
         |GROUP BY 1
         |ORDER BY segment""".stripMargin))

  // --------------------------- Q35: TPC-H Q19-shaped disjunctive join filter
  // The OR-of-ANDs classic: three (brand, size-range, quantity-range)
  // clauses spanning BOTH join sides. Catalyst cannot fully split a
  // cross-side disjunction, so the DataFrame form declares the per-side
  // unions as pre-filters by hand — part rows outside every (brand, size)
  // clause and lineitem rows outside the quantity hull [1, 30] never reach
  // the join (at 100 TB that pre-prune IS the query; the residual OR then
  // runs on the small joined stream). The oracle keeps the classic
  // single-WHERE text — DuckDB derives the same per-side prunes itself.
  private val q35 = Q(
    "q35_q19disjunct",
    (s, dir) => {
      def clause(brand: String, sizeHi: Int, qLo: Double, qHi: Double) =
        col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
          col("l_quantity").between(qLo, qHi)
      val prt = t(s, dir, "part")
        .where((col("p_brand") === "Brand#1" && col("p_size").between(1, 15)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)))
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val li = t(s, dir, "lineitem")
        .where(col("l_quantity").between(1.0, 30.0))
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      li.join(prt, col("l_partkey") === col("p_partkey"))
        .where(clause("Brand#1", 15, 1.0, 11.0) ||
          clause("Brand#2", 25, 10.0, 20.0) ||
          clause("Brand#3", 35, 20.0, 30.0))
        .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_rows"))
    },
    Some(
      s"""SELECT
         |  ${msumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_rows
         |FROM lineitem, part
         |WHERE p_partkey = l_partkey
         |  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN CAST(1 AS DOUBLE) AND CAST(11 AS DOUBLE))
         |    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
         |        AND l_quantity BETWEEN CAST(10 AS DOUBLE) AND CAST(20 AS DOUBLE))
         |    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
         |        AND l_quantity BETWEEN CAST(20 AS DOUBLE) AND CAST(30 AS DOUBLE)))""".stripMargin))

  // ------------------------------------ Q36: TPC-H Q15-shaped top supplier
  // Quarterly revenue per supplier, keep the max-revenue supplier(s) — the
  // view + scalar-MAX classic. The per-supplier revenue frame is DECLARED
  // once but physically computed twice (once under the max gate, once for
  // the output branch — Spark does not share uncached subplans); that is
  // deliberate: the aggregate is filter-pruned and supplier-sized, so two
  // passes beat materializing it, and correctness is safe either way
  // because msum is deterministic (a localCheckpoint is the knob if the
  // double aggregate ever matters at scale — ADVICE r13). The scalar max
  // is a 1-row broadcast crossJoin gate, never a per-row re-aggregation.
  // Revenue rides the msum fixed point, so the
  // equality against the max compares bit-identical doubles in both
  // engines — double equality is safe exactly BECAUSE of the fixed point.
  private val q36 = Q(
    "q36_q15topsupp",
    (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      val cut = rev.agg(max(col("total_revenue")).as("max_rev"))
      rev.crossJoin(broadcast(cut))
        .where(col("total_revenue") === col("max_rev"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey").as("suppkey"), col("s_name"),
          col("total_revenue"))
        .orderBy(col("suppkey"))
    },
    Some(
      s"""WITH revenue0 AS (
         |  SELECT l_suppkey,
         |    ${msumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey AS suppkey, s_name, total_revenue
         |FROM supplier, revenue0
         |WHERE s_suppkey = l_suppkey
         |  AND total_revenue = (SELECT max(total_revenue) FROM revenue0)
         |ORDER BY suppkey""".stripMargin))

  // ------------------------------- Q37: TPC-H Q7-shaped two-nation volume
  // Shipping volume between two nations by year, BOTH directions — the
  // self-joined dimension classic (nation appears twice under different
  // roles). Each nation copy is pre-filtered to the 2-name IN set (the
  // only per-side prune a cross-side pair-OR admits) and broadcast through
  // supplier/customer, so the fact⋈fact join (lineitem⋈orders) is the only
  // shuffle; the direction pair-OR runs as a residual on the joined stream.
  private val q37 = Q(
    "q37_q7volume",
    (s, dir) => {
      val names = Seq("NATION_18", "NATION_19")
      val n1 = broadcast(t(s, dir, "nation")
        .where(col("n_name").isin(names: _*))
        .select(col("n_nationkey").as("supp_nkey"),
          col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .where(col("n_name").isin(names: _*))
        .select(col("n_nationkey").as("cust_nkey"),
          col("n_name").as("cust_nation")))
      val sup = t(s, dir, "supplier")
        .join(n1, col("s_nationkey") === col("supp_nkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cst = t(s, dir, "customer")
        .join(n2, col("c_nationkey") === col("cust_nkey"))
        .select(col("c_custkey"), col("cust_nation"))
      val li = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      li.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(cst, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .where((col("supp_nation") === "NATION_18" &&
          col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" &&
            col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some(
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  ${msumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM supplier, lineitem, orders, customer, nation n1, nation n2
         |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |  AND c_custkey = o_custkey
         |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
         |  AND ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
         |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
         |  AND l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin))

  // ------------------------------- Q38: TPC-H Q8-shaped market-share ratio
  // One nation's share of a filtered market by order year: the conditional-
  // numerator / total-denominator aggregate. Both sums ride the msum fixed
  // point, so the quotient divides bit-identical doubles in both engines
  // (per-row IEEE division on identical inputs is exact-deterministic);
  // round(…, 6) only stabilizes the PRINTED width, not the compare. The
  // region and part prunes broadcast; orders⋈lineitem is the one shuffle.
  private val q38 = Q(
    "q38_q8share",
    (s, dir) => {
      val prt = broadcast(t(s, dir, "part")
        .where(col("p_type") === "PROMO").select(col("p_partkey")))
      val nr = broadcast(t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .select(col("n_nationkey").as("cust_nkey")))
      val supN = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("supp_nkey"),
          col("n_name").as("supp_nation")))
      val cst = t(s, dir, "customer")
        .join(nr, col("c_nationkey") === col("cust_nkey"))
        .select(col("c_custkey"))
      val sup = t(s, dir, "supplier")
        .join(supN, col("s_nationkey") === col("supp_nkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      t(s, dir, "lineitem")
        .join(prt, col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cst, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(
          msum(when(col("supp_nation") === "NATION_1", vol).otherwise(lit(0.0))) /
            msum(vol), 6).as("mkt_share"))
        .orderBy(col("o_year"))
    },
    Some(
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  round(
         |    (${msumSql("CASE WHEN n1.n_name = 'NATION_1' THEN l_extendedprice * (1.0 - l_discount) ELSE CAST(0 AS DOUBLE) END")})
         |    / (${msumSql("l_extendedprice * (1.0 - l_discount)")}), 6) AS mkt_share
         |FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
         |  region
         |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
         |  AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
         |  AND s_nationkey = n1.n_nationkey
         |  AND r_name = 'ASIA' AND p_type = 'PROMO'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1
         |ORDER BY o_year""".stripMargin))

  val all: Seq[Q] =
    Seq(q01, q02, q03, q05, q07, q08, q09, q10, q12, q13, q14, q15, q16, q17,
      q18, q19, q20, q21, q22, q23, q24, q25, q26, q27, q28, q29, q30, q31,
      q32, q33, q34, q35, q36, q37, q38)
}
