package graft.queries

import graft.core.{Exact, Tables}
import graft.ops.{StatsOps, TopKOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator pack over the TPC-H-ish tables (SURVEY §2.1-2.7).
  *
  * Covers: scans with pushdown, projection/filter/cast (P1-P8), equi /
  * anti / semi / theta-self joins (J1/J3/J5 + semi), multi-key grouped
  * aggregation with exact sums/avgs (A1-A3, A5, A8, A9), distinct (A10),
  * pivot/crosstab (A7), conditional bucketing (P8), union (U1/U2),
  * window top-k (W1/W2), global sort + limit (O1-O3), rollup (§2.4
  * "absent" extension), min-max normalization (hw0_3 parity), sampling
  * (P12, rows-only check — RNG not oracle-expressible).
  *
  * Scale notes are inline per query; the common ones:
  *   - nation/region are O(25) rows → always `broadcast`.
  *   - customer/supplier/part grow with SF → no hint; AQE picks
  *     broadcast vs shuffle join from runtime stats.
  *   - lineitem/orders are the fact tables → never broadcast, filters
  *     pushed to parquet scan.
  */
object Relational extends QueryPack {

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val revSql = "l_extendedprice * (1.0 - l_discount)"

  /** TPC-H Q1-style pricing summary: multi-key group, exact sums/avgs. */
  private def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.sumFixed(col("l_quantity"), 2).as("sum_qty"),
        Exact.sumFixed(col("l_extendedprice"), 2).as("sum_base_price"),
        Exact.sumFixed(rev, 4).as("sum_disc_price"),
        Exact.avgFixed(col("l_quantity"), 2).as("avg_qty"),
        Exact.avgFixed(col("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1Sql =
    s"""SELECT l_returnflag, l_linestatus,
       ${Exact.sumFixedSql("l_quantity", 2)} AS sum_qty,
       ${Exact.sumFixedSql("l_extendedprice", 2)} AS sum_base_price,
       ${Exact.sumFixedSql(revSql, 4)} AS sum_disc_price,
       ${Exact.avgFixedSql("l_quantity", 2)} AS avg_qty,
       ${Exact.avgFixedSql("l_discount", 2)} AS avg_disc,
       COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  /** hw0 parity: one-pass min/max/count/mean/stddev_pop (A1-A3). */
  private def q2ColStats(s: SparkSession, d: String): DataFrame =
    StatsOps.colStats(Tables(s, d, "lineitem"), "l_quantity", 2)

  private val q2Sql =
    s"""SELECT MIN(l_quantity) AS min_l_quantity,
       MAX(l_quantity) AS max_l_quantity,
       COUNT(l_quantity) AS count_l_quantity,
       ${Exact.avgFixedSql("l_quantity", 2)} AS avg_l_quantity,
       ${Exact.stddevPopFixedSql("l_quantity", 2)} AS stddev_pop_l_quantity
       FROM lineitem"""

  /** Star join fact→dims with broadcast of the O(25)-row nation dim. */
  private def q3RevenueByNation(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "lineitem")
      .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        Exact.sumFixed(rev, 4).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("n_name"))

  private val q3Sql =
    s"""SELECT n_name,
       ${Exact.sumFixedSql(revSql, 4)} AS revenue,
       COUNT(DISTINCT o_orderkey) AS n_orders
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name"""

  /** TPC-H Q5-style local-supplier revenue: the six-table join with
    * the colocation predicate (customer and supplier in the SAME
    * nation) that stresses join ORDER. Shape: the two fact tables
    * (lineitem ⋈ orders, date-filtered at the scan) shuffle-join
    * once; customer joins on custkey; supplier carries BOTH the
    * suppkey equi-key and the c_nationkey = s_nationkey colocation
    * filter; nation and the r_name-filtered region ride as broadcast
    * dims. At 100 TB only the two fact joins shuffle — everything
    * after is map-side.
    */
  private def q156TpchQ5Region(s: SparkSession, d: String): DataFrame = {
    val cut0 = to_timestamp(lit("1996-01-01 00:00:00"))
    val cut1 = to_timestamp(lit("1998-01-01 00:00:00"))
    Tables(s, d, "lineitem")
      .join(Tables(s, d, "orders")
        .filter(col("o_orderdate") >= cut0 && col("o_orderdate") < cut1),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables(s, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, d, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Exact.sumFixed(rev, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q156Sql =
    s"""SELECT n_name, ${Exact.sumFixedSql(revSql, 4)} AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
                    AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY n_name ORDER BY revenue DESC, n_name"""

  /** q158: TPC-H Q17 shape — a CORRELATED SCALAR SUBQUERY ("lines with
    * quantity below 20% of this part's average") decorrelated as a
    * window aggregate: partition-by-partkey count/sum ride the SAME
    * shuffle as the rows they qualify, so the classic subquery costs
    * ONE exchange instead of a self-join against a re-aggregated scan.
    * The brand filter prunes first through a broadcast dim, and the
    * 20%-of-average threshold is exact integer math (q·5·cnt < Σq in
    * fixed-point) — no float-boundary drift between engines.
    */
  private def q158SmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val brandParts = Tables(s, d, "part")
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      .select(col("p_partkey"), col("p_brand"))
    val w = Window.partitionBy(col("l_partkey"))
    Tables(s, d, "lineitem")
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .withColumn("pq_cnt", count(lit(1)).over(w))
      .withColumn("pq_sum", sum(Exact.fixed(col("l_quantity"), 2)).over(w))
      .filter(
        Exact.fixed(col("l_quantity"), 2) * lit(5L) * col("pq_cnt") <
          col("pq_sum"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small_lines"),
        (Exact.sumFixed(col("l_extendedprice"), 2) / lit(7.0))
          .as("avg_yearly"))
      .orderBy(col("p_brand"))
  }

  private val q158Sql =
    s"""WITH pruned AS (
         SELECT p_brand, l_quantity, l_extendedprice,
                COUNT(*) OVER (PARTITION BY l_partkey) AS pq_cnt,
                SUM(${Exact.fixedSql("l_quantity", 2)})
                  OVER (PARTITION BY l_partkey) AS pq_sum
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3'))
       SELECT p_brand, COUNT(*) AS n_small_lines,
              ${Exact.sumFixedSql("l_extendedprice", 2)}/7.0 AS avg_yearly
       FROM pruned
       WHERE ${Exact.fixedSql("l_quantity", 2)} * 5 * pq_cnt < pq_sum
       GROUP BY p_brand ORDER BY p_brand"""

  /** q188: TPC-H Q19 shape — revenue under an OR-of-ANDs predicate
    * that SPANS the join (each disjunct constrains both part
    * attributes and line quantity). The optimizer lesson this pins:
    * Catalyst extracts the per-side implications of the disjunction
    * (`(brandA ∧ size≤5) ∨ (brandB ∧ size≤10) ∨ …` onto the part
    * scan, the quantity-range union onto lineitem) and pushes them
    * below the join, so the parquet scans carry Or-filters and the
    * join probes only plausible rows — the residual cross-side OR
    * evaluates on the survivors. PlanSpec asserts the pushed Or on
    * BOTH scans; at 100 TB that per-side pruning is the difference
    * between scanning three brands' rows and scanning every line.
    * Revenue in exact fixed-point; part side broadcasts.
    */
  private def q188DisjunctiveRevenue(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "lineitem")
      .join(broadcast(Tables(s, d, "part")),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(Exact.sumFixed(rev, 4).as("revenue"),
        count(lit(1)).as("n_lines"))

  private val q188Sql =
    s"""SELECT ${Exact.sumFixedSql(revSql, 4)} AS revenue,
              CAST(COUNT(*) AS BIGINT) AS n_lines
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
              AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
              AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 20 AND 30)"""

  /** q159: TPC-H Q18 shape — large-volume orders via an aggregate
    * HAVING subquery. The per-order quantity aggregate is map-side
    * partial; the surviving order set is tiny (top ~1% of orders), so
    * AQE broadcasts it into the orders/customer joins at runtime —
    * the 100 TB plan is one fact shuffle plus two broadcast probes.
    * Threshold compares in exact fixed-point (Σq > 250.00).
    */
  private def q159LargeVolumeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(Exact.fixed(col("l_quantity"), 2)).as("qty_fixed"))
      .filter(col("qty_fixed") > lit(25000L))
      .select(col("l_orderkey"),
        (col("qty_fixed").cast("double") / 100.0).as("total_qty"))
    Tables(s, d, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  private val q159Sql =
    s"""WITH big AS (
         SELECT l_orderkey,
                SUM(${Exact.fixedSql("l_quantity", 2)}) AS qty_fixed
         FROM lineitem GROUP BY l_orderkey
         HAVING SUM(${Exact.fixedSql("l_quantity", 2)}) > 25000)
       SELECT c_name, c_custkey, o_orderkey, o_totalprice,
              CAST(qty_fixed AS DOUBLE)/100.0 AS total_qty
       FROM big JOIN orders ON o_orderkey = l_orderkey
       JOIN customer ON c_custkey = o_custkey
       ORDER BY o_totalprice DESC, o_orderkey"""

  /** q160: TPC-H Q21 shape — correlated EXISTS + NOT EXISTS, entered as
    * SQL so Catalyst's `RewritePredicateSubquery` does the
    * decorrelation: the EXISTS becomes a left-semi and the NOT EXISTS
    * a left-anti join, both hash-keyed on `l_orderkey` (the non-equi
    * suppkey/shipdate conjuncts ride as join residuals). Semantics on
    * this schema: in multi-supplier finished orders, the supplier
    * whose line shipped strictly last held the order up — count such
    * orders per supplier. No nested-loop anywhere; the cartesian lint
    * stays green because every subquery carries the orderkey equi-key.
    */
  private def q160SupplierWaiting(s: SparkSession, d: String): DataFrame = {
    Tables(s, d, "supplier").createOrReplaceTempView("g160_supplier")
    Tables(s, d, "lineitem").createOrReplaceTempView("g160_lineitem")
    Tables(s, d, "orders").createOrReplaceTempView("g160_orders")
    s.sql("""
      SELECT s_name, COUNT(*) AS numwait
      FROM g160_supplier
      JOIN g160_lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN g160_orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM g160_lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM g160_lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > l1.l_shipdate)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name""")
  }

  private val q160Sql =
    """SELECT s_name, COUNT(*) AS numwait
       FROM supplier
       JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
       JOIN orders ON o_orderkey = l1.l_orderkey
       WHERE o_orderstatus = 'F'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_shipdate > l1.l_shipdate)
       GROUP BY s_name
       ORDER BY numwait DESC, s_name"""

  /** q161: TPC-H Q22 shape — an uncorrelated SCALAR subquery (global
    * positive-balance average) plus a correlated NOT EXISTS. The
    * scalar side is a one-row aggregate broadcast into every row (the
    * q12 global-stat pattern); the NOT EXISTS plans as a left-anti
    * join against the status-filtered orders. "Above two-thirds of
    * the positive average" is exact integer math (bal·3·cnt > 2·Σbal
    * fixed-point), so the float threshold can never flip a boundary
    * row between engines.
    */
  private def q161AcctbalProspects(s: SparkSession, d: String): DataFrame = {
    val cust = Tables(s, d, "customer")
    val thresh = cust.filter(col("c_acctbal") > 0)
      .agg(count(lit(1)).as("tp_cnt"),
        sum(Exact.fixed(col("c_acctbal"), 2)).as("tp_sum"))
    val finished = Tables(s, d, "orders")
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    cust.crossJoin(broadcast(thresh))
      .filter(
        Exact.fixed(col("c_acctbal"), 2) * lit(3L) * col("tp_cnt") >
          col("tp_sum") * lit(2L))
      .join(finished, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        Exact.sumFixed(col("c_acctbal"), 2).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  private val q161Sql =
    s"""WITH t AS (SELECT COUNT(*) AS tp_cnt,
                SUM(${Exact.fixedSql("c_acctbal", 2)}) AS tp_sum
         FROM customer WHERE c_acctbal > 0)
       SELECT c_mktsegment, COUNT(*) AS numcust,
              ${Exact.sumFixedSql("c_acctbal", 2)} AS totacctbal
       FROM customer, t
       WHERE ${Exact.fixedSql("c_acctbal", 2)} * 3 * tp_cnt > tp_sum * 2
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderstatus = 'F')
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** q210: TPC-H Q2 shape — minimum-cost supplier per part: a
    * CORRELATED SCALAR MIN restricted to a region, decorrelated as a
    * per-part window min (the q158 pattern) over the pseudo-partsupp
    * relation `lineitem → min price per (part, supplier)`. Region
    * restriction applies INSIDE the correlated scope (TPC-H's trap:
    * the min is over EUROPE suppliers only), ties keep every
    * minimum-cost supplier, costs are e2 fixed-point. Dims broadcast;
    * the one wide relation is the grouped lineitem — no self-join, no
    * nested loop.
    */
  private def q210MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val euroSup = Tables(s, d, "supplier")
      .join(broadcast(Tables(s, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, d, "region")
          .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val ps = Tables(s, d, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(Exact.fixed(col("l_extendedprice"), 2)).as("cost_c"))
    val sizedParts = Tables(s, d, "part")
      .filter(col("p_size").isin(5, 10))
      .select(col("p_partkey"), col("p_brand"))
    val w = Window.partitionBy(col("l_partkey"))
    ps.join(broadcast(euroSup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sizedParts), col("l_partkey") === col("p_partkey"))
      .withColumn("min_cost", min(col("cost_c")).over(w))
      .filter(col("cost_c") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("p_brand"), col("cost_c"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
  }

  private val q210Sql =
    s"""WITH ps AS (SELECT l_partkey, l_suppkey,
                MIN(${Exact.fixedSql("l_extendedprice", 2)}) AS cost_c
         FROM lineitem GROUP BY 1, 2),
       es AS (SELECT s_suppkey, s_name, s_acctbal, n_name
              FROM supplier
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'),
       base AS (SELECT ps.l_partkey, ps.cost_c, es.s_name, es.s_acctbal,
                 es.n_name, p.p_brand
                FROM ps
                JOIN es ON ps.l_suppkey = es.s_suppkey
                JOIN part p ON p.p_partkey = ps.l_partkey
                WHERE p.p_size IN (5, 10)),
       m AS (SELECT *, MIN(cost_c) OVER (PARTITION BY l_partkey)
               AS min_cost FROM base)
       SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey,
              p_brand, cost_c
       FROM m WHERE cost_c = min_cost
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey"""

  /** q211: TPC-H Q20 shape — NESTED IN subqueries plus a correlated
    * scalar: suppliers holding "excess stock" of brand-filtered parts,
    * where stock is the pseudo-partsupp total (Σ quantity per
    * part-supplier over all time) and the correlated scalar is the
    * same pair's in-window shipments — qualifying pairs shipped less
    * than half their total inside the window. The inner IN prunes as
    * a broadcast semi-join before the grouped fact relation forms;
    * the correlated scalar decorrelates to a grouped LEFT join on the
    * SAME (part, supplier) key — one exchange, no per-row subquery.
    * Quantities are e2 fixed-point so the halving test is integer.
    */
  private def q211ExcessStock(s: SparkSession, d: String): DataFrame = {
    val brandParts = Tables(s, d, "part")
      .filter(col("p_brand") === "Brand#1")
      .select(col("p_partkey"))
    val cut0 = to_timestamp(lit("1997-01-01 00:00:00"))
    val cut1 = to_timestamp(lit("1998-01-01 00:00:00"))
    val li = Tables(s, d, "lineitem")
    val total = li
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(Exact.fixed(col("l_quantity"), 2)).as("total_c"))
    val inWindow = li
      .filter(col("l_shipdate") >= cut0 && col("l_shipdate") < cut1)
      .groupBy(col("l_partkey").as("wp"), col("l_suppkey").as("ws"))
      .agg(sum(Exact.fixed(col("l_quantity"), 2)).as("window_c"))
    val qualPairs = total
      .join(inWindow, col("l_partkey") === col("wp") &&
        col("l_suppkey") === col("ws"), "left")
      .filter(col("total_c") > lit(2L) * coalesce(col("window_c"), lit(0L)))
      .select(col("l_suppkey"))
    Tables(s, d, "supplier")
      .join(qualPairs, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  private val q211Sql =
    s"""WITH total AS (SELECT l_partkey, l_suppkey,
                SUM(${Exact.fixedSql("l_quantity", 2)}) AS total_c
         FROM lineitem
         WHERE l_partkey IN (SELECT p_partkey FROM part
                             WHERE p_brand = 'Brand#1')
         GROUP BY 1, 2),
       win AS (SELECT l_partkey AS wp, l_suppkey AS ws,
                SUM(${Exact.fixedSql("l_quantity", 2)}) AS window_c
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY 1, 2)
       SELECT s_suppkey, s_name, s_acctbal
       FROM supplier
       WHERE s_suppkey IN (
         SELECT t.l_suppkey FROM total t
         LEFT JOIN win ON t.l_partkey = win.wp AND t.l_suppkey = win.ws
         WHERE t.total_c > 2 * COALESCE(win.window_c, 0))
       ORDER BY s_name"""

  /** q212: TPC-H Q15 shape — the top-revenue-supplier "view": per-
    * supplier revenue over a window, then the suppliers matching the
    * GLOBAL maximum (ties kept). The scalar max is a one-row
    * aggregate broadcast into every row (the q12/q161 global-stat
    * pattern — no single-partition window), compared in e4
    * fixed-point so no float boundary can drop a tied supplier.
    */
  private def q212TopSupplier(s: SparkSession, d: String): DataFrame = {
    val cut0 = to_timestamp(lit("1996-01-01 00:00:00"))
    val cut1 = to_timestamp(lit("1996-07-01 00:00:00"))
    val revs = Tables(s, d, "lineitem")
      .filter(col("l_shipdate") >= cut0 && col("l_shipdate") < cut1)
      .groupBy(col("l_suppkey"))
      .agg(sum(Exact.fixed(rev, 4)).as("rev_c"))
    val top = revs.agg(max(col("rev_c")).as("max_c"))
    revs.crossJoin(broadcast(top))
      .filter(col("rev_c") === col("max_c"))
      .join(Tables(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev_c"))
      .orderBy(col("s_suppkey"))
  }

  private val q212Sql =
    s"""WITH revs AS (SELECT l_suppkey,
                CAST(SUM(${Exact.fixedSql(revSql, 4)}) AS BIGINT) AS rev_c
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
         GROUP BY 1)
       SELECT s_suppkey, s_name, rev_c
       FROM revs JOIN supplier ON l_suppkey = s_suppkey
       WHERE rev_c = (SELECT MAX(rev_c) FROM revs)
       ORDER BY s_suppkey"""

  /** q213: TPC-H Q4 shape — EXISTS feeding a grouped COUNT: orders in a
    * quarter with at least one late shipment (≥60 days after order),
    * counted per priority. The EXISTS plans as ONE left-semi hash join
    * on `orderkey` with the date comparison as a residual — lineitem is
    * never widened, each order contributes at most once no matter how
    * many lines are late, and the quarter filter prunes the orders scan
    * at the parquet reader before the join.
    */
  private def q213PriorityExistsCount(s: SparkSession, d: String): DataFrame = {
    val cut0 = to_timestamp(lit("1997-01-01 00:00:00"))
    val cut1 = to_timestamp(lit("1997-04-01 00:00:00"))
    Tables(s, d, "orders")
      .filter(col("o_orderdate") >= cut0 && col("o_orderdate") < cut1)
      .join(Tables(s, d, "lineitem"),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q213Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate >= o_orderdate + INTERVAL 60 DAY)
       GROUP BY 1 ORDER BY 1"""

  /** q214: TPC-H Q7 shape — cross-border trade volume among a nation
    * set, by ship year. The cross-side predicate (supplier nation ≠
    * customer nation, both in the set) spans both join sides, so its
    * per-side implication (each nation ∈ set) is applied MANUALLY on
    * each broadcast nation dim before the fact joins — the residual
    * inequality then filters an already tiny stream instead of the
    * full fact crossing. Revenue e4 exact.
    */
  private def q214NationVolumeFlows(s: SparkSession, d: String): DataFrame = {
    val set = Seq("NATION_1", "NATION_2", "NATION_3")
    val n1 = Tables(s, d, "nation").filter(col("n_name").isin(set: _*))
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = Tables(s, d, "nation").filter(col("n_name").isin(set: _*))
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    Tables(s, d, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .join(Tables(s, d, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(Tables(s, d, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, d, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(Exact.sumFixed(rev, 4).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q214Sql =
    s"""SELECT supp_nation, cust_nation, l_year,
              ${Exact.sumFixedSql(revSql, 4)} AS revenue
       FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
                    l_extendedprice, l_discount
             FROM lineitem
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
             WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
               AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
               AND n1.n_name <> n2.n_name
               AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
       GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  /** q215: TPC-H Q8 shape — national market share: NATION_3's fraction
    * of ECONOMY-part revenue sold into AMERICA, by order year. Both
    * the conditional and unconditional revenue ride ONE aggregation
    * pass as exact e4 LONGs; the share is a single double division of
    * two exact integers, so the ratio is bit-stable across engines and
    * partitionings. Part and region restrictions prune as (semi-)joins
    * before the fact stream forms.
    */
  private def q215MarketShare(s: SparkSession, d: String): DataFrame = {
    val ecoParts = Tables(s, d, "part")
      .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
    val amerCust = Tables(s, d, "customer")
      .join(broadcast(Tables(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, d, "region")
          .filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val supNation = Tables(s, d, "supplier")
      .join(broadcast(Tables(s, d, "nation")
          .select(col("n_nationkey").as("sn_key"),
            col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    Tables(s, d, "lineitem")
      .join(broadcast(ecoParts), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .join(Tables(s, d, "orders")
          .filter(col("o_orderdate") >=
            to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(amerCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", Exact.fixed(rev, 4))
          .otherwise(lit(0L))).as("nation_c"),
        sum(Exact.fixed(rev, 4)).as("total_c"))
      .select(col("o_year"),
        (col("nation_c").cast("double") / col("total_c").cast("double"))
          .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val q215Sql =
    s"""SELECT o_year,
              CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                       THEN ${Exact.fixedSql(revSql, 4)} ELSE 0 END) AS DOUBLE)
              / CAST(SUM(${Exact.fixedSql(revSql, 4)}) AS DOUBLE) AS mkt_share
       FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
                    n1.n_name AS supp_nation, l_extendedprice, l_discount
             FROM lineitem
             JOIN part ON l_partkey = p_partkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
             JOIN region ON n2.n_regionkey = r_regionkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
               AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
       GROUP BY 1 ORDER BY 1"""

  /** q216: TPC-H Q9 shape — product-line profit by supplier nation and
    * order year, cost proxied by `p_retailprice·l_quantity` (the schema
    * has no partsupp). Profit per line is computed ENTIRELY in integer
    * fixed-point — e4 revenue minus the product of two e2 lifts (also
    * e4) — so the grouped sum is associative-exact; one double division
    * at the end. The name-substring part filter broadcasts.
    */
  private def q216ProductProfit(s: SparkSession, d: String): DataFrame = {
    val profitC = Exact.fixed(rev, 4) -
      Exact.fixed(col("p_retailprice"), 2) * Exact.fixed(col("l_quantity"), 2)
    Tables(s, d, "lineitem")
      .join(broadcast(Tables(s, d, "part")
          .filter(col("p_name").contains("gear"))
          .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables(s, d, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, d, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables(s, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long")
        .as("o_year"))
      .agg((sum(profitC).cast("double") / lit(10000L)).as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  private val q216Sql = {
    val profitC = s"${Exact.fixedSql(revSql, 4)} - " +
      s"${Exact.fixedSql("p_retailprice", 2)}*${Exact.fixedSql("l_quantity", 2)}"
    s"""SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
                AS o_year,
              CAST(SUM($profitC) AS DOUBLE)/10000 AS sum_profit
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       WHERE p_name LIKE '%gear%'
       GROUP BY 1, 2 ORDER BY n_name, o_year DESC"""
  }

  /** q217: TPC-H Q10 shape — top-20 customers by returned-line revenue
    * in a quarter. The `orderBy+limit(20)` plans as
    * TakeOrderedAndProject (per-partition top-20, driver merges 20·P
    * rows — never a global sort), the custkey tie-break makes the
    * cutoff deterministic, and the returnflag + quarter filters prune
    * both fact scans before the join.
    */
  private def q217ReturnedItems(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(Tables(s, d, "orders")
          .filter(col("o_orderdate") >=
            to_timestamp(lit("1997-07-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-10-01 00:00:00")))
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(Exact.sumFixed(rev, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  private val q217Sql =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
              ${Exact.sumFixedSql(revSql, 4)} AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
         AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
       GROUP BY 1, 2, 3, 4
       ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** q218: TPC-H Q11 shape — GROUP-HAVING against a global scalar:
    * parts whose revenue exceeds 1.5× the MEAN part revenue. The mean
    * makes the threshold scale-invariant (a fixed fraction of total —
    * TPC-H's own 0.0001/SF — empties as the part domain grows); the
    * global (total, count) pair re-aggregates the per-part relation
    * (one extra row, not a rescan) and broadcasts into every row via
    * the q12/q161 one-row crossJoin pattern. The comparison
    * `value·2 > 3·(total div n)` is all-integer — `div` truncation is
    * identical in both engines for non-negative operands, so no float
    * boundary can flip a row.
    */
  private def q218ImportantParts(s: SparkSession, d: String): DataFrame = {
    val vals = Tables(s, d, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(Exact.fixed(rev, 4)).as("value_c"))
    val tot = vals.agg(sum(col("value_c")).as("total_c"),
      count(lit(1)).as("n_parts"))
    vals.crossJoin(broadcast(tot))
      .filter(col("value_c") * lit(2L) >
        lit(3L) * expr("total_c div n_parts"))
      .select(col("l_partkey").as("p_partkey"),
        (col("value_c").cast("double") / lit(10000L)).as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  private val q218Sql =
    s"""WITH vals AS (SELECT l_partkey,
                CAST(SUM(${Exact.fixedSql(revSql, 4)}) AS BIGINT) AS value_c
         FROM lineitem GROUP BY 1),
       tot AS (SELECT SUM(value_c) AS total_c, COUNT(*) AS n_parts
               FROM vals)
       SELECT l_partkey AS p_partkey,
              CAST(value_c AS DOUBLE)/10000 AS part_value
       FROM vals, tot
       WHERE value_c*2 > 3*(total_c // n_parts)
       ORDER BY part_value DESC, p_partkey"""

  /** q219: TPC-H Q12 shape — late shipments (≥90 days after order) in
    * a ship year, split into high/low-priority line counts per ship
    * month: both CASE-counts ride one aggregation pass. The lateness
    * predicate is a residual on the orderkey equi-join; the ship-year
    * filter prunes the lineitem scan.
    */
  private def q219LateShipmentPriority(s: SparkSession, d: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables(s, d, "orders").select("o_orderkey", "o_orderdate",
        "o_orderpriority")
      .join(Tables(s, d, "lineitem")
          .filter(col("l_shipdate") >=
            to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(sum(when(high, lit(1L)).otherwise(lit(0L)))
        .as("high_line_count"),
        sum(when(high, lit(0L)).otherwise(lit(1L))).as("low_line_count"))
      .orderBy(col("ship_month"))
  }

  private val q219Sql =
    """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       FROM orders JOIN lineitem
         ON o_orderkey = l_orderkey
        AND l_shipdate >= o_orderdate + INTERVAL 90 DAY
       WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY 1 ORDER BY 1"""

  /** q220: TPC-H Q13 shape — the customer order-count DISTRIBUTION:
    * left-outer join keeps zero-order customers, count per customer,
    * then a second aggregation histograms the counts. Two shuffles
    * total (custkey, then the tiny count domain); the priority filter
    * applies to the orders side BEFORE the outer join (ON-clause
    * semantics), never dropping customers.
    */
  private def q220CustomerOrderDistribution(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "customer").select("c_custkey")
      .join(Tables(s, d, "orders")
          .filter(col("o_orderpriority") =!= "5-LOW")
          .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  private val q220Sql =
    """SELECT c_count, COUNT(*) AS custdist
       FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
             FROM customer LEFT JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
             GROUP BY 1)
       GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""

  /** q221: TPC-H Q14 shape — promo revenue share over a ship month:
    * conditional and total revenue in ONE pass as exact e4 LONGs, the
    * percentage as one double expression mirrored operator-for-operator
    * in the oracle. The part dim broadcasts; the month filter prunes
    * the fact scan to ~1/36 of the data before the join.
    */
  private def q221PromoRevenueShare(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1997-10-01 00:00:00")))
      .join(broadcast(Tables(s, d, "part").select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", Exact.fixed(rev, 4))
          .otherwise(lit(0L))).as("promo_c"),
        sum(Exact.fixed(rev, 4)).as("total_c"))
      .select((lit(100.0) * col("promo_c").cast("double") /
        col("total_c").cast("double")).as("promo_revenue"))

  private val q221Sql =
    s"""SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN ${Exact.fixedSql(revSql, 4)} ELSE 0 END) AS DOUBLE)
              / CAST(SUM(${Exact.fixedSql(revSql, 4)}) AS DOUBLE)
                AS promo_revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'"""

  /** q222: TPC-H Q16 shape — distinct supplier counts per (brand,
    * size), excluding a NOT-IN supplier set (negative balance). The
    * NOT IN plans as a broadcast left-anti join (the excluded set is
    * tiny by construction); countDistinct expands to a two-phase
    * partial-distinct aggregate — no row ever carries more than its
    * own (brand, size, suppkey).
    */
  private def q222PartSupplierCounts(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "lineitem").select("l_partkey", "l_suppkey")
      .join(broadcast(Tables(s, d, "part")
          .filter(col("p_brand") =!= "Brand#1")
          .select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables(s, d, "supplier")
          .filter(col("s_acctbal") < 0).select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))

  private val q222Sql =
    """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE p_brand <> 'Brand#1'
         AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                               WHERE s_acctbal < 0)
       GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size"""

  /** q237: TPC-H Q3 shape — shipping priority: top-10 unshipped
    * orders by revenue for one market segment (the one classic shape
    * the q210–q222 sweep left open; reference analogue is hw4's
    * join→aggregate→head pattern, hw4/hw4.py:60-80). Both fact
    * filters (o_orderdate <, l_shipdate >) are scan-side pushed
    * predicates; the segment filter prunes customer BEFORE its
    * broadcast into orders; the final `orderBy+limit(10)` on the
    * computed revenue plans as TakeOrderedAndProject (per-partition
    * top-10, driver merges 10·P rows — never a global sort, the
    * property PlanSpec pins). o_orderpriority stands in for
    * o_shippriority, which the generated schema doesn't carry.
    */
  private def q237ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cut = to_timestamp(lit("1998-06-01 00:00:00"))
    // semi-reduce orders by the segment's customers BEFORE the fact
    // join: the broadcast semi prunes the orders side early, so the
    // lineitem⋈orders shuffle carries only BUILDING orders
    val bldgOrders = Tables(s, d, "orders")
      .filter(col("o_orderdate") < cut)
      .join(broadcast(Tables(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    Tables(s, d, "lineitem")
      .filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(bldgOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us"),
        col("o_orderpriority"))
      .agg(Exact.sumFixed(rev, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q237Sql =
    s"""SELECT l_orderkey, epoch_us(o_orderdate) AS o_date_us,
              o_orderpriority, ${Exact.sumFixedSql(revSql, 4)} AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       WHERE o_custkey IN (SELECT c_custkey FROM customer
                           WHERE c_mktsegment = 'BUILDING')
         AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
         AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
       GROUP BY 1, 2, 3
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** q225: TPC-H Q6 shape — the forecast-revenue-change query: pure
    * scan-side conjunctive filter + one global exact sum, no join, no
    * group. Completes the 22-shape TPC-H family. The whole WHERE
    * clause (date range + discount band + quantity cap) must reach the
    * parquet reader as PushedFilters — the plan is one pushed scan +
    * one partial/final agg pair; revenue is Σ(price·disc) in e4
    * fixed-point.
    */
  private def q225ForecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(Exact.sumFixed(col("l_extendedprice") * col("l_discount"), 4)
        .as("revenue_delta"))

  private val q225Sql =
    s"""SELECT ${Exact.sumFixedSql("l_extendedprice * l_discount", 4)}
              AS revenue_delta
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         AND l_discount >= 0.05 AND l_discount <= 0.07
         AND l_quantity < 24.0"""

  /** q228: hierarchical percent-of-parent — each nation's share of its
    * region's revenue AND the region's share of the total, in one
    * report: the window-over-aggregate shape (aggregate to the leaf
    * grain first, THEN window the tiny result) that replaces the naive
    * three-scans-and-two-joins plan. The fact table is touched once;
    * the region window and the one-row global broadcast both run over
    * the 25-row aggregate. Shares are double divisions of exact e4
    * LONGs — bit-stable.
    */
  private def q228PercentOfParent(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nat = Tables(s, d, "lineitem")
      .join(Tables(s, d, "supplier").select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables(s, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(Exact.fixed(rev, 4)).as("rev_c"))
    nat
      .withColumn("region_c",
        sum(col("rev_c")).over(Window.partitionBy(col("r_name"))))
      .crossJoin(broadcast(nat.agg(sum(col("rev_c")).as("total_c"))))
      .select(col("r_name"), col("n_name"),
        (col("rev_c").cast("double") / lit(10000L)).as("revenue"),
        (col("rev_c").cast("double") / col("region_c").cast("double"))
          .as("share_of_region"),
        (col("region_c").cast("double") / col("total_c").cast("double"))
          .as("region_share_of_total"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q228Sql =
    s"""WITH nat AS (SELECT r_name, n_name,
            CAST(SUM(${Exact.fixedSql(revSql, 4)}) AS BIGINT) AS rev_c
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2),
       w AS (SELECT *, SUM(rev_c) OVER (PARTITION BY r_name) AS region_c,
                       SUM(rev_c) OVER () AS total_c
             FROM nat)
       SELECT r_name, n_name,
         CAST(rev_c AS DOUBLE)/10000 AS revenue,
         CAST(rev_c AS DOUBLE)/CAST(region_c AS DOUBLE) AS share_of_region,
         CAST(region_c AS DOUBLE)/CAST(total_c AS DOUBLE)
           AS region_share_of_total
       FROM w ORDER BY r_name, n_name"""

  /** W1/W2: rank() top-3 orders per market segment. With the orderkey
    * tie-break the window order is total → deterministic. Spark ≥3.5
    * rewrites the rank<=k filter to WindowGroupLimit (pre-shuffle k-limit
    * per group per mapper) — scales to any group size.
    */
  private def q4TopOrdersPerSegment(s: SparkSession, d: String): DataFrame = {
    val joined = Tables(s, d, "orders")
      .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
    TopKOps
      .topKPerGroup(joined, Seq(col("c_mktsegment")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"),
        col("rnk").cast("long").as("rnk"))
      .orderBy(col("c_mktsegment"), col("rnk"))
  }

  private val q4Sql =
    """SELECT c_mktsegment, o_orderkey, o_totalprice, rnk FROM (
       SELECT c_mktsegment, o_orderkey, o_totalprice,
              RANK() OVER (PARTITION BY c_mktsegment
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
       FROM orders JOIN customer ON o_custkey = c_custkey)
       WHERE rnk <= 3 ORDER BY c_mktsegment, rnk"""

  /** J5: left-anti join — customers with no urgent orders (the priority
    * filter keeps the result non-empty on the synthetic data).
    */
  private def q5CustomersNoOrders(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "customer")
      .join(
        Tables(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  // NOT EXISTS (not NOT IN): anti-join semantics under possible NULL keys.
  private val q5Sql =
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderpriority = '1-URGENT')
       ORDER BY c_custkey"""

  /** Left-semi join: customers with ≥1 order, counted per segment. */
  private def q6SegmentsWithOrders(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "customer")
      .join(Tables(s, d, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  private val q6Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders)
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** J3: theta self-join, gated — pairs are *within* a nation (equi key
    * n_nationkey + `<` predicate), so the blow-up is bounded per key
    * instead of a full O(n²) cartesian (SURVEY §7.4 risk 2).
    */
  private def q7SupplierPairs(s: SparkSession, d: String): DataFrame = {
    val sup = Tables(s, d, "supplier")
    val a = sup.select(col("s_suppkey").as("sk1"), col("s_nationkey").as("nk"))
    val b = sup.select(col("s_suppkey").as("sk2"),
      col("s_nationkey").as("nk2"))
    a.join(b, col("nk") === col("nk2") && col("sk1") < col("sk2"))
      .groupBy(col("nk").as("s_nationkey"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("s_nationkey"))
  }

  private val q7Sql =
    """SELECT a.s_nationkey, COUNT(*) AS n_pairs
       FROM supplier a JOIN supplier b
         ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
       GROUP BY a.s_nationkey ORDER BY a.s_nationkey"""

  /** A7: pivot/crosstab — order counts status × priority. Explicit pivot
    * value list keeps the schema static (no extra pass to discover
    * values) and the SQL mirror uses FILTERed counts for the same shape.
    */
  // Pivot values mapped to parquet-safe output column names (raw values
  // contain spaces, which the parquet writer rejects as column names).
  private val priorities = Seq(
    "1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high",
    "3-MEDIUM" -> "p3_medium", "4-NOT SPECIFIED" -> "p4_not_specified",
    "5-LOW" -> "p5_low")

  private def q8StatusPriorityPivot(s: SparkSession, d: String): DataFrame = {
    val pv = Tables(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", priorities.map(_._1))
      .count()
    val filled = priorities.foldLeft(pv) { case (df, (raw, safe)) =>
      df.withColumn(safe, coalesce(col(s"`$raw`"), lit(0L))).drop(raw)
    }
    filled.orderBy(col("o_orderstatus"))
  }

  private val q8Sql = {
    val cols = priorities
      .map { case (raw, safe) =>
        s"COUNT(*) FILTER (WHERE o_orderpriority = '$raw') AS $safe"
      }
      .mkString(",\n       ")
    s"""SELECT o_orderstatus, $cols
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""
  }

  /** P8: when/otherwise conditional bucketing + exact grouped sum. */
  private def q9OrderSizeClass(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "orders")
      .withColumn("size_class",
        when(col("o_totalprice") < 10000.0, "small")
          .when(col("o_totalprice") < 100000.0, "medium")
          .otherwise("large"))
      .groupBy(col("size_class"))
      .agg(
        count(lit(1)).as("n_orders"),
        Exact.sumFixed(col("o_totalprice"), 2).as("sum_price"))
      .orderBy(col("size_class"))

  private val q9Sql =
    s"""SELECT CASE WHEN o_totalprice < 10000.0 THEN 'small'
                    WHEN o_totalprice < 100000.0 THEN 'medium'
                    ELSE 'large' END AS size_class,
       COUNT(*) AS n_orders,
       ${Exact.sumFixedSql("o_totalprice", 2)} AS sum_price
       FROM orders GROUP BY 1 ORDER BY size_class"""

  /** A10: distinct. */
  private def q10DistinctSegments(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "customer")
      .select(col("c_mktsegment")).distinct()
      .orderBy(col("c_mktsegment"))

  private val q10Sql =
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"

  /** U1/U2: union of two filtered branches, then aggregate. */
  private def q11UnionBranches(s: SparkSession, d: String): DataFrame = {
    val o = Tables(s, d, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
    val pricey = o.filter(col("o_totalprice") > 400000.0)
    urgent.unionByName(pricey)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("o_orderstatus"))
  }

  private val q11Sql =
    """SELECT o_orderstatus, COUNT(*) AS n_rows FROM (
         SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
         UNION ALL
         SELECT * FROM orders WHERE o_totalprice > 400000.0)
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** hw0_3 parity: min-max normalize (broadcast 1-row bounds, no
    * empty-partition window). Per-row FP ops on exact doubles →
    * bit-identical to the oracle.
    */
  private def q12MinmaxNormalize(s: SparkSession, d: String): DataFrame =
    StatsOps
      .minMaxNormalize(Tables(s, d, "lineitem"), "l_extendedprice", "norm_price")
      .select(col("l_orderkey"), col("l_linenumber"), col("norm_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q12Sql =
    """SELECT l_orderkey, l_linenumber,
              (l_extendedprice - __mn)/(__mx - __mn) AS norm_price
       FROM lineitem, (SELECT MIN(l_extendedprice) AS __mn,
                              MAX(l_extendedprice) AS __mx FROM lineitem)
       ORDER BY l_orderkey, l_linenumber"""

  /** Rollup (grouping-sets family; SURVEY §2.4 noted absent in reference
    * — added as a first-class extension). NULL subtotal keys coalesced to
    * 'ALL' so both engines sort/compare identically.
    */
  private def q13Rollup(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"))
      .orderBy(col("status"), col("priority"))

  private val q13Sql =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
              COALESCE(o_orderpriority, 'ALL') AS priority,
              COUNT(*) AS n_orders
       FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
       ORDER BY status, priority"""

  /** q167: CUBE — the last member of the grouping family (rollup q13,
    * grouping sets q81): all four (status, priority) marginal
    * combinations in one pass. Like ROLLUP it plans as a single
    * Expand + aggregate — the 4× row expansion happens map-side and
    * partial-aggregates before the shuffle, so the cost at scale is
    * one fact pass, not four queries. `grouping_id` disambiguates a
    * genuine NULL key from a subtotal row.
    */
  private def q167Cube(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Exact.sumFixed(col("o_totalprice"), 2).as("revenue"),
        grouping_id().cast("long").as("gid"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n_orders"), col("revenue"))
      .orderBy(col("gid"), col("status"), col("priority"))

  private val q167Sql =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
              COALESCE(o_orderpriority, 'ALL') AS priority,
              CAST(GROUPING(o_orderstatus) * 2
                   + GROUPING(o_orderpriority) AS BIGINT) AS gid,
              COUNT(*) AS n_orders,
              ${Exact.sumFixedSql("o_totalprice", 2)} AS revenue
       FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
       ORDER BY gid, status, priority"""

  /** q169: UNPIVOT/melt — the inverse of q8's pivot, as the
    * first-class `Dataset.unpivot` operator (Spark ≥3.4): the four
    * lineitem measures melt into (measure, value) long form, then a
    * per-measure stats pass. Unpivot is a zero-shuffle row generator
    * (each input row emits |measures| rows map-side), so melt + agg
    * costs one fact pass — the long-form reshape feeding generic
    * per-metric monitoring without |measures| separate scans.
    */
  private def q169Unpivot(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "measure",
        valueColumnName = "value")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"),
        Exact.sumFixed(col("value"), 6).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("measure"))

  private val q169Sql =
    s"""WITH long AS (
         SELECT 'l_quantity' AS measure, l_quantity AS value
         FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice', l_extendedprice FROM lineitem
         UNION ALL
         SELECT 'l_discount', l_discount FROM lineitem
         UNION ALL
         SELECT 'l_tax', l_tax FROM lineitem)
       SELECT measure, COUNT(*) AS n,
              ${Exact.sumFixedSql("value", 6)} AS sum_value,
              MIN(value) AS min_value, MAX(value) AS max_value
       FROM long GROUP BY measure ORDER BY measure"""

  /** q87: PII-style masking — the scrub step a training-data pipeline
    * runs over identifier-bearing columns before anything leaves the
    * trust boundary: flag values matching the ID pattern, count the
    * digit payload, and emit a structure-preserving mask (all digits
    * starred except the last 3, so joins on masked data still
    * distinguish records without exposing the full identifier).
    * Pure per-row regex/substring expressions — shuffle-free,
    * codegen'd, linear at any scale.
    */
  private def q87PiiMask(s: SparkSession, d: String): DataFrame = {
    val name = col("c_name")
    val len = length(name)
    val masked = concat(
      regexp_replace(substring(name, lit(1), len - 3), "[0-9]", "*"),
      substring(name, len - 2, lit(3)))
    Tables(s, d, "customer").select(
      col("c_custkey"),
      name.rlike("^Customer#[0-9]+$").as("is_id_format"),
      length(regexp_replace(name, "[^0-9]", "")).cast("long")
        .as("n_digits"),
      when(len >= 3, masked).otherwise(name).as("masked"))
      .orderBy(col("c_custkey"))
  }

  private val q87Sql =
    """SELECT c_custkey,
         regexp_matches(c_name, '^Customer#[0-9]+$') AS is_id_format,
         CAST(length(regexp_replace(c_name, '[^0-9]', '', 'g')) AS BIGINT)
           AS n_digits,
         CASE WHEN length(c_name) >= 3 THEN
           regexp_replace(substr(c_name, 1, length(c_name) - 3),
             '[0-9]', '*', 'g') ||
           substr(c_name, length(c_name) - 2, 3)
         ELSE c_name END AS masked
       FROM customer ORDER BY c_custkey"""

  /** q92: PII scrub BREADTH — q87's sibling covering the identifier
    * shapes real scrubs hit most: emails, phone numbers, URLs, IPv4
    * addresses ([[graft.ops.TextOps.piiPatterns]], one shared pattern
    * table driving both the masking chain and the per-type hit
    * counts). The contact text is synthesized deterministically from
    * row fields — with per-row VARYING pii mix (phone only for
    * custkey%3==0, ip for %2==0, a second email for %5==0) so the hit
    * counts actually exercise the counters. Counting happens BEFORE
    * masking; everything is per-row regex — shuffle-free, codegen'd,
    * linear at 100 TB.
    */
  private def q92PiiScrub(s: SparkSession, d: String): DataFrame = {
    import graft.ops.TextOps
    val key = col("c_custkey")
    val keyS = key.cast("string")
    val raw = concat(
      lit("contact "), col("c_name"),
      lit(" email user"), keyS, lit("@mail.example.com"),
      when(key % 5 === 0,
        concat(lit(" cc admin"), keyS, lit("@example.org")))
        .otherwise(lit("")),
      lit(" site https://example.com/u/"), keyS,
      when(key % 3 === 0,
        concat(lit(" phone +1-555-010-"),
          lpad((key % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(key % 2 === 0,
        concat(lit(" ip 10.0."),
          // `div` = true integer division, mirroring DuckDB `//`
          expr("(CAST(c_custkey AS BIGINT) div 256) % 256").cast("string"),
          lit("."), (key % 256).cast("string")))
        .otherwise(lit("")))
    val hitCols = TextOps.piiPatterns.map { case (n, p, _) =>
      TextOps.piiHits(col("raw"), p).as(s"n_${n}s")
    }
    Tables(s, d, "customer")
      .select(key.as("c_custkey"), raw.as("raw"))
      .select(Seq(col("c_custkey")) ++ hitCols :+
        TextOps.scrubPii(col("raw")).as("scrubbed"): _*)
      .orderBy(col("c_custkey"))
  }

  private val q92Sql = {
    import graft.ops.TextOps
    val raw =
      """'contact ' || c_name ||
         ' email user' || CAST(c_custkey AS VARCHAR) || '@mail.example.com' ||
         CASE WHEN c_custkey % 5 = 0
           THEN ' cc admin' || CAST(c_custkey AS VARCHAR) || '@example.org'
           ELSE '' END ||
         ' site https://example.com/u/' || CAST(c_custkey AS VARCHAR) ||
         CASE WHEN c_custkey % 3 = 0
           THEN ' phone +1-555-010-' ||
                lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
           ELSE '' END ||
         CASE WHEN c_custkey % 2 = 0
           THEN ' ip 10.0.' ||
                CAST((CAST(c_custkey AS BIGINT) // 256) % 256 AS VARCHAR) ||
                '.' || CAST(c_custkey % 256 AS VARCHAR)
           ELSE '' END"""
    val hits = TextOps.piiPatterns.map { case (n, p, _) =>
      s"${TextOps.piiHitsSql("raw", p)} AS n_${n}s"
    }.mkString(", ")
    s"""WITH b AS (SELECT c_custkey, $raw AS raw FROM customer)
       SELECT c_custkey, $hits, ${TextOps.scrubPiiSql("raw")} AS scrubbed
       FROM b ORDER BY c_custkey"""
  }

  /** q81: GROUPING SETS — the general form of the rollup/cube family
    * (q13 covers ROLLUP): explicit set list with `grouping_id`
    * disambiguating the aggregation level (both engines use the same
    * first-arg-is-MSB bit convention). Expressed through `spark.sql`
    * over a temp view — the SQL entry point is part of the engine's
    * API surface, and GROUPING SETS has no DataFrame-side builder.
    * One pass, partial-aggregated like any hash aggregate.
    */
  private def q81GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables(s, d, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT)
                 AS gid,
               COUNT(1) AS n_orders
         FROM orders_gs
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                 (o_orderstatus, o_orderpriority))
         ORDER BY status, priority, gid""")
  }

  private val q81Sql =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
              COALESCE(o_orderpriority, 'ALL') AS priority,
              CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
                AS gid,
              CAST(COUNT(*) AS BIGINT) AS n_orders
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                               (o_orderstatus, o_orderpriority))
       ORDER BY status, priority, gid"""

  /** TPC-H Q3-style shipping priority: selective dim filters pushed to
    * parquet, join, grouped exact revenue, global top-10 via
    * TakeOrderedAndProject.
    */
  private def q14ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cut = to_timestamp(lit("1997-06-30 00:00:00"))
    val c = Tables(s, d, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables(s, d, "orders").filter(col("o_orderdate") < cut)
    val l = Tables(s, d, "lineitem").filter(col("l_shipdate") > cut)
    val agg = l
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderpriority"))
      .agg(Exact.sumFixed(rev, 4).as("revenue"))
    TopKOps.topN(agg,
      Seq(col("revenue").desc, col("l_orderkey").asc), 10)
  }

  private val q14Sql =
    s"""SELECT l_orderkey, o_orderpriority,
       ${Exact.sumFixedSql(revSql, 4)} AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
         AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
       GROUP BY l_orderkey, o_orderpriority
       ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"""

  /** TPC-H Q5-style local-supplier volume: 5-way join where supplier and
    * customer must share the nation (extra equi predicate), region
    * filter pushed through two broadcast dims.
    */
  private def q15LocalSupplierVolume(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "lineitem")
      .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables(s, d, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables(s, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, d, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").isin("ASIA", "AMERICA"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(Exact.sumFixed(rev, 4).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))

  private val q15Sql =
    s"""SELECT r_name, n_name, ${Exact.sumFixedSql(revSql, 4)} AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name IN ('ASIA', 'AMERICA')
       GROUP BY r_name, n_name ORDER BY r_name, n_name"""

  /** A9: grouped mean (hw4 avg-rating shape) on part price per brand. */
  private def q16AvgPriceByBrand(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "part")
      .groupBy(col("p_brand"))
      .agg(
        Exact.avgFixed(col("p_retailprice"), 2).as("avg_price"),
        count(lit(1)).as("n_parts"))
      .orderBy(col("p_brand"))

  private val q16Sql =
    s"""SELECT p_brand, ${Exact.avgFixedSql("p_retailprice", 2)} AS avg_price,
       COUNT(*) AS n_parts FROM part GROUP BY p_brand ORDER BY p_brand"""

  /** U-extensions: INTERSECT / EXCEPT (SURVEY §2.7 noted absent in the
    * reference — first-class here): nations present in both customer
    * and supplier bases vs customer-only.
    */
  private def q18NationSetops(s: SparkSession, d: String): DataFrame = {
    val cn = Tables(s, d, "customer")
      .select(col("c_nationkey").as("nk")).distinct()
    val sn = Tables(s, d, "supplier")
      .select(col("s_nationkey").as("nk")).distinct()
    cn.intersect(sn).withColumn("which", lit("both"))
      .unionByName(cn.except(sn).withColumn("which", lit("customer_only")))
      .select(col("which"), col("nk"))
      .orderBy(col("which"), col("nk"))
  }

  private val q18Sql =
    """SELECT 'both' AS which, nk FROM
         (SELECT DISTINCT c_nationkey AS nk FROM customer
          INTERSECT
          SELECT DISTINCT s_nationkey FROM supplier)
       UNION ALL
       SELECT 'customer_only' AS which, nk FROM
         (SELECT DISTINCT c_nationkey AS nk FROM customer
          EXCEPT
          SELECT DISTINCT s_nationkey FROM supplier)
       ORDER BY which, nk"""

  /** Typed-Aggregator UDAF (graft.ops.ExactWeightedMean): size-weighted
    * mean retail price per brand, exact fixed-point accumulation —
    * order-independent, hence oracle-mirrorable ANSI SQL.
    */
  private def q49WeightedAvgPrice(s: SparkSession, d: String): DataFrame = {
    val wmean = udaf(new graft.ops.ExactWeightedMean(2))
    Tables(s, d, "part")
      .groupBy(col("p_brand"))
      .agg(
        wmean(col("p_retailprice"), col("p_size").cast("long"))
          .as("wavg_price"),
        sum(col("p_size").cast("long")).as("sum_weight"))
      .orderBy(col("p_brand"))
  }

  private val q49Sql =
    s"""SELECT p_brand,
       ${graft.ops.ExactWeightedMean.sql("p_retailprice", "p_size", 2)}
         AS wavg_price,
       CAST(SUM(p_size) AS BIGINT) AS sum_weight
       FROM part GROUP BY p_brand ORDER BY p_brand"""

  /** Exact discrete median per group via window rank — integer-rank
    * logic, no interpolation-formula FP hazards, identical on both
    * engines. At scale this is one shuffle + per-group sort; for a
    * quantile *sketch* over 100 TB see q73.
    */
  private def q72MedianByStatus(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_orderstatus"))))
      .filter(col("rn") === expr("(n + 1) DIV 2")) // integer div: `/` on
      // longs is double division and misses even-sized groups
      .select(col("o_orderstatus"), col("o_totalprice").as("median_price"),
        col("n").as("n_orders"))
      .orderBy(col("o_orderstatus"))
  }

  private val q72Sql =
    """SELECT o_orderstatus, o_totalprice AS median_price, n AS n_orders
       FROM (SELECT o_orderstatus, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
             FROM orders)
       WHERE rn = (n + 1) // 2
       ORDER BY o_orderstatus"""

  /** Quantile sketch (percentile_approx — mergeable, single pass, the
    * 100 TB path the exact window median can't take). Gate edge: the
    * sketch internals are engine-specific but the RANK-ERROR CONTRACT
    * is not — with accuracy 10000 the returned value's rank is within
    * ~N/10000 of the target, so the verdict "approx lies between the
    * exact values at ranks target±t" (t = 1 + 2N div 10000, doubled
    * for headroom) is deterministic for fixed data and hash-checked;
    * the oracle asserts it as the constant 1. Values at rank k of the
    * sorted multiset are well-defined regardless of row_number tie
    * order, so the bounds are total-order-free.
    */
  private def q73ApproxQuantiles(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val appr = Tables(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
          .as("p50_approx"),
        percentile_approx(col("o_totalprice"), lit(0.95), lit(10000))
          .as("p95_approx"),
        count(lit(1)).as("n_orders"))
    val ranked = Tables(s, d, "orders")
      .select(col("o_orderstatus"), col("o_totalprice"))
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"))))
    val bounds = ranked
      .join(broadcast(appr.select(col("o_orderstatus"), col("n_orders"))),
        Seq("o_orderstatus"))
      .withColumn("t", lit(1L) + expr("(2*n_orders) div 10000"))
      .withColumn("r50", expr("(n_orders + 1) div 2"))
      .withColumn("r95", expr("(95*n_orders + 99) div 100"))
      .groupBy(col("o_orderstatus"))
      .agg(
        min(when(col("rn") >= col("r50") - col("t") &&
          col("rn") <= col("r50") + col("t"), col("o_totalprice")))
          .as("lo50"),
        max(when(col("rn") >= col("r50") - col("t") &&
          col("rn") <= col("r50") + col("t"), col("o_totalprice")))
          .as("hi50"),
        min(when(col("rn") >= col("r95") - col("t") &&
          col("rn") <= col("r95") + col("t"), col("o_totalprice")))
          .as("lo95"),
        max(when(col("rn") >= col("r95") - col("t") &&
          col("rn") <= col("r95") + col("t"), col("o_totalprice")))
          .as("hi95"))
    appr.join(bounds, Seq("o_orderstatus"))
      .select(col("o_orderstatus"), col("n_orders"),
        when(col("p50_approx") >= col("lo50") &&
          col("p50_approx") <= col("hi50"), lit(1L)).otherwise(lit(0L))
          .as("p50_in_bounds"),
        when(col("p95_approx") >= col("lo95") &&
          col("p95_approx") <= col("hi95"), lit(1L)).otherwise(lit(0L))
          .as("p95_in_bounds"))
      .orderBy(col("o_orderstatus"))
  }

  private val q73Sql =
    """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
              CAST(1 AS BIGINT) AS p50_in_bounds,
              CAST(1 AS BIGINT) AS p95_in_bounds
       FROM orders GROUP BY 1 ORDER BY 1"""

  /** q39: salted fact⋈dim join through the oracle gate — the salt must
    * be semantically invisible, so the DuckDB mirror is the PLAIN join:
    * any divergence (a dropped/duplicated row from the salt/replicate
    * transform) hash-mismatches. This is the explicit-salting path for
    * the single-hot-key skew AQE can't split
    * ([[graft.ops.SkewOps.saltedInnerJoin]]).
    */
  private def q39SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val dim = Tables(s, d, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    graft.ops.SkewOps
      .saltedInnerJoin(Tables(s, d, "lineitem"), dim, "l_partkey", 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        Exact.sumFixed(col("l_extendedprice"), 2).as("sum_price"))
      .orderBy(col("p_brand"))
  }

  private val q39Sql =
    s"""SELECT p_brand, COUNT(*) AS n_items,
         ${Exact.sumFixedSql("l_extendedprice", 2)} AS sum_price
       FROM lineitem JOIN part ON p_partkey = l_partkey
       GROUP BY p_brand ORDER BY p_brand"""

  /** q116: data-quality constraint report ([[graft.ops.CheckOps]]) —
    * the Deequ-shaped validation pass before trusting an ingest: six
    * declarative checks (PK uniqueness, two FK integrities,
    * completeness, two value-range predicates) each as ONE linear
    * aggregate, unioned into a uniform (check, n_rows, n_violations,
    * passed) report. The synthetic tables are clean, so the value is
    * the report machinery itself — on a real ingest the same six
    * lines gate the load.
    */
  private def q116DataChecks(s: SparkSession, d: String): DataFrame = {
    import graft.ops.CheckOps
    val orders = Tables(s, d, "orders")
    val lineitem = Tables(s, d, "lineitem")
    val customer = Tables(s, d, "customer")
    CheckOps.uniqueness(orders, Seq("o_orderkey"), "orders_pk_unique")
      .unionAll(CheckOps.referential(orders, "o_custkey",
        customer, "c_custkey", "orders_custkey_fk"))
      .unionAll(CheckOps.referential(lineitem, "l_orderkey",
        orders, "o_orderkey", "lineitem_orderkey_fk"))
      .unionAll(CheckOps.completeness(lineitem, "l_quantity",
        "lineitem_quantity_complete"))
      .unionAll(CheckOps.predicate(lineitem,
        col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0,
        "lineitem_quantity_range"))
      .unionAll(CheckOps.predicate(lineitem,
        col("l_discount") >= 0.0 && col("l_discount") <= 0.1,
        "lineitem_discount_range"))
      .orderBy(col("check_name"))
  }

  private val q116Sql =
    """WITH u AS (SELECT 'orders_pk_unique' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
             AS n_violations
         FROM orders),
       fk1 AS (SELECT 'orders_custkey_fk',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
             AS BIGINT)
         FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
           ON c.c_custkey = o.o_custkey),
       fk2 AS (SELECT 'lineitem_orderkey_fk',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
             AS BIGINT)
         FROM lineitem l
         LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
           ON o.o_orderkey = l.l_orderkey),
       comp AS (SELECT 'lineitem_quantity_complete',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
             AS BIGINT)
         FROM lineitem),
       rng1 AS (SELECT 'lineitem_quantity_range',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_quantity >= 1.0 AND l_quantity <= 50.0
             THEN 0 ELSE 1 END) AS BIGINT)
         FROM lineitem),
       rng2 AS (SELECT 'lineitem_discount_range',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.1
             THEN 0 ELSE 1 END) AS BIGINT)
         FROM lineitem),
       rpt AS (SELECT * FROM u UNION ALL SELECT * FROM fk1
         UNION ALL SELECT * FROM fk2 UNION ALL SELECT * FROM comp
         UNION ALL SELECT * FROM rng1 UNION ALL SELECT * FROM rng2)
       SELECT check_name, n_rows, n_violations, n_violations = 0 AS passed
       FROM rpt ORDER BY check_name"""

  /** P12: seeded sampling — RNG is engine-specific, so this is a
    * rows-only check (no oracle entry; driver verifies rows > 0).
    */
  private def q17Sample(s: SparkSession, d: String): DataFrame = {
    val total = Tables(s, d, "lineitem").count()
    Tables(s, d, "lineitem")
      .sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .agg(count(lit(1)).as("n_sampled"),
        Exact.sumFixed(col("l_quantity"), 2).as("sum_qty"))
      // self-verdict: a Bernoulli(0.1) sample lands within ±30% of the
      // expected size (p=0.1, n≥6000 ⇒ that band is >8 sigma — a flip
      // means broken sampling, not bad luck)
      .withColumn("verdict",
        (col("n_sampled") >= (total * 0.07).toLong &&
          col("n_sampled") <= (total * 0.13).toLong).cast("long"))
  }

  override val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary,
    "q2_col_stats" -> q2ColStats,
    "q3_revenue_by_nation" -> q3RevenueByNation,
    "q156_tpch_q5_region" -> q156TpchQ5Region,
    "q158_small_qty_revenue" -> q158SmallQtyRevenue,
    "q188_disjunctive_revenue" -> q188DisjunctiveRevenue,
    "q159_large_volume_orders" -> q159LargeVolumeOrders,
    "q160_supplier_waiting" -> q160SupplierWaiting,
    "q161_acctbal_prospects" -> q161AcctbalProspects,
    "q210_min_cost_supplier" -> q210MinCostSupplier,
    "q211_excess_stock" -> q211ExcessStock,
    "q212_top_supplier" -> q212TopSupplier,
    "q213_priority_exists_count" -> q213PriorityExistsCount,
    "q214_nation_volume_flows" -> q214NationVolumeFlows,
    "q215_market_share" -> q215MarketShare,
    "q216_product_profit" -> q216ProductProfit,
    "q217_returned_items" -> q217ReturnedItems,
    "q218_important_parts" -> q218ImportantParts,
    "q219_late_shipment_priority" -> q219LateShipmentPriority,
    "q220_customer_order_distribution" -> q220CustomerOrderDistribution,
    "q221_promo_revenue_share" -> q221PromoRevenueShare,
    "q222_part_supplier_counts" -> q222PartSupplierCounts,
    "q237_shipping_priority" -> q237ShippingPriority,
    "q225_forecast_revenue" -> q225ForecastRevenue,
    "q228_percent_of_parent" -> q228PercentOfParent,
    "q4_top_orders_per_segment" -> q4TopOrdersPerSegment,
    "q5_customers_no_orders" -> q5CustomersNoOrders,
    "q6_segments_with_orders" -> q6SegmentsWithOrders,
    "q7_supplier_pairs" -> q7SupplierPairs,
    "q8_status_priority_pivot" -> q8StatusPriorityPivot,
    "q9_order_size_class" -> q9OrderSizeClass,
    "q10_distinct_segments" -> q10DistinctSegments,
    "q11_union_branches" -> q11UnionBranches,
    "q12_minmax_normalize" -> q12MinmaxNormalize,
    "q13_rollup" -> q13Rollup,
    "q81_grouping_sets" -> q81GroupingSets,
    "q167_cube" -> q167Cube,
    "q169_unpivot" -> q169Unpivot,
    "q87_pii_mask" -> q87PiiMask,
    "q92_pii_scrub" -> q92PiiScrub,
    "q14_shipping_priority" -> q14ShippingPriority,
    "q15_local_supplier_volume" -> q15LocalSupplierVolume,
    "q16_avg_price_by_brand" -> q16AvgPriceByBrand,
    "q17_sample" -> q17Sample,
    "q18_nation_setops" -> q18NationSetops,
    "q39_salted_join" -> q39SaltedJoin,
    "q49_weighted_avg_price" -> q49WeightedAvgPrice,
    "q72_median_by_status" -> q72MedianByStatus,
    "q73_approx_quantiles" -> q73ApproxQuantiles,
    "q116_data_checks" -> q116DataChecks)

  override val oracle: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q2_col_stats" -> q2Sql,
    "q3_revenue_by_nation" -> q3Sql,
    "q156_tpch_q5_region" -> q156Sql,
    "q158_small_qty_revenue" -> q158Sql,
    "q188_disjunctive_revenue" -> q188Sql,
    "q159_large_volume_orders" -> q159Sql,
    "q160_supplier_waiting" -> q160Sql,
    "q161_acctbal_prospects" -> q161Sql,
    "q210_min_cost_supplier" -> q210Sql,
    "q211_excess_stock" -> q211Sql,
    "q212_top_supplier" -> q212Sql,
    "q213_priority_exists_count" -> q213Sql,
    "q214_nation_volume_flows" -> q214Sql,
    "q215_market_share" -> q215Sql,
    "q216_product_profit" -> q216Sql,
    "q217_returned_items" -> q217Sql,
    "q218_important_parts" -> q218Sql,
    "q219_late_shipment_priority" -> q219Sql,
    "q220_customer_order_distribution" -> q220Sql,
    "q221_promo_revenue_share" -> q221Sql,
    "q222_part_supplier_counts" -> q222Sql,
    "q237_shipping_priority" -> q237Sql,
    "q225_forecast_revenue" -> q225Sql,
    "q228_percent_of_parent" -> q228Sql,
    "q4_top_orders_per_segment" -> q4Sql,
    "q5_customers_no_orders" -> q5Sql,
    "q6_segments_with_orders" -> q6Sql,
    "q7_supplier_pairs" -> q7Sql,
    "q8_status_priority_pivot" -> q8Sql,
    "q9_order_size_class" -> q9Sql,
    "q10_distinct_segments" -> q10Sql,
    "q11_union_branches" -> q11Sql,
    "q12_minmax_normalize" -> q12Sql,
    "q13_rollup" -> q13Sql,
    "q81_grouping_sets" -> q81Sql,
    "q167_cube" -> q167Sql,
    "q169_unpivot" -> q169Sql,
    "q87_pii_mask" -> q87Sql,
    "q92_pii_scrub" -> q92Sql,
    "q14_shipping_priority" -> q14Sql,
    "q15_local_supplier_volume" -> q15Sql,
    "q16_avg_price_by_brand" -> q16Sql,
    "q18_nation_setops" -> q18Sql,
    "q39_salted_join" -> q39Sql,
    "q49_weighted_avg_price" -> q49Sql,
    "q72_median_by_status" -> q72Sql,
    "q73_approx_quantiles" -> q73Sql,
    "q116_data_checks" -> q116Sql)
}
