package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.entries.{CurationEntries, ExtraEntries, PipelineEntries, Round2Entries, Round3Entries, Round4Entries, Round5Entries, Round6Entries, Round6bEntries, Round7Entries, Round8Entries, Round9Entries, Round10Entries, Round11Entries, Round12Entries, Round13Entries, Round14Entries, TsdbEntries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry returns a DataFrame whose columns (names AND
  * values) must match the DuckDB result of the corresponding `oracleSql`
  * entry run over the same parquet tables; conventions in
  * [[graft.entries.EntryUtil]]. The operator inventory lives in the
  * entry modules: [[graft.entries.TsdbEntries]] (SURVEY §2 TSDB surface).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TsdbEntries.queries ++ PipelineEntries.queries ++ ExtraEntries.queries ++
      Round2Entries.queries ++ Round3Entries.queries ++ Round4Entries.queries ++
      Round5Entries.queries ++ Round6Entries.queries ++ Round6bEntries.queries ++
      Round7Entries.queries ++ Round8Entries.queries ++ Round9Entries.queries ++
      Round10Entries.queries ++ Round11Entries.queries ++ Round12Entries.queries ++
      Round13Entries.queries ++ Round14Entries.queries ++
      CurationEntries.queries ++
      Map[String, (SparkSession, String) => DataFrame](
      // TPC-H style aggregate over lineitem (flagship correctness + bench)
      "q1_pricing_summary" -> ((s, dir) => {
        s.read.parquet(s"$dir/lineitem.parquet")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            // money sums reach ~5e9 at sf0.1: parallel summation order puts
            // ~1e-5 noise on them, so compare at integer precision; the
            // per-row averages stay at round(6)
            round(sum(col("l_quantity")), 0).as("sum_qty"),
            round(sum(col("l_extendedprice")), 0).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 0).as("sum_disc_price"),
            round(avg(col("l_quantity")), 6).as("avg_qty"),
            round(avg(col("l_discount")), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      }),
      // TPC-H Q3 shape: fact-fact join on the order key with the filtered
      // customer dimension BROADCAST (the plan a 100 TB run needs — no
      // shuffle of lineitem for a dimension lookup); top-10 by rounded
      // revenue with full tie-break so the limit cut is deterministic
      "q3_shipping_priority" -> ((s, dir) => {
        val cust = s.read.parquet(s"$dir/customer.parquet")
          .where(col("c_mktsegment") === "BUILDING")
        val ord = s.read.parquet(s"$dir/orders.parquet")
          .where(col("o_orderdate") < "1997-01-01")
        val li = s.read.parquet(s"$dir/lineitem.parquet")
          .where(col("l_shipdate") > "1997-01-01")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
            .as("revenue"))
          // parquet TIMESTAMP here reads as NTZ; session TZ is UTC, so the
          // cast is the identity instant DuckDB's epoch_us sees
          .select(col("l_orderkey"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us"),
            col("revenue"))
          .orderBy(col("revenue").desc, col("o_date_us"), col("l_orderkey"))
          .limit(10)
      }),
      // TPC-H Q5 shape: local-supplier revenue by nation — lineitem joins
      // orders on the fact key while customer/supplier/nation/region all
      // BROADCAST (supplier carries the s_nationkey = c_nationkey local
      // condition); one partial-aggregated rollup to 5 nation rows
      "q5_local_supplier" -> ((s, dir) => {
        def t(n: String) = s.read.parquet(s"$dir/$n.parquet")
        val ord = t("orders").where(col("o_orderdate") >= "1996-01-01" &&
          col("o_orderdate") < "1997-01-01")
        t("lineitem")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t("customer")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
          .where(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }),
      // TPC-H Q17 shape: revenue lost to small-quantity orders — the
      // correlated per-part average decorrelates to ONE pass: broadcast
      // semi-join lineitem to the brand's parts (1/25 selectivity before
      // any shuffle), then a window avg per part on the surviving subset
      // (one hash shuffle of the reduced data; no second lineitem scan)
      "q17_small_qty_revenue" -> ((s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val pBrand = s.read.parquet(s"$dir/part.parquet")
          .where(col("p_brand") === "Brand#23").select("p_partkey")
        val li = s.read.parquet(s"$dir/lineitem.parquet")
          .join(broadcast(pBrand), col("l_partkey") === col("p_partkey"))
        li.withColumn("__cut",
            avg(col("l_quantity")).over(Window.partitionBy("p_partkey")) * 0.2)
          .where(col("l_quantity") < col("__cut"))
          // money sum ~1e8 at sf0.1: parallel order noise ~1e-5, so
          // compare at cent precision (same rationale as q1's round(0))
          .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
      }),
      // TPC-H Q18 shape: large-volume customers — the HAVING set from the
      // one real shuffle (partial-aggregated lineitem rollup) is tiny and
      // BROADCASTS twice, so neither orders nor customer ever shuffles
      "q18_large_volume" -> ((s, dir) => {
        val big = s.read.parquet(s"$dir/lineitem.parquet")
          .groupBy(col("l_orderkey"))
          .agg(round(sum(col("l_quantity")), 6).as("total_qty"))
          .where(col("total_qty") > 300)
        val ord = s.read.parquet(s"$dir/orders.parquet")
          .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        s.read.parquet(s"$dir/customer.parquet")
          .join(broadcast(ord), col("c_custkey") === col("o_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us"),
            col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
      }),
      // TPC-H Q14 shape: promo revenue share over one shipping month —
      // conditional + total sums in ONE pass over the month's lineitems
      // with the part dimension broadcast
      "q14_promo_revenue" -> ((s, dir) => {
        val li = s.read.parquet(s"$dir/lineitem.parquet")
          .where(col("l_shipdate") >= "1996-03-01" && col("l_shipdate") < "1996-04-01")
        val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
        li.join(broadcast(s.read.parquet(s"$dir/part.parquet")),
            col("l_partkey") === col("p_partkey"))
          .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
            sum(rev), 6).as("promo_revenue_pct"))
      }))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TsdbEntries.oracle ++ PipelineEntries.oracle ++ ExtraEntries.oracle ++
      Round2Entries.oracle ++ Round3Entries.oracle ++ Round4Entries.oracle ++
      Round5Entries.oracle ++ Round6Entries.oracle ++ Round6bEntries.oracle ++
      Round7Entries.oracle ++ Round8Entries.oracle ++ Round9Entries.oracle ++
      Round10Entries.oracle ++ Round11Entries.oracle ++ Round12Entries.oracle ++
      Round13Entries.oracle ++ Round14Entries.oracle ++
      CurationEntries.oracle ++ Map(
      "q1_pricing_summary" ->
        """SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 0) AS sum_qty,
             round(sum(l_extendedprice), 0) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 0) AS sum_disc_price,
             round(avg(l_quantity), 6) AS avg_qty,
             round(avg(l_discount), 6) AS avg_disc,
             count(*) AS count_order
           FROM lineitem
           GROUP BY l_returnflag, l_linestatus
           ORDER BY l_returnflag, l_linestatus""",
      "q3_shipping_priority" ->
        """SELECT l_orderkey, epoch_us(o_orderdate) AS o_date_us,
             round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < TIMESTAMP '1997-01-01'
             AND l_shipdate > TIMESTAMP '1997-01-01'
           GROUP BY l_orderkey, o_orderdate
           ORDER BY revenue DESC, o_date_us, l_orderkey
           LIMIT 10""",
      "q5_local_supplier" ->
        """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA'
             AND o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1997-01-01'
           GROUP BY n_name
           ORDER BY revenue DESC, n_name""",
      "q17_small_qty_revenue" ->
        """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
           FROM lineitem l JOIN part p ON p_partkey = l_partkey
           WHERE p_brand = 'Brand#23'
             AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = p.p_partkey)""",
      "q18_large_volume" ->
        """SELECT c_name, c_custkey, o_orderkey,
             epoch_us(o_orderdate) AS o_date_us, o_totalprice, total_qty
           FROM orders
           JOIN (SELECT l_orderkey, round(sum(l_quantity), 6) AS total_qty
                 FROM lineitem GROUP BY l_orderkey
                 HAVING round(sum(l_quantity), 6) > 300) b
             ON o_orderkey = b.l_orderkey
           JOIN customer ON c_custkey = o_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           LIMIT 20""",
      "q14_promo_revenue" ->
        """SELECT round(100.0 *
             sum(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-03-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'""")
}
