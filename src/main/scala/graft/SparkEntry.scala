package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Engine
import graft.model.TsdbContext

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry returns a DataFrame whose columns (names AND
  * values) must match the DuckDB result of the corresponding `oracleSql`
  * entry run over the same parquet tables. Conventions for cross-engine
  * hash-parity:
  *   - timestamps are emitted as `ts_us` (Long µs since epoch): Spark
  *     reads the ns parquet as Long (nanosAsLong) and divides; DuckDB
  *     truncates ns→µs on read, so `epoch_us(ts)` matches exactly.
  *   - doubles are `round(x, 6)` on both sides.
  *   - every query is totally ordered by an ORDER BY on its key columns.
  */
object SparkEntry {

  private def engineFor(spark: SparkSession, dir: String): Engine =
    new Engine(TsdbContext.fromTestdata(spark, dir))

  /** µs view of the engine's Long-ns ts column, oracle-comparable. */
  private def usView(df: DataFrame, valueCols: Seq[String] = Seq("value")): DataFrame = {
    val cols = df.columns.map {
      case "ts" => expr("ts div 1000").as("ts_us")
      case c if valueCols.contains(c) => round(col(c), 6).as(c)
      case c => col(c)
    }
    df.select(cols.toSeq: _*)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H style aggregate over lineitem (flagship correctness + bench)
    "q1_pricing_summary" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 6).as("sum_qty"),
          round(sum(col("l_extendedprice")), 6).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TSDB select scan: all series of one metric in a time range,
    // series order (SURVEY §2.1 SELECT)
    "ts_select_scan" -> ((s, dir) => {
      val e = engineFor(s, dir)
      usView(e.execute(
        """{"select": "purchase",
            "range": {"from": "20240101T000000", "to": "20240401T000000"},
            "order-by": "series"}"""))
    }),

    // TSDB whole-range aggregate (SURVEY §2.1 AGGREGATE)
    "ts_aggregate_sum" -> ((s, dir) => {
      val e = engineFor(s, dir)
      usView(e.execute("""{"aggregate": {"purchase": "sum"}}"""))
        .orderBy("series")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 6) AS sum_qty,
           round(sum(l_extendedprice), 6) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "ts_select_scan" ->
      """SELECT concat(event_type, ' user=', CAST(user_id AS VARCHAR)) AS series,
           epoch_us(ts) AS ts_us, round(value, 6) AS value
         FROM events
         WHERE event_type = 'purchase'
           AND epoch_ns(ts) >= 1704067200000000000 AND epoch_ns(ts) < 1711929600000000000
         ORDER BY series, ts_us""",

    "ts_aggregate_sum" ->
      """SELECT concat(event_type, ':sum user=', CAST(user_id AS VARCHAR)) AS series,
           min(epoch_us(ts)) AS ts_us, round(sum(value), 6) AS value
         FROM events
         WHERE event_type = 'purchase'
         GROUP BY event_type, user_id
         ORDER BY series""")
}
