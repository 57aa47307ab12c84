package graft.entries

import org.apache.spark.sql.functions._

import EntryUtil._

/** Driver-contract entries covering the TSDB query surface (SURVEY §2.1,
  * §2.2, §2.3, §2.6): one `queries`+`oracle` pair per operator/clause.
  * The engine runs real JSON queries; the oracle re-derives the expected
  * result with plain SQL over the raw `events` parquet.
  */
object TsdbEntries {

  val queries: Map[String, QueryFn] = Map(
    // ---- SELECT + clauses -------------------------------------------------
    "ts_select_scan" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "order-by": "series"}"""))),

    "ts_select_filter" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "filter": {"gt": 150}}"""))),

    "ts_select_backward_time" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$ToIso", "to": "$FromIso"},
             "order-by": "time"}"""))),

    "ts_select_limit_offset" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "order-by": "series", "limit": 100, "offset": 50}"""))),

    "ts_select_groupby_tag" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "group-by-tag": ["user"]}"""))),

    "ts_select_where_in" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "where": {"user": ["3", "7", "11"]}}"""))),

    "ts_select_events_regex" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select-events": "!log",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "filter": "\\"k\\": 4[0-9]"}"""), valueCols = Nil)),

    // ---- AGGREGATE: all 11 functions, whole history -----------------------
    // The *_timestamp funcs put the ns timestamp in the double value column
    // (reference payload is float64, same 2^53 precision loss). DuckDB only
    // sees µs on parquet read, so for oracle parity this entry truncates the
    // context's ts to µs first — both engines then cast identical longs.
    "ts_agg_funcs" -> ((s, dir) => {
      // round(huge_double, 6) is lossy in DuckDB (x·1e6 overflows double
      // precision) but identity in Spark — so don't round ns-valued rows
      usView(engineUs(s, dir).execute(
        """{"aggregate": {"purchase": ["min","max","sum","cnt","mean",
             "first","last","min_timestamp","max_timestamp",
             "first_timestamp","last_timestamp"]}}"""), valueCols = Nil)
        .withColumn("value", when(col("series").contains("_timestamp "),
          col("value")).otherwise(round(col("value"), 6)))
    }),

    // ---- GROUP-AGGREGATE --------------------------------------------------
    "ts_group_aggregate" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["min", "max", "cnt"]},
             "range": {"from": "$FromIso", "to": "$ToIso"}}"""),
        valueCols = Seq("min", "max", "cnt"))),

    "ts_group_aggregate_having" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "7d",
                                 "func": ["max", "mean"]},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "filter": {"max": {"gt": 180}}}"""),
        valueCols = Seq("max", "mean"))),

    // ---- JOIN / GROUP-AGGREGATE-JOIN --------------------------------------
    "ts_join" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"join": ["click", "view"],
             "range": {"from": "$FromIso", "to": "$ToIso"}}"""),
        valueCols = Seq("click", "view"))),

    "ts_group_aggregate_join" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"group-aggregate-join": {"metric": ["click", "view"],
                                      "step": "7d", "func": "max"},
             "range": {"from": "$FromIso", "to": "$ToIso"}}"""),
        valueCols = Seq("click", "view"))),

    // ---- APPLY pipeline ---------------------------------------------------
    "ts_apply_rate" -> ((s, dir) =>
      // Δt-sensitive: see EntryUtil.engineUs (DuckDB ts is µs)
      usView(engineUs(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "rate"}]}"""))),

    "ts_apply_cusum" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "cusum"}]}"""))),

    "ts_apply_sma" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "sma", "window-width": 5}]}"""))),

    "ts_apply_cma" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "cma"}]}"""))),

    "ts_apply_abs_scale" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "scale", "weights": [-2.5]},
                       {"name": "abs"}]}"""))),

    "ts_apply_math_sum" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"join": ["click", "view"],
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "sum", "ignore_missing": true}]}"""))),

    // eval over group-aggregate-join output: downsampled bins align, so
    // both slots are populated (raw click/view never share an exact ns
    // timestamp — eval over the raw join returns 0 rows and verifies
    // nothing)
    "ts_apply_eval" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"group-aggregate-join": {"metric": ["click", "view"],
                                      "step": "7d", "func": "max"},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "eval", "expr": "click + 2*view"}]}"""))),

    "ts_apply_top" -> ((s, dir) =>
      // time-weighted sums accumulate in engine-dependent order → round(3);
      // Δt-sensitive: see EntryUtil.engineUs (DuckDB ts is µs)
      usView(engineUs(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "top", "N": 5}]}"""), valueCols = Nil)
        .withColumn("value", round(col("value"), 3))),

    // portion 0.0015: per-user share shrinks as 1/|users| with scale
    // (max share 0.12 / 0.016 / 0.0019 at sf0.001/0.01/0.1), so the
    // threshold must sit below the sf0.1 max for the entry to return rows
    // at every driver scale
    "ts_apply_heavy_hitters" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "heavy-hitters",
                        "portion": 0.0015, "error": 0.0005}]}"""))),

    // ---- metadata ---------------------------------------------------------
    "ts_meta_names" -> ((s, dir) =>
      engineFor(s, dir).execute("""{"select": "meta:names:click"}""")
        .select("name")),

    "ts_suggest_metrics" -> ((s, dir) =>
      engineFor(s, dir).execute(
        """{"select": "metric-names", "starts-with": "c"}""")),

    "ts_suggest_tag_values" -> ((s, dir) =>
      engineFor(s, dir).execute(
        """{"select": "tag-values", "tag": "user", "starts-with": "1"}"""))
  )

  private val aggFnSql = Map(
    "min" -> "min(value)",
    "max" -> "max(value)",
    "sum" -> "sum(value)",
    "cnt" -> "CAST(count(value) AS DOUBLE)",
    "mean" -> "avg(value)",
    "first" -> "(min(struct_pack(t := epoch_ns(ts), v := value))).v",
    "last" -> "(max(struct_pack(t := epoch_ns(ts), v := value))).v",
    // ns-valued funcs are NOT wrapped in round(): DuckDB's round(x, 6)
    // on ~1.7e18 doubles is lossy (Spark's is identity)
    "min_timestamp" -> "CAST((min(struct_pack(v := value, t := epoch_ns(ts)))).t AS DOUBLE)",
    "max_timestamp" -> "CAST((max(struct_pack(v := value, t := epoch_ns(ts)))).t AS DOUBLE)",
    "first_timestamp" -> "CAST(min(epoch_ns(ts)) AS DOUBLE)",
    "last_timestamp" -> "CAST(max(epoch_ns(ts)) AS DOUBLE)")

  private val dayNs = 86400000000000L

  /** `bin_us(step_ns)`: the group-aggregate bin (anchored at FromNs) in µs. */
  private def binUs(stepNs: Long): String =
    s"($FromNs + ((epoch_ns(ts) - $FromNs) // $stepNs) * $stepNs) // 1000"

  /** The two-metric join oracle's shared body — ts_layout_join reuses it
    * (the bucketed layout must answer identically to the plain engine). */
  private[entries] def pivot2(metric1: String, metric2: String): String =
    s"""SELECT concat('$metric1|$metric2 user=', CAST(user_id AS VARCHAR)) AS series,
          epoch_us(ts) AS ts_us,
          round(max(value) FILTER (WHERE event_type = '$metric1'), 6) AS "$metric1",
          round(max(value) FILTER (WHERE event_type = '$metric2'), 6) AS "$metric2"
        FROM events
        WHERE event_type IN ('$metric1', '$metric2')
          AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
        GROUP BY user_id, ts"""

  val oracle: Map[String, String] = Map(
    "ts_select_scan" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, round(value, 6) AS value
          ${oracleScan("purchase")} ORDER BY series, ts_us""",

    "ts_select_filter" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, round(value, 6) AS value
          ${oracleScan("purchase", "AND value > 150")} ORDER BY series, ts_us""",

    "ts_select_backward_time" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, round(value, 6) AS value
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_ns(ts) <= $ToNs AND epoch_ns(ts) > $FromNs
          ORDER BY ts_us DESC, series""",

    "ts_select_limit_offset" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, round(value, 6) AS value
          ${oracleScan("purchase")} ORDER BY series, ts_us LIMIT 100 OFFSET 50""",

    "ts_select_groupby_tag" ->
      s"""SELECT 'purchase' AS series,
            epoch_us(ts) AS ts_us, round(value, 6) AS value
          ${oracleScan("purchase")} ORDER BY ts_us""",

    "ts_select_where_in" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, round(value, 6) AS value
          ${oracleScan("purchase", "AND user_id IN (3, 7, 11)")}
          ORDER BY series, ts_us""",

    "ts_select_events_regex" ->
      s"""SELECT concat('!log user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, props AS body
          FROM events
          WHERE epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            AND regexp_matches(props, '"k": 4[0-9]')
          ORDER BY series, ts_us""",

    "ts_agg_funcs" ->
      aggFnSql.toSeq.sortBy(_._1).map { case (fn, sql) =>
        val v = if (fn.endsWith("_timestamp")) sql else s"round($sql, 6)"
        s"""SELECT concat('purchase:$fn user=', CAST(user_id AS VARCHAR)) AS series,
              min(epoch_us(ts)) AS ts_us, $v AS value
            FROM events WHERE event_type = 'purchase' GROUP BY user_id"""
      }.mkString("", " UNION ALL ", " ORDER BY series"),

    "ts_group_aggregate" ->
      s"""SELECT concat('purchase:min|purchase:max|purchase:cnt user=',
                        CAST(user_id AS VARCHAR)) AS series,
            ${binUs(dayNs)} AS ts_us,
            round(min(value), 6) AS "min", round(max(value), 6) AS "max",
            CAST(count(value) AS DOUBLE) AS cnt
          ${oracleScan("purchase")}
          GROUP BY user_id, ts_us ORDER BY series, ts_us""",

    "ts_group_aggregate_having" ->
      s"""SELECT concat('purchase:max|purchase:mean user=',
                        CAST(user_id AS VARCHAR)) AS series,
            ${binUs(7 * dayNs)} AS ts_us,
            round(max(value), 6) AS "max", round(avg(value), 6) AS mean
          ${oracleScan("purchase")}
          GROUP BY user_id, ts_us HAVING max(value) > 180
          ORDER BY series, ts_us""",

    "ts_join" -> (pivot2("click", "view") + " ORDER BY series, ts_us"),

    "ts_group_aggregate_join" ->
      s"""WITH b AS (
            SELECT user_id, event_type, ${binUs(7 * dayNs)} AS ts_us,
              max(value) AS v
            FROM events
            WHERE event_type IN ('click', 'view')
              AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            GROUP BY user_id, event_type, ts_us)
          SELECT concat('click|view user=', CAST(user_id AS VARCHAR)) AS series,
            ts_us,
            round(max(v) FILTER (WHERE event_type = 'click'), 6) AS click,
            round(max(v) FILTER (WHERE event_type = 'view'), 6) AS "view"
          FROM b GROUP BY user_id, ts_us ORDER BY series, ts_us""",

    "ts_apply_rate" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us,
            round((value - coalesce(lag(value) OVER w, 0.0))
                  / (epoch_ns(ts) - coalesce(lag(epoch_ns(ts)) OVER w, 0))
                  * 1e9, 6) + 0.0 AS value
          ${oracleScan("purchase")}
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
          ORDER BY series, ts_us""",

    "ts_apply_cusum" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us,
            round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, value
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value
          ${oracleScan("purchase")} ORDER BY series, ts_us""",

    "ts_apply_sma" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us,
            round(coalesce(sum(value) OVER (PARTITION BY user_id ORDER BY ts, value
              ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 0.0) / 5, 6) AS value
          ${oracleScan("purchase")} ORDER BY series, ts_us""",

    "ts_apply_cma" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us,
            round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, value
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value
          ${oracleScan("purchase")} ORDER BY series, ts_us""",

    "ts_apply_abs_scale" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, round(abs(value * -2.5), 6) AS value
          ${oracleScan("purchase")} ORDER BY series, ts_us""",

    "ts_apply_math_sum" ->
      s"""SELECT series, ts_us,
            round(coalesce(click, 0.0) + coalesce("view", 0.0), 6) AS value
          FROM (${pivot2("click", "view")}) ORDER BY series, ts_us""",

    "ts_apply_eval" ->
      s"""WITH b AS (
            SELECT user_id, event_type, ${binUs(7 * dayNs)} AS ts_us,
              max(value) AS v
            FROM events
            WHERE event_type IN ('click', 'view')
              AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            GROUP BY user_id, event_type, ts_us),
          p AS (
            SELECT user_id, ts_us,
              max(v) FILTER (WHERE event_type = 'click') AS click,
              max(v) FILTER (WHERE event_type = 'view') AS "view"
            FROM b GROUP BY user_id, ts_us)
          SELECT concat('click|view user=', CAST(user_id AS VARCHAR)) AS series,
            ts_us, round(click + 2 * "view", 6) AS value
          FROM p WHERE click IS NOT NULL AND "view" IS NOT NULL
          ORDER BY series, ts_us""",

    "ts_apply_top" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            max(epoch_us(ts)) AS ts_us,
            round(sum(value * coalesce(dt, 0.0)), 3) AS value
          FROM (
            SELECT user_id, ts, value,
              CAST(lead(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, value)
                   - epoch_ns(ts) AS DOUBLE) / 1e9 AS dt
            ${oracleScan("purchase")})
          GROUP BY user_id ORDER BY value DESC, series LIMIT 5""",

    "ts_apply_heavy_hitters" ->
      s"""WITH f AS (SELECT user_id, ts, value ${oracleScan("purchase")}),
            tot AS (SELECT sum(value) AS t FROM f)
          SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            max(epoch_us(ts)) AS ts_us, round(sum(value), 6) AS value
          FROM f, tot GROUP BY user_id, t HAVING sum(value) > 0.001 * t
          ORDER BY value DESC, series""",

    "ts_meta_names" ->
      """SELECT DISTINCT concat('click user=', CAST(user_id AS VARCHAR)) AS name
         FROM events WHERE event_type = 'click' ORDER BY name""",

    "ts_suggest_metrics" ->
      """SELECT DISTINCT event_type AS name FROM events
         WHERE event_type LIKE 'c%' ORDER BY name""",

    "ts_suggest_tag_values" ->
      """SELECT DISTINCT CAST(user_id AS VARCHAR) AS name FROM events
         WHERE CAST(user_id AS VARCHAR) LIKE '1%' ORDER BY name""")
}
