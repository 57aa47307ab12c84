package graft.entries

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.query.QueryParser
import graft.sources.OpenTsdb
import graft.spatial.Spatial
import EntryUtil._

/** Second wave of driver-contract entries: spatial (R-tree analog),
  * metadata search, the remaining apply nodes (diff/divide/frequent-items/
  * sma-error/ewma), aggregate re-keying, join filter combiners, and an
  * ingestion-protocol round-trip.
  */
object ExtraEntries {

  val queries: Map[String, QueryFn] = Map(
    // ---- spatial (SURVEY §2.9: R-tree range + kNN over series locations) --
    "ts_spatial_range" -> ((s, dir) =>
      Spatial.rangeQuery(engineFor(s, dir).ctx.series, -60, 60, -40, 40)
        .select(col("name"), col("lon"), col("lat"))
        .orderBy("name")),

    "ts_spatial_knn" -> ((s, dir) =>
      Spatial.knn(engineFor(s, dir).ctx.series, 10.0, 10.0, k = 15)
        .select(col("name"), round(col("dist2"), 6).as("dist2"))
        .orderBy("dist2", "name")),

    // ---- metadata: search + tag-names suggest -----------------------------
    "ts_search" -> ((s, dir) =>
      engineFor(s, dir).run(QueryParser.parseSearch(
        """{"select": "purchase", "where": {"user": ["1", "2", "3", "12"]}}"""))
        .select("name")),

    "ts_suggest_tag_names" -> ((s, dir) =>
      engineFor(s, dir).execute(
        """{"select": "tag-names", "metric": "click", "starts-with": "u"}""")),

    "ts_search_regex" -> ((s, dir) =>
      engineFor(s, dir).searchRegex("^purchase user=1[0-2]$").select("name")),

    // ---- aggregate + group-by-tag (AggregateCombiner, SURVEY §2.4) --------
    "ts_agg_groupby_tag" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"aggregate": {"purchase": "sum"},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "group-by-tag": ["user"]}"""))),

    // ---- select + pivot-by-tag (keep-only re-keying) ----------------------
    "ts_select_pivot_tag" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "pivot-by-tag": ["user"]}"""))),

    // ---- join with per-metric filters + ANY combiner ----------------------
    "ts_join_filter_any" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"join": ["click", "view"],
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "filter": {"click": {"gt": 100}, "view": {"gt": 100},
                        "=": {"require": "any"}}}"""),
        valueCols = Seq("click", "view"))),

    // ---- remaining apply nodes --------------------------------------------
    // explicit series list: where = [{tag: v}, ...] resolves exact series
    "ts_select_where_explicit" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "where": [{"user": "5"}, {"user": "9"}]}"""))),

    "ts_apply_multiply" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"join": ["click", "view"],
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "multiply", "ignore_missing": true}]}"""))),

    "ts_apply_ewma_error" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "ewma-error", "decay": 0.3}]}"""))),

    "ts_apply_diff" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"join": ["click", "view"],
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "diff", "ignore_missing": true}]}"""))),

    "ts_apply_divide" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"join": ["click", "view"],
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "divide", "ignore_missing": true}]}"""))),

    // portion 0.0008: count share ~1/|users| shrinks with scale (max
    // 0.104 / 0.0121 / 0.00129 at sf0.001/0.01/0.1) — the threshold must
    // sit below the sf0.1 max so the entry verifies rows at every scale
    "ts_apply_frequent_items" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "frequent-items",
                        "portion": 0.0008, "error": 0.0002}]}"""))),

    "ts_apply_sma_error" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "sma-error", "window-width": 5}]}"""))),

    // EWMA is genuinely recursive (flatMapSortedGroups per series); the
    // oracle replays the recursion with list_reduce in the same IEEE op
    // order, so values compare bit-exactly (round(6) like the rest).
    "ts_apply_ewma" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "ewma", "decay": 0.3}]}"""))),

    "ts_apply_sax" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "sax", "window-width": 8,
                        "paa": 4, "alphabet": 4}]}"""), valueCols = Nil)),

    // per-bin first/last aggregate over the REAL sample timestamps (locks
    // the fix for the ts-collapse bug: binning must not replace ts before
    // the aggregation); Δt-free but ts-ARGMAX-sensitive → µs engine
    "ts_group_aggregate_first_last" -> ((s, dir) =>
      usView(engineUs(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "7d",
                                 "func": ["first", "last"]},
             "range": {"from": "$FromIso", "to": "$ToIso"}}"""),
        valueCols = Seq("first", "last"))),

    // as-of join: for each click, the latest view at or before it (µs-
    // truncated ts so the <= boundary agrees with DuckDB's µs TIMESTAMP;
    // the oracle uses DuckDB's native ASOF JOIN)
    "ts_asof_join" -> ((s, dir) => {
      val ev = EntryUtil.rawEvents(s, dir)
        .withColumn("ts", col("ts").cast("long"))
        .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value").as("view_asof"))
      graft.ops.TimeJoins.asof(clicks, views, Seq("user_id"), Seq("view_asof"))
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          round(col("click"), 6).as("click"),
          round(col("view_asof"), 6).as("view_asof"))
        .orderBy("user_id", "ts_us", "click")
    }),

    // range join: each click paired with the 1-day purchase windows that
    // contain it (bucketed equi-join; oracle is the plain inequality join)
    "ts_range_join" -> ((s, dir) => {
      val dayNs = 86400000000000L
      val ev = EntryUtil.rawEvents(s, dir)
        .withColumn("ts", col("ts").cast("long"))
        .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click"))
      val windows = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("start"),
          (col("ts") + dayNs).as("end"))
      graft.ops.TimeJoins.rangeJoin(clicks, windows, Seq("user_id"), dayNs)
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          expr("start div 1000").as("win_start_us"),
          round(col("click"), 6).as("click"))
        .orderBy("user_id", "ts_us", "win_start_us")
    }),

    // streaming downsample executed as a REAL Structured Streaming query:
    // click rows feed a MemoryStream in ts-ordered micro-batches, the
    // watermarked hourly aggregation runs in append mode (each window
    // emitted exactly once when the watermark finalizes it), and the
    // memory sink IS the entry's result, checked against an epoch-aligned
    // hourly bucket in SQL. The sentinel (2h + lateness past the last
    // real event) finalizes every real window.
    "stream_downsample" -> ((s, dir) => {
      implicit val enc = Encoders.product[(String, Long, Double)]
      val rows = EntryUtil.rawEvents(s, dir)
        .where(col("event_type") === "click")
        .select(concat(lit("click user="), col("user_id").cast("string")).as("name"),
          col("ts").cast("long").as("ts"), col("value").cast("double").as("value"))
        .orderBy("ts", "name")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      runStreamEntry(s, "stream_downsample_sink", rows, chunks = 3,
        cols = Seq("name", "ts", "value"),
        mkStream = graft.streaming.TsdbStream.downsample(_, "1 hour", "10 minutes"),
        sentinel = Some(("click user=0", rows.last._2 + 2L * 3600000000000L, 0.0)))
        .select(col("name"), unix_micros(col("bin")).as("bin_us"),
          round(col("min"), 6).as("min"), round(col("max"), 6).as("max"),
          col("cnt"))
        .orderBy("name", "bin_us")
    }),

    // ---- ingestion protocol round-trip ------------------------------------
    // Render OpenTSDB `put` lines from the raw events, parse them back with
    // the codegen line parser, and emit normalized samples; the oracle
    // computes the same samples directly — checking the parser end-to-end.
    "src_opentsdb_roundtrip" -> ((s, dir) => {
      val ev = EntryUtil.rawEvents(s, dir)
        .where(col("event_type") === "click")
      val lines = ev.select(concat(
        lit("put "), col("event_type"), lit(" "), col("ts").cast("string"),
        lit(" "), col("value").cast("string"),
        lit(" user="), col("user_id").cast("string")).as("value"))
      OpenTsdb.parseLines(lines)
        .select(col("name"), expr("ts div 1000").as("ts_us"),
          round(col("value"), 6).as("value"))
        .orderBy("name", "ts_us", "value")
    })
  )

  /** lon/lat synthesized from user_id (TsdbContext.fromTestdata). */
  private val lonSql = "CAST(user_id % 36 * 10.0 - 180.0 + 0.5 AS FLOAT)"
  private val latSql = "CAST(user_id % 18 * 10.0 - 90.0 + 0.5 AS FLOAT)"

  /** Every located series — metric series AND the `!log` event series
    * (event series carry the same user-derived location in the catalog:
    * where-location applies to every kind). */
  private val seriesCte =
    s"""se AS (SELECT DISTINCT concat(event_type, ' user=',
          CAST(user_id AS VARCHAR)) AS name,
          $lonSql AS lon, $latSql AS lat
        FROM events
        UNION
        SELECT DISTINCT concat('!log user=', CAST(user_id AS VARCHAR)) AS name,
          $lonSql AS lon, $latSql AS lat
        FROM events)"""

  val oracle: Map[String, String] = Map(
    "ts_spatial_range" ->
      s"""WITH $seriesCte
         SELECT name, lon, lat FROM se
         WHERE lon BETWEEN -60 AND 60 AND lat BETWEEN -40 AND 40
         ORDER BY name""",

    "ts_spatial_knn" ->
      s"""WITH $seriesCte
         SELECT name, round((lon - 10.0) * (lon - 10.0)
           + (lat - 10.0) * (lat - 10.0), 6) AS dist2
         FROM se
         ORDER BY (lon - 10.0) * (lon - 10.0) + (lat - 10.0) * (lat - 10.0),
           name
         LIMIT 15""",

    "ts_search" ->
      """SELECT DISTINCT concat('purchase user=', CAST(user_id AS VARCHAR)) AS name
         FROM events WHERE event_type = 'purchase' AND user_id IN (1, 2, 3, 12)
         ORDER BY name""",

    "ts_suggest_tag_names" ->
      """SELECT DISTINCT 'user' AS name FROM events
         WHERE event_type = 'click' AND 'user' LIKE 'u%'""",

    "ts_search_regex" ->
      """SELECT DISTINCT concat('purchase user=', CAST(user_id AS VARCHAR)) AS name
         FROM events
         WHERE event_type = 'purchase'
           AND regexp_matches(concat('purchase user=', CAST(user_id AS VARCHAR)),
             '^purchase user=1[0-2]$')
         ORDER BY name""",

    "ts_agg_groupby_tag" ->
      s"""SELECT 'purchase:sum' AS series, min(epoch_us(ts)) AS ts_us,
            round(sum(value), 6) AS value
          ${oracleScan("purchase")}""",

    "ts_select_pivot_tag" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, round(value, 6) AS value
          ${oracleScan("purchase")} ORDER BY series, ts_us""",

    "ts_join_filter_any" ->
      s"""SELECT * FROM (
            SELECT concat('click|view user=', CAST(user_id AS VARCHAR)) AS series,
              epoch_us(ts) AS ts_us,
              round(max(value) FILTER (WHERE event_type = 'click' AND value > 100), 6)
                AS click,
              round(max(value) FILTER (WHERE event_type = 'view' AND value > 100), 6)
                AS "view"
            FROM events
            WHERE event_type IN ('click', 'view')
              AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            GROUP BY user_id, ts)
          WHERE click IS NOT NULL OR "view" IS NOT NULL
          ORDER BY series, ts_us""",

    "ts_select_where_explicit" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, round(value, 6) AS value
          ${oracleScan("purchase", "AND user_id IN (5, 9)")}
          ORDER BY series, ts_us""",

    "ts_apply_multiply" ->
      s"""SELECT series, ts_us,
            round(coalesce(click, 1.0) * coalesce("view", 1.0), 6) AS value
          FROM (${pivot2Sql("click", "view")}) ORDER BY series, ts_us""",

    "ts_apply_ewma_error" -> ewmaSql(delta = true),

    "ts_apply_diff" ->
      s"""SELECT series, ts_us,
            round(coalesce(click, 0.0) - coalesce("view", 0.0), 6) AS value
          FROM (${pivot2Sql("click", "view")}) ORDER BY series, ts_us""",

    // Division by zero → NULL in BOTH engines (Spark non-ANSI and DuckDB
    // share SQL semantics here; the reference's C++ would give ±inf —
    // recorded as a deliberate deviation in COVERAGE.md).
    "ts_apply_divide" ->
      s"""SELECT series, ts_us,
            round(coalesce(click, 1.0) / coalesce("view", 1.0), 6) AS value
          FROM (${pivot2Sql("click", "view")}) ORDER BY series, ts_us""",

    "ts_apply_frequent_items" ->
      s"""WITH f AS (SELECT user_id, ts, value ${oracleScan("purchase")}),
            tot AS (SELECT count(*) AS t FROM f)
          SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            max(epoch_us(ts)) AS ts_us, CAST(count(*) AS DOUBLE) AS value
          FROM f, tot GROUP BY user_id, t
          HAVING count(*) > (0.0008 - 0.0002) * t
          ORDER BY value DESC, series""",

    "ts_apply_sma_error" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us,
            round(value - coalesce(sum(value) OVER (PARTITION BY user_id
              ORDER BY ts, value ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 0.0) / 5,
              6) AS value
          ${oracleScan("purchase")} ORDER BY series, ts_us""",

    "ts_apply_ewma" -> ewmaSql(delta = false),

    // SAX letters are discrete, so FP summation-order differences between
    // engines cannot flip them except exactly on a breakpoint (~never).
    "ts_apply_sax" -> {
      val bps = graft.functions.SaxKernels.breakpoints(4)
      def letter(seg: String) = {
        val z = s"(CASE WHEN sd < 1e-12 THEN 0.0 ELSE ($seg - mu) / sd END)"
        s"chr(97 ${bps.map(b => s"+ CAST($z > $b AS INT)").mkString(" ")})"
      }
      val segs = (0 until 4).map(i => s"(xs[${2 * i + 1}] + xs[${2 * i + 2}]) / 2")
      s"""WITH f AS (
            SELECT user_id, ts, value, count(*) OVER w AS n, list(value) OVER w AS xs
            ${oracleScan("purchase")}
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, value
              ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)),
          g AS (
            SELECT user_id, ts, n, xs, list_sum(xs) / 8 AS mu,
              sqrt(list_sum(list_transform(xs, x ->
                (x - list_sum(xs) / 8) * (x - list_sum(xs) / 8))) / 8) AS sd
            FROM f)
          SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us,
            CASE WHEN n = 8
              THEN ${segs.map(letter).mkString(" || ")} END AS word
          FROM g ORDER BY series, ts_us"""
    },

    "stream_downsample" ->
      """SELECT concat('click user=', CAST(user_id AS VARCHAR)) AS name,
           (epoch_us(ts) // 3600000000) * 3600000000 AS bin_us,
           round(min(value), 6) AS "min", round(max(value), 6) AS "max",
           CAST(count(value) AS DOUBLE) AS cnt
         FROM events WHERE event_type = 'click'
         GROUP BY user_id, bin_us ORDER BY name, bin_us""",

    "ts_group_aggregate_first_last" -> {
      val stepNs = 7L * 86400000000000L
      s"""SELECT concat('purchase:first|purchase:last user=',
                        CAST(user_id AS VARCHAR)) AS series,
            ($FromNs + ((epoch_ns(ts) - $FromNs) // $stepNs) * $stepNs) // 1000
              AS ts_us,
            round((min(struct_pack(t := epoch_ns(ts), v := value))).v, 6)
              AS "first",
            round((max(struct_pack(t := epoch_ns(ts), v := value))).v, 6)
              AS "last"
          ${oracleScan("purchase")}
          GROUP BY user_id, ts_us ORDER BY series, ts_us"""
    },

    "ts_range_join" ->
      """SELECT c.user_id AS user_id, epoch_us(c.ts) AS ts_us,
           epoch_us(p.ts) AS win_start_us, round(c.value, 6) AS click
         FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
         JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id
             AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 DAY
         ORDER BY c.user_id, ts_us, win_start_us""",

    "ts_asof_join" ->
      """SELECT l.user_id AS user_id, epoch_us(l.ts) AS ts_us,
           round(l.value, 6) AS click, round(r.value, 6) AS view_asof
         FROM (SELECT user_id, ts, value FROM events WHERE event_type = 'click') l
         ASOF LEFT JOIN
           -- tie rule: one row per (user, µs-ts), MAX value — the
           -- SQL-expressible equivalent of the engine's pinned rule
           -- (TimeJoins.asof carries the max via its window ordering);
           -- native ASOF alone is arbitrary on tied timestamps
           (SELECT user_id, make_timestamp(epoch_us(ts)) AS ts,
                   max(value) AS value
            FROM events WHERE event_type = 'view' GROUP BY 1, 2) r
           ON l.user_id = r.user_id AND r.ts <= l.ts
         ORDER BY l.user_id, ts_us, click""",

    "src_opentsdb_roundtrip" ->
      """SELECT concat('click user=', CAST(user_id AS VARCHAR)) AS name,
           epoch_us(ts) AS ts_us, round(value, 6) AS value
         FROM events WHERE event_type = 'click'
         ORDER BY name, ts_us, value""")

  /** Exact replay of the reference EWMA recursion (10-sample arithmetic
    * warm-up, sliding_window.cc:7-103): prediction_n = x_n for n<=11, else
    * fold v ← x·d + v·(1−d) over x_12..x_{n-1} seeded with
    * v11 = x_11·d + mean(x_1..x_11)·(1−d) — list_reduce applies the same
    * IEEE operations in the same order as the engine's per-series fold, so
    * the comparison is bit-exact. `delta` = the ewma-error node (x − pred;
    * warm-up rows yield exactly 0). */
  private def ewmaSql(delta: Boolean): String = {
    val pred = """CASE WHEN rn <= 11 THEN value
              ELSE list_reduce(
                list_prepend(
                  xs[11] * 0.3 + (list_reduce(xs[1:11], (a, b) -> a + b) / 11)
                    * (1.0 - 0.3),
                  xs[12:rn - 1]),
                (v, x) -> x * 0.3 + v * (1.0 - 0.3)) END"""
    val out = if (delta) s"value - ($pred)" else pred
    s"""WITH f AS (
          SELECT user_id, ts, value,
            row_number() OVER (PARTITION BY user_id ORDER BY ts, value) AS rn
          ${oracleScan("purchase")}),
        l AS (
          SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY ts, value) AS xs
          FROM f GROUP BY user_id)
        SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
          epoch_us(ts) AS ts_us, round($out, 6) AS value
        FROM f JOIN l USING (user_id) ORDER BY series, ts_us"""
  }

  private def pivot2Sql(m1: String, m2: String): String =
    s"""SELECT concat('$m1|$m2 user=', CAST(user_id AS VARCHAR)) AS series,
          epoch_us(ts) AS ts_us,
          max(value) FILTER (WHERE event_type = '$m1') AS "$m1",
          max(value) FILTER (WHERE event_type = '$m2') AS "$m2"
        FROM events
        WHERE event_type IN ('$m1', '$m2')
          AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
        GROUP BY user_id, ts"""
}
