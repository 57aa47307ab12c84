package graft.entries

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.sources.Resp
import EntryUtil._

/** Round-2 entries: oracle proof for surfaces that were implemented but
  * unproven in round 1 (VERDICT.md "What's missing" #1/#2) — backward
  * group-aggregate, multi-metric aggregate with per-metric functions,
  * select-events with where + group-by-tag, a RESP round-trip exercising
  * the dictionary preamble and row protocol, and the reference's intended
  * downsample→EWMA composition (sliding_window.cc REGULLAR contract).
  */
object Round2Entries {

  private val dayNs = 86400000000000L

  val queries: Map[String, QueryFn] = Map(
    // backward group-aggregate: bins anchor at `from` (the high end) and
    // descend (column_store_test.cc:668-762 exercises both scan orders)
    "ts_group_aggregate_backward" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "7d",
                                 "func": ["min", "max", "cnt"]},
             "range": {"from": "$ToIso", "to": "$FromIso"}}"""),
        valueCols = Seq("min", "max", "cnt"))),

    // the remaining direction x order combos of the reference's scan
    // matrix (column_store_test.cc:176-198: fwd/bwd x series/time)
    "ts_select_backward_series" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$ToIso", "to": "$FromIso"},
             "order-by": "series"}"""))),

    "ts_group_aggregate_time_order" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "7d",
                                 "func": ["cnt"]},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "order-by": "time"}"""),
        valueCols = Seq("cnt"))),

    // >=1 metric:func pairs in one aggregate statement
    // (queryparser.cc:1453-1564); one scan per metric, funcs unfolded
    "ts_agg_multi_metric" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"aggregate": {"click": ["max", "cnt"], "view": "mean"},
             "range": {"from": "$FromIso", "to": "$ToIso"}}"""))),

    // select-events + where + group-by-tag (queryparser.cc:1338-1425):
    // tag filter restricts series, group-by-tag drops the tag from the
    // output name, regex filter applies to the body
    "ts_select_events_where_groupby" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select-events": "!log",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "where": {"user": ["1", "2", "3", "12"]},
             "group-by-tag": ["user"],
             "filter": "\\"k\\": [0-9]"}"""), valueCols = Nil)),

    // RESP round-trip with dictionary preamble + row protocol
    // (protocolparser.h:131-257): render one chunk per user — a *2
    // dictionary entry binding "click|click2 user=N" to id N, then each
    // point referenced BY ID with a *2 value array (row protocol fans it
    // out into click and click2 samples) — parse back, compare to the
    // directly-computed samples
    "src_resp_roundtrip" -> ((s, dir) => {
      val ev = EntryUtil.rawEvents(s, dir)
        .where(col("event_type") === "click")
        .withColumn("ts", col("ts").cast("long"))
      val pts = ev.select(col("user_id"), concat(
        lit(":"), col("user_id"), lit("\r\n:"), col("ts").cast("string"),
        lit("\r\n*2\r\n+"), col("value").cast("string"),
        lit("\r\n+"), (col("value") * 2).cast("string"), lit("\r\n")).as("pt"))
      val chunks = pts.groupBy("user_id")
        .agg(concat_ws("", collect_list(col("pt"))).as("body"))
        .select(concat(
          lit("*2\r\n+click|click2 user="), col("user_id"),
          lit("\r\n:"), col("user_id"), lit("\r\n"), col("body")).as("chunk"))
      Resp.toSamples(chunks.select("chunk").as(Encoders.STRING))
        .select(col("name"), expr("ts div 1000").as("ts_us"),
          round(col("value"), 6).as("value"))
        .orderBy("name", "ts_us", "value")
    }),

    // group-aggregate over an hourly rollup with a range unaligned to the
    // hour (±30 min): interior fine bins answer from the rollup, the edge
    // windows from raw samples (nbtree.h:457 interior+leaf combination);
    // min/max/cnt combine exactly, so this hash-matches the raw oracle
    "ts_group_aggregate_rollup" -> ((s, dir) =>
      usView(engineRollupFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["min", "max", "cnt"]},
             "range": {"from": "20240101T003000", "to": "20240331T233000"}}"""),
        valueCols = Seq("min", "max", "cnt"))),

    // N-way join (the reference allows >=2 compound metrics; entries
    // elsewhere only exercise 2)
    "ts_join3" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"join": ["click", "view", "purchase"],
             "range": {"from": "$FromIso", "to": "$ToIso"}}"""),
        valueCols = Seq("click", "view", "purchase"))),

    // apply over AGGREGATE output (the parser accepts apply on every
    // statement kind; only select/join chains were entry-tested)
    "ts_agg_apply_scale" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"aggregate": {"purchase": "sum"},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "scale", "weights": [2]}]}"""))),

    // the accumulate token (alias of cusum in the node registry) gets its
    // own entry so both registered spellings are oracle-proven
    "ts_apply_accumulate" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "accumulate"}]}"""))),

    // multi-node apply chain in an order-sensitive composition
    // (cusum . sma != sma . cusum): proves nodes execute in JSON order
    "ts_apply_chain" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "sma", "window-width": 3},
                       {"name": "cusum"}]}"""))),

    // salted two-stage aggregation under the oracle gate: spreading a hot
    // key over (key, salt) then combining partials must be value-identical
    // to the direct aggregation the oracle computes (cnt/min/max are
    // exactly associative, so the hash matches bit-for-bit)
    "ts_salted_agg" -> ((s, dir) => {
      val ev = EntryUtil.rawEvents(s, dir)
        .where(col("event_type") === "click")
        .select(col("user_id"), col("ts").cast("long").as("ts"), col("value"))
      graft.ops.Skew.saltedAgg(ev, Seq("user_id"), n = 8, partials = Seq(
        ("cnt", count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
        ("vmin", min(col("value")), (c: org.apache.spark.sql.Column) => min(c)),
        ("vmax", max(col("value")), (c: org.apache.spark.sql.Column) => max(c))))
        .select(col("user_id"), col("cnt"),
          round(col("vmin"), 6).as("vmin"), round(col("vmax"), 6).as("vmax"))
        .orderBy("user_id")
    }),

    // fuzzy (metric-prefix) series resolution with tag constraints
    // (SeriesRetreiver::fuzzy_match, queryparser.cc:210-275)
    "ts_search_fuzzy" -> ((s, dir) =>
      engineFor(s, dir).searchFuzzy("pur",
        graft.query.Ast.Where.TagsIn(Map("user" -> Seq("2", "4", "11"))))
        .select("name")),

    // streaming dedup executed as a REAL Structured Streaming query (not
    // the batch mirror): the click rows feed a MemoryStream in four
    // ts-ordered micro-batches, each with every row injected twice; the
    // watermarked dedup runs to completion (processAllAvailable) into a
    // memory sink, and the sink table IS the entry's result. Duplicates
    // always share a micro-batch, so the kept row is deterministic, and
    // ts-ordered batches keep every row ahead of the advancing watermark.
    "stream_dedup" -> ((s, dir) => {
      implicit val enc = Encoders.product[(String, Long, Double)]
      val rows = clickRows(s, dir)
      runStreamEntry(s, "stream_dedup_sink", rows, chunks = 4,
        cols = Seq("name", "ts", "value"),
        mkStream = graft.streaming.TsdbStream.dedup(_, "10 minutes"),
        mapChunk = (c: Seq[(String, Long, Double)]) => c ++ c)
        .select(col("name"), expr("ts div 1000").as("ts_us"),
          round(col("value"), 6).as("value"))
        .orderBy("name", "ts_us")
    }),

    // session windows executed as a REAL Structured Streaming query: the
    // stateful session_window aggregation merges open sessions across
    // ts-ordered micro-batches and append mode emits each session exactly
    // once when the watermark passes its end. The ts-ordered feed makes
    // stream splits ≡ the batch gaps-and-islands oracle: a session is
    // only finalized once every event within `gap` of it has been seen
    // (watermark lags chunk-max by 1h < the 1d gap). The sentinel (gap +
    // lateness past the last event) finalizes the tail sessions.
    "stream_sessions" -> ((s, dir) => {
      implicit val enc = Encoders.product[(String, Long, Double)]
      val rows = clickRows(s, dir)
      runStreamEntry(s, "stream_sessions_sink", rows, chunks = 4,
        cols = Seq("name", "ts", "value"),
        mkStream = graft.streaming.TsdbStream.sessionize(_, "1 day", "1 hour"),
        sentinel = Some(("click user=0", rows.last._2 + 2 * dayNs, 0.0)))
        .select(col("name"),
          unix_micros(col("session_start")).as("start_us"),
          unix_micros(col("session_end")).as("end_us"),
          col("n"), round(col("min"), 6).as("min"), round(col("max"), 6).as("max"))
        .orderBy("name", "start_us")
    }),

    // per-series EWMA executed as a REAL Structured Streaming query:
    // mapGroupsWithState carries the recursive (v, n) state across
    // ts-ordered micro-batches, update-mode output lands in the memory
    // sink (each input row's EWMA is emitted exactly once, in the trigger
    // that consumed it, so the sink accumulates the complete series).
    // The ts-ordered feed makes the stream fold ≡ the oracle's
    // list_reduce replay; no watermark/sentinel — EWMA state never
    // expires (the unbounded-lateness variant).
    "stream_ewma" -> ((s, dir) => {
      implicit val enc = Encoders.product[(String, Long, Double)]
      val rows = clickRows(s, dir)
      runStreamEntry(s, "stream_ewma_sink", rows, chunks = 4,
        cols = Seq("name", "ts", "value"),
        mkStream = graft.streaming.TsdbStream.ewma(_, decay = 0.2),
        outputMode = "update")
        .select(col("name"), expr("ts div 1000").as("ts_us"),
          round(col("value"), 6).as("value"), round(col("ewma"), 6).as("ewma"))
        .orderBy("name", "ts_us")
    }),

    // backward group-aggregate over the hourly rollup: interior fine bins
    // from the rollup, the closed-top boundary and straddles from raw
    "ts_group_aggregate_rollup_backward" -> ((s, dir) =>
      usView(engineRollupFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["min", "max", "cnt"]},
             "range": {"from": "$ToIso", "to": "$FromIso"}}"""),
        valueCols = Seq("min", "max", "cnt"))),

    // the reference's intended EWMA input is RESAMPLED data (it errors
    // with RegullarExpected on raw series, sliding_window.cc:7-103); this
    // is that composition: group-aggregate mean downsample, then ewma
    "ts_apply_downsample_ewma" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["mean"]},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "ewma", "decay": 0.3}]}"""),
        valueCols = Seq("mean")))
  )

  /** bin start (µs) for a forward range anchored at FromNs. */
  private def binUs(stepNs: Long): String =
    s"($FromNs + ((epoch_ns(ts) - $FromNs) // $stepNs) * $stepNs) // 1000"

  /** Replay of the engine's EWMA recursion (10-sample warm-up, decay 0.3)
    * over a pre-binned CTE `f(user_id, ts_us, value, rn)` + list CTE
    * `l(user_id, xs)` — same shape as ExtraEntries.ewmaSql. */
  private[entries] val ewmaPred = """CASE WHEN rn <= 11 THEN value
              ELSE list_reduce(
                list_prepend(
                  xs[11] * 0.3 + (list_reduce(xs[1:11], (a, b) -> a + b) / 11)
                    * (1.0 - 0.3),
                  xs[12:rn - 1]),
                (v, x) -> x * 0.3 + v * (1.0 - 0.3)) END"""

  private val weekNs = 7 * dayNs

  val oracle: Map[String, String] = Map(
    "ts_group_aggregate_backward" ->
      s"""SELECT concat('purchase:min|purchase:max|purchase:cnt user=',
                        CAST(user_id AS VARCHAR)) AS series,
            ($ToNs - ((($ToNs - epoch_ns(ts)) // $weekNs) * $weekNs)) // 1000
              AS ts_us,
            round(min(value), 6) AS "min", round(max(value), 6) AS "max",
            CAST(count(value) AS DOUBLE) AS cnt
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_ns(ts) <= $ToNs AND epoch_ns(ts) > $FromNs
          GROUP BY user_id, ts_us ORDER BY series, ts_us DESC""",

    "ts_group_aggregate_rollup" -> {
      val from2 = FromNs + 1800L * 1000000000L
      val to2 = ToNs - 1800L * 1000000000L
      s"""SELECT concat('purchase:min|purchase:max|purchase:cnt user=',
                        CAST(user_id AS VARCHAR)) AS series,
            ($from2 + ((epoch_ns(ts) - $from2) // $dayNs) * $dayNs) // 1000
              AS ts_us,
            round(min(value), 6) AS "min", round(max(value), 6) AS "max",
            CAST(count(value) AS DOUBLE) AS cnt
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_ns(ts) >= $from2 AND epoch_ns(ts) < $to2
          GROUP BY user_id, ts_us ORDER BY series, ts_us"""
    },

    "ts_select_backward_series" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, round(value, 6) AS value
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_ns(ts) <= $ToNs AND epoch_ns(ts) > $FromNs
          ORDER BY series, ts_us DESC""",

    "ts_group_aggregate_time_order" -> {
      val stepNs = 7 * dayNs
      s"""SELECT concat('purchase:cnt user=', CAST(user_id AS VARCHAR)) AS series,
            ($FromNs + ((epoch_ns(ts) - $FromNs) // $stepNs) * $stepNs) // 1000
              AS ts_us,
            CAST(count(value) AS DOUBLE) AS cnt
          ${oracleScan("purchase")}
          GROUP BY user_id, ts_us ORDER BY ts_us, series"""
    },

    "ts_group_aggregate_rollup_backward" ->
      s"""SELECT concat('purchase:min|purchase:max|purchase:cnt user=',
                        CAST(user_id AS VARCHAR)) AS series,
            ($ToNs - ((($ToNs - epoch_ns(ts)) // $dayNs) * $dayNs)) // 1000
              AS ts_us,
            round(min(value), 6) AS "min", round(max(value), 6) AS "max",
            CAST(count(value) AS DOUBLE) AS cnt
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_ns(ts) <= $ToNs AND epoch_ns(ts) > $FromNs
          GROUP BY user_id, ts_us ORDER BY series, ts_us DESC""",

    "ts_agg_multi_metric" ->
      s"""SELECT * FROM (
            SELECT concat('click:max user=', CAST(user_id AS VARCHAR)) AS series,
              min(epoch_us(ts)) AS ts_us, round(max(value), 6) AS value
            ${oracleScan("click")} GROUP BY user_id
            UNION ALL
            SELECT concat('click:cnt user=', CAST(user_id AS VARCHAR)),
              min(epoch_us(ts)), CAST(count(value) AS DOUBLE)
            ${oracleScan("click")} GROUP BY user_id
            UNION ALL
            SELECT concat('view:mean user=', CAST(user_id AS VARCHAR)),
              min(epoch_us(ts)), round(avg(value), 6)
            ${oracleScan("view")} GROUP BY user_id)
          ORDER BY series, ts_us""",

    "ts_select_events_where_groupby" ->
      s"""SELECT '!log' AS series, epoch_us(ts) AS ts_us, props AS body
          FROM events
          WHERE epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            AND user_id IN (1, 2, 3, 12)
            AND regexp_matches(props, '"k": [0-9]')
          ORDER BY series, ts_us""",

    "ts_agg_apply_scale" ->
      s"""SELECT concat('purchase:sum user=', CAST(user_id AS VARCHAR)) AS series,
            min(epoch_us(ts)) AS ts_us, round(sum(value) * 2, 6) AS value
          ${oracleScan("purchase")}
          GROUP BY user_id ORDER BY series""",

    "ts_apply_accumulate" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us,
            round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, value
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value
          ${oracleScan("purchase")} ORDER BY series, ts_us""",

    "ts_join3" ->
      s"""SELECT concat('click|view|purchase user=',
                        CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us,
            round(max(value) FILTER (WHERE event_type = 'click'), 6) AS click,
            round(max(value) FILTER (WHERE event_type = 'view'), 6) AS "view",
            round(max(value) FILTER (WHERE event_type = 'purchase'), 6) AS purchase
          FROM events
          WHERE event_type IN ('click', 'view', 'purchase')
            AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
          GROUP BY user_id, ts ORDER BY series, ts_us""",

    "ts_apply_chain" ->
      s"""WITH s1 AS (
            SELECT user_id, ts,
              coalesce(sum(value) OVER (PARTITION BY user_id ORDER BY ts, value
                ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 0.0) / 3 AS sma
            ${oracleScan("purchase")})
          SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us,
            round(sum(sma) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value
          FROM s1 ORDER BY series, ts_us""",

    "ts_salted_agg" ->
      """SELECT user_id, count(*) AS cnt,
           round(min(value), 6) AS vmin, round(max(value), 6) AS vmax
         FROM events WHERE event_type = 'click'
         GROUP BY user_id ORDER BY user_id""",

    "ts_search_fuzzy" ->
      """SELECT DISTINCT concat('purchase user=', CAST(user_id AS VARCHAR)) AS name
         FROM events
         WHERE event_type LIKE 'pur%' AND user_id IN (2, 4, 11)
         ORDER BY name""",

    "stream_dedup" ->
      """SELECT DISTINCT concat('click user=', CAST(user_id AS VARCHAR)) AS name,
           epoch_us(ts) AS ts_us, round(value, 6) AS value
         FROM events WHERE event_type = 'click'
         ORDER BY name, ts_us""",

    // gaps-and-islands replay of session_window: a session breaks where
    // the gap to the previous event is >= 1 day; end = last event + gap
    "stream_sessions" ->
      """WITH f AS (
           SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
         g AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 86400000000
               THEN 1 ELSE 0 END AS brk
           FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         s AS (
           SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM g)
         SELECT concat('click user=', CAST(user_id AS VARCHAR)) AS name,
           min(epoch_us(ts)) AS start_us,
           max(epoch_us(ts)) + 86400000000 AS end_us,
           count(*) AS n,
           round(min(value), 6) AS "min", round(max(value), 6) AS "max"
         FROM s GROUP BY user_id, sid ORDER BY name, start_us""",

    // seeded recursion: st_1 = x_1; st_n = d·x_n + (1−d)·st_{n−1};
    // list_reduce folds the identical IEEE op sequence
    "stream_ewma" ->
      s"""WITH f AS (
            SELECT user_id, ts, value,
              row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
            FROM events WHERE event_type = 'click'),
          l AS (
            SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY ts) AS xs
            FROM f GROUP BY user_id)
          SELECT concat('click user=', CAST(user_id AS VARCHAR)) AS name,
            epoch_us(ts) AS ts_us, round(value, 6) AS value,
            round(list_reduce(list_prepend(xs[1], xs[2:rn]),
              (v, x) -> x * 0.2 + v * (1.0 - 0.2)), 6) AS ewma
          FROM f JOIN l USING (user_id) ORDER BY name, ts_us""",

    "src_resp_roundtrip" ->
      """SELECT * FROM (
           SELECT concat('click user=', CAST(user_id AS VARCHAR)) AS name,
             epoch_us(ts) AS ts_us, round(value, 6) AS value
           FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT concat('click2 user=', CAST(user_id AS VARCHAR)),
             epoch_us(ts), round(value * 2, 6)
           FROM events WHERE event_type = 'click')
         ORDER BY name, ts_us, value""",

    "ts_apply_downsample_ewma" ->
      s"""WITH b AS (
            SELECT user_id, ${binUs(dayNs)} AS ts_us, avg(value) AS value
            ${oracleScan("purchase")}
            GROUP BY user_id, ts_us),
          f AS (
            SELECT user_id, ts_us, value,
              row_number() OVER (PARTITION BY user_id ORDER BY ts_us) AS rn
            FROM b),
          l AS (
            SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY ts_us) AS xs
            FROM f GROUP BY user_id)
          SELECT concat('purchase:mean user=', CAST(user_id AS VARCHAR)) AS series,
            ts_us, round($ewmaPred, 6) AS mean
          FROM f JOIN l USING (user_id) ORDER BY series, ts_us""")
}
