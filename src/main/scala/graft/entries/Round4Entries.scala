package graft.entries

import EntryUtil._

/** Round-4 entries: the form-2 (bare) filter on group-aggregate-join
  * (reference binds it to the first metric column,
  * /root/reference/stdb/query/queryparser.cc:792-806), and a fully-aligned
  * rollup-served group-aggregate — the zero-edge case that reads ONLY the
  * materialized rollup, never raw samples (nbtree.h:457 interior-only
  * subtree answer), exempt from the engine's density guard.
  */
object Round4Entries {

  private val dayNs = 86400000000000L
  private val weekNs = 7 * dayNs

  // 2024-03-30T00:00Z — hour- and day-aligned so the 1d-step query has no
  // edge fine-bins against the hourly rollup
  private val AlignedToIso = "20240330T000000"
  private val AlignedToNs = ToNs - 2 * dayNs

  val queries: Map[String, QueryFn] = Map(
    // form-2 bare filter: {"filter": {"gt": x}} carries no metric name and
    // binds to the FIRST metric of the join; the unfiltered second column
    // rides along (absent slots only on the filtered column)
    "ts_group_aggregate_join_having_bare" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"group-aggregate-join": {"metric": ["click", "view"],
                                      "step": "7d", "func": "max"},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "filter": {"gt": 40}}"""),
        valueCols = Seq("click", "view"))),

    // fully-aligned rollup serving: from/to/step all multiples of the fine
    // step → zero edge windows → the plan reads the rollup alone (min/max/
    // cnt combine exactly, so this hash-matches the raw-scan oracle)
    "ts_group_aggregate_rollup_aligned" -> ((s, dir) =>
      usView(engineRollupFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["min", "max", "cnt"]},
             "range": {"from": "$FromIso", "to": "$AlignedToIso"}}"""),
        valueCols = Seq("min", "max", "cnt"))),

    // where-location bbox on select: the series universe is restricted
    // geometrically BEFORE id resolution (beyond-reference surface over
    // the R-tree analog; locations are the catalog's lon/lat columns)
    "ts_select_location_box" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "where-location": {"box": {"lon": [-60, 60], "lat": [-40, 40]}}}"""))),

    // where-location knn on aggregate: only the 5 series nearest (10, 10)
    // are aggregated (squared Euclidean, ties by series name)
    "ts_agg_location_knn" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"aggregate": {"purchase": "sum"},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "where-location": {"knn": {"lon": 10.0, "lat": 10.0, "k": 5}}}"""))),

    // rollup serving × group-by-tag on an ALIGNED range: zero edge windows
    // → the FanInAggregateOperator analog (aggregate.h:48-68) combines
    // interior accumulators ACROSS series reading ONLY the rollup.
    // COST NOTE: at this testdata's density the hourly rollup is ~raw-sized
    // (sf0.1: 19,898 hourly bins over 20,084 purchase rows), so serving
    // costs about the same as the raw scan its sibling abstains to — the
    // r4 driver bench's 1.52 s was sample contamination (warm: ~0.5-0.9 s,
    // within noise of the unaligned sibling). The plan is optimal either
    // way: accumulators pruned to {cnt,vmin,vmax} before the combine and
    // zero parquet I/O (PlanShapeSpec pins both); at production density
    // (≥tens of samples per bin) the interior read shrinks by that factor
    "ts_group_aggregate_rollup_groupby_aligned" -> ((s, dir) =>
      usView(engineRollupFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["min", "max", "cnt"]},
             "range": {"from": "$FromIso", "to": "$AlignedToIso"},
             "group-by-tag": ["user"]}"""),
        valueCols = Seq("min", "max", "cnt"))),

    // knn with a radius bound: grid-pruned candidates (Spatial.knnPruned)
    // — "the 4 nearest within ±60°" — fewer than k when the box is sparse
    "ts_agg_location_knn_radius" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"aggregate": {"purchase": "sum"},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "where-location": {"knn": {"lon": 10.0, "lat": 10.0, "k": 4,
                                        "radius": 60.0}}}"""))),

    // whole-history aggregate served ENTIRELY from the rollup (no range →
    // no edge bins → the reference's canonical SubtreeRef answer,
    // nbtree.h:457); min/max/cnt combine exactly against the raw oracle
    "ts_agg_rollup" -> ((s, dir) =>
      usView(engineRollupFor(s, dir).execute(
        """{"aggregate": {"purchase": ["min", "max", "cnt"]}}"""))),

    // range-bounded aggregate = the single-bin case of rollup serving
    // (step = span); the aligned range reads the rollup alone
    "ts_agg_rollup_range" -> ((s, dir) =>
      usView(engineRollupFor(s, dir).execute(
        s"""{"aggregate": {"purchase": ["min", "max", "cnt"]},
             "range": {"from": "$FromIso", "to": "$AlignedToIso"}}"""))),

    // asof-join through the JSON language (beyond-reference statement):
    // each click carries the most recent view at-or-before it per user.
    // engineUs: the asof comparison consumes ts, so both engines must see
    // identical (µs-truncated) longs
    "ts_asof_join_json" -> ((s, dir) =>
      usView(engineUs(s, dir).execute(
        s"""{"asof-join": {"left": "click", "right": "view"},
             "range": {"from": "$FromIso", "to": "$ToIso"}}"""),
        valueCols = Seq("click", "view"))),

    // where-location on SELECT-EVENTS: the geometric restriction applies
    // to event series too (locations are catalog properties, independent
    // of payload type) — closes the clause × kind matrix
    "ts_select_events_location_box" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"select-events": "!log",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "where-location": {"box": {"lon": [-60, 60], "lat": [-40, 40]}}}"""),
        valueCols = Nil)),

    // knn composed with JOIN: the k-cut selects LOCATIONS (tag sets), so
    // both metrics survive at every selected location — no fabricated
    // absent slots (the review-found hazard, oracle-locked here)
    "ts_join_location_knn" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"join": ["click", "view"],
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "where-location": {"knn": {"lon": 10.0, "lat": 10.0, "k": 5}}}"""),
        valueCols = Seq("click", "view"))),

    // gap-fill onto the regular grid (beyond-reference `fill` node): the
    // downsampled purchase stream is sparse (~0.4 rows/series/day), so
    // fill inserts the empty bins and carries the last mean forward —
    // materializing the REGULLAR series the reference's EWMA demands
    "ts_apply_fill_ffill" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["mean"]},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "fill", "step": "1d", "method": "ffill"}]}"""),
        valueCols = Seq("mean"))),

    // same grid, linear interpolation between the surrounding present bins
    "ts_apply_fill_linear" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["mean"]},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "fill", "step": "1d", "method": "linear"}]}"""),
        valueCols = Seq("mean"))),

    // the canonical REGULLAR pipeline the reference documents but cannot
    // run (its EWMA errors on gappy input and nothing fills): downsample
    // -> fill -> smooth, one query, oracle-replayed end to end
    "ts_apply_downsample_fill_ewma" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["mean"]},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "apply": [{"name": "fill", "step": "1d", "method": "ffill"},
                       {"name": "ewma", "decay": 0.3}]}"""),
        valueCols = Seq("mean")))
  )

  /** bin start (µs) for a forward range anchored at `fromNs`. */
  private def binUs(fromNs: Long, stepNs: Long): String =
    s"($fromNs + ((epoch_ns(ts) - $fromNs) // $stepNs) * $stepNs) // 1000"

  val oracle: Map[String, String] = Map(
    "ts_group_aggregate_join_having_bare" ->
      s"""WITH b AS (
            SELECT user_id, event_type, ${binUs(FromNs, weekNs)} AS ts_us,
              max(value) AS v
            FROM events
            WHERE event_type IN ('click', 'view')
              AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            GROUP BY user_id, event_type, ts_us),
          p AS (
            SELECT user_id, ts_us,
              max(v) FILTER (WHERE event_type = 'click') AS click,
              max(v) FILTER (WHERE event_type = 'view') AS "view"
            FROM b GROUP BY user_id, ts_us),
          f AS (
            SELECT user_id, ts_us,
              CASE WHEN click > 40 THEN click END AS click, "view"
            FROM p)
          SELECT concat('click|view user=', CAST(user_id AS VARCHAR)) AS series,
            ts_us, round(click, 6) AS click, round("view", 6) AS "view"
          FROM f WHERE click IS NOT NULL
          ORDER BY series, ts_us""",

    "ts_group_aggregate_rollup_aligned" ->
      s"""SELECT concat('purchase:min|purchase:max|purchase:cnt user=',
                        CAST(user_id AS VARCHAR)) AS series,
            ${binUs(FromNs, dayNs)} AS ts_us,
            round(min(value), 6) AS "min", round(max(value), 6) AS "max",
            CAST(count(value) AS DOUBLE) AS cnt
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $AlignedToNs
          GROUP BY user_id, ts_us ORDER BY series, ts_us""",

    "ts_group_aggregate_rollup_groupby_aligned" ->
      s"""SELECT 'purchase:min|purchase:max|purchase:cnt' AS series,
            ${binUs(FromNs, dayNs)} AS ts_us,
            round(min(value), 6) AS "min", round(max(value), 6) AS "max",
            CAST(count(value) AS DOUBLE) AS cnt
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $AlignedToNs
          GROUP BY ts_us ORDER BY ts_us""",

    // the catalog's deterministic lon/lat derivation (Model.fromTestdata)
    "ts_select_location_box" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, round(value, 6) AS value
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            AND CAST(user_id % 36 * 10.0 - 180.0 + 0.5 AS FLOAT) BETWEEN -60 AND 60
            AND CAST(user_id % 18 * 10.0 - 90.0 + 0.5 AS FLOAT) BETWEEN -40 AND 40
          ORDER BY series, ts_us""",

    "ts_agg_rollup_range" ->
      s"""WITH s AS (
           SELECT user_id, min(value) AS vmin, max(value) AS vmax,
             CAST(count(value) AS DOUBLE) AS cnt, min(epoch_us(ts)) AS ts_us
           FROM events
           WHERE event_type = 'purchase'
             AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $AlignedToNs
           GROUP BY user_id)
         SELECT * FROM (
           SELECT concat('purchase:min user=', CAST(user_id AS VARCHAR)) AS series,
             ts_us, round(vmin, 6) AS value FROM s
           UNION ALL
           SELECT concat('purchase:max user=', CAST(user_id AS VARCHAR)) AS series,
             ts_us, round(vmax, 6) AS value FROM s
           UNION ALL
           SELECT concat('purchase:cnt user=', CAST(user_id AS VARCHAR)) AS series,
             ts_us, round(cnt, 6) AS value FROM s)
         ORDER BY series, ts_us""",

    "ts_agg_rollup" ->
      """WITH s AS (
           SELECT user_id, min(value) AS vmin, max(value) AS vmax,
             CAST(count(value) AS DOUBLE) AS cnt, min(epoch_us(ts)) AS ts_us
           FROM events WHERE event_type = 'purchase' GROUP BY user_id)
         SELECT * FROM (
           SELECT concat('purchase:min user=', CAST(user_id AS VARCHAR)) AS series,
             ts_us, round(vmin, 6) AS value FROM s
           UNION ALL
           SELECT concat('purchase:max user=', CAST(user_id AS VARCHAR)) AS series,
             ts_us, round(vmax, 6) AS value FROM s
           UNION ALL
           SELECT concat('purchase:cnt user=', CAST(user_id AS VARCHAR)) AS series,
             ts_us, round(cnt, 6) AS value FROM s)
         ORDER BY series, ts_us""",

    "ts_apply_downsample_fill_ewma" ->
      s"""WITH b AS (
            SELECT user_id, ${binUs(FromNs, dayNs)} AS ts_us, avg(value) AS value
            FROM events
            WHERE event_type = 'purchase'
              AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            GROUP BY user_id, ts_us),
          ext AS (SELECT user_id, min(ts_us) AS mn, max(ts_us) AS mx
                  FROM b GROUP BY user_id),
          grid AS (SELECT user_id, unnest(generate_series(mn, mx, ${dayNs / 1000}))
                     AS ts_us FROM ext),
          j AS (SELECT grid.user_id, grid.ts_us, b.value
                FROM grid LEFT JOIN b USING (user_id, ts_us)),
          f AS (SELECT user_id, ts_us,
            last_value(value IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY ts_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
            FROM j),
          r AS (SELECT user_id, ts_us, value,
            row_number() OVER (PARTITION BY user_id ORDER BY ts_us) AS rn
            FROM f),
          l AS (SELECT user_id, list(CAST(value AS DOUBLE) ORDER BY ts_us) AS xs
                FROM r GROUP BY user_id)
          SELECT concat('purchase:mean user=', CAST(user_id AS VARCHAR)) AS series,
            ts_us, round(${Round2Entries.ewmaPred}, 6) AS mean
          FROM r JOIN l USING (user_id) ORDER BY series, ts_us""",

    "ts_agg_location_knn_radius" ->
      s"""WITH se AS (
            SELECT DISTINCT user_id,
              CAST(user_id % 36 * 10.0 - 180.0 + 0.5 AS FLOAT) AS lon,
              CAST(user_id % 18 * 10.0 - 90.0 + 0.5 AS FLOAT) AS lat
            FROM events WHERE event_type = 'purchase'),
          k AS (
            SELECT user_id FROM se
            WHERE lon BETWEEN -50.0 AND 70.0 AND lat BETWEEN -50.0 AND 70.0
            ORDER BY (lon - 10.0) * (lon - 10.0) + (lat - 10.0) * (lat - 10.0),
              concat('purchase user=', CAST(user_id AS VARCHAR))
            LIMIT 4)
          SELECT concat('purchase:sum user=', CAST(user_id AS VARCHAR)) AS series,
            min(epoch_us(ts)) AS ts_us, round(sum(value), 6) AS value
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            AND user_id IN (SELECT user_id FROM k)
          GROUP BY user_id ORDER BY series, ts_us""",

    "ts_asof_join_json" ->
      s"""SELECT concat('click|view user=', CAST(l.user_id AS VARCHAR)) AS series,
           epoch_us(l.ts) AS ts_us, round(l.value, 6) AS click,
           round(r.value, 6) AS "view"
         FROM (SELECT user_id, ts, value FROM events
               WHERE event_type = 'click'
                 AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs) l
         ASOF LEFT JOIN
           -- tie rule: one row per (user, µs-ts), MAX value — the
           -- SQL equivalent of TimeJoins.asof's window-ordering tie-break
           (SELECT user_id, make_timestamp(epoch_us(ts)) AS ts,
                   max(value) AS value
            FROM events
            WHERE event_type = 'view'
              AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            GROUP BY 1, 2) r
           ON l.user_id = r.user_id AND r.ts <= l.ts
         ORDER BY series, ts_us, click""",

    "ts_select_events_location_box" ->
      s"""SELECT concat('!log user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, props AS body
          FROM events
          WHERE epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            AND CAST(user_id % 36 * 10.0 - 180.0 + 0.5 AS FLOAT) BETWEEN -60 AND 60
            AND CAST(user_id % 18 * 10.0 - 90.0 + 0.5 AS FLOAT) BETWEEN -40 AND 40
          ORDER BY series, ts_us""",

    "ts_join_location_knn" ->
      s"""WITH se AS (
            SELECT DISTINCT user_id,
              CAST(user_id % 36 * 10.0 - 180.0 + 0.5 AS FLOAT) AS lon,
              CAST(user_id % 18 * 10.0 - 90.0 + 0.5 AS FLOAT) AS lat
            FROM events WHERE event_type IN ('click', 'view')),
          k AS (
            SELECT user_id FROM se
            ORDER BY (lon - 10.0) * (lon - 10.0) + (lat - 10.0) * (lat - 10.0),
              concat('user=', CAST(user_id AS VARCHAR))
            LIMIT 5)
          SELECT concat('click|view user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us,
            round(max(value) FILTER (WHERE event_type = 'click'), 6) AS click,
            round(max(value) FILTER (WHERE event_type = 'view'), 6) AS "view"
          FROM events
          WHERE event_type IN ('click', 'view')
            AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            AND user_id IN (SELECT user_id FROM k)
          GROUP BY user_id, ts ORDER BY series, ts_us""",

    "ts_apply_fill_ffill" ->
      s"""WITH b AS (
            SELECT user_id, ${binUs(FromNs, dayNs)} AS ts_us, avg(value) AS value
            FROM events
            WHERE event_type = 'purchase'
              AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            GROUP BY user_id, ts_us),
          ext AS (SELECT user_id, min(ts_us) AS mn, max(ts_us) AS mx
                  FROM b GROUP BY user_id),
          grid AS (SELECT user_id, unnest(generate_series(mn, mx, ${dayNs / 1000}))
                     AS ts_us FROM ext),
          j AS (SELECT grid.user_id, grid.ts_us, b.value
                FROM grid LEFT JOIN b USING (user_id, ts_us))
          SELECT concat('purchase:mean user=', CAST(user_id AS VARCHAR)) AS series,
            ts_us,
            round(last_value(value IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY ts_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS mean
          FROM j ORDER BY series, ts_us""",

    "ts_apply_fill_linear" ->
      s"""WITH b AS (
            SELECT user_id, ${binUs(FromNs, dayNs)} AS ts_us, avg(value) AS value
            FROM events
            WHERE event_type = 'purchase'
              AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            GROUP BY user_id, ts_us),
          ext AS (SELECT user_id, min(ts_us) AS mn, max(ts_us) AS mx
                  FROM b GROUP BY user_id),
          grid AS (SELECT user_id, unnest(generate_series(mn, mx, ${dayNs / 1000}))
                     AS ts_us FROM ext),
          j AS (SELECT grid.user_id, grid.ts_us, b.value
                FROM grid LEFT JOIN b USING (user_id, ts_us)),
          f AS (SELECT user_id, ts_us, value,
            last_value(value IGNORE NULLS) OVER wprev AS vp,
            last_value(CASE WHEN value IS NOT NULL THEN ts_us END IGNORE NULLS)
              OVER wprev AS tp,
            first_value(value IGNORE NULLS) OVER wnext AS vn,
            first_value(CASE WHEN value IS NOT NULL THEN ts_us END IGNORE NULLS)
              OVER wnext AS tn
            FROM j
            WINDOW wprev AS (PARTITION BY user_id ORDER BY ts_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            wnext AS (PARTITION BY user_id ORDER BY ts_us
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
          SELECT concat('purchase:mean user=', CAST(user_id AS VARCHAR)) AS series,
            ts_us,
            round(CASE WHEN value IS NOT NULL THEN value
              ELSE vp + (vn - vp) * ((ts_us - tp) * 1.0 / (tn - tp)) END, 6)
              AS mean
          FROM f ORDER BY series, ts_us""",

    "ts_agg_location_knn" ->
      s"""WITH se AS (
            SELECT DISTINCT user_id,
              CAST(user_id % 36 * 10.0 - 180.0 + 0.5 AS FLOAT) AS lon,
              CAST(user_id % 18 * 10.0 - 90.0 + 0.5 AS FLOAT) AS lat
            FROM events WHERE event_type = 'purchase'),
          k AS (
            SELECT user_id FROM se
            ORDER BY (lon - 10.0) * (lon - 10.0) + (lat - 10.0) * (lat - 10.0),
              concat('purchase user=', CAST(user_id AS VARCHAR))
            LIMIT 5)
          SELECT concat('purchase:sum user=', CAST(user_id AS VARCHAR)) AS series,
            min(epoch_us(ts)) AS ts_us, round(sum(value), 6) AS value
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            AND user_id IN (SELECT user_id FROM k)
          GROUP BY user_id ORDER BY series, ts_us""")
}
