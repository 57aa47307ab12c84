package graft.entries

import EntryUtil._

/** Round-5 entries: rollup-LADDER serving (the multi-level
  * highest-covering-subtree answer, /root/reference/stdb/storage/
  * nbtree.h:457 — here a persisted hour→day compaction ladder with the
  * engine picking the coarsest eligible level), and the remaining
  * asof-join matrix (backward range; where-location × per-side filter
  * composition), each hash-locked against a DuckDB oracle.
  */
object Round5Entries {

  private val dayNs = 86400000000000L
  private val weekNs = 7 * dayNs

  // 2024-03-30T00:00Z — day-aligned (like FromIso), so every day-rollup
  // bin intersecting the range is interior: zero edge windows
  private val AlignedToIso = "20240330T000000"
  private val AlignedToNs = ToNs - 2 * dayNs

  val queries: Map[String, QueryFn] = Map(
    // rollup-ladder serving: the engine holds BOTH the hourly rollup and
    // the day rollup compacted FROM it (Rollup.compact — raw never
    // rescanned), and this 7d-step day-aligned query is answered from the
    // DAY level alone (coarsest eligible; 24× fewer interior rows than
    // the hourly level, zero raw I/O) — the multi-level SubtreeRef answer
    "ts_group_aggregate_rollup_ladder" -> ((s, dir) =>
      usView(engineRollupLadderFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "7d",
                                 "func": ["min", "max", "cnt"]},
             "range": {"from": "$FromIso", "to": "$AlignedToIso"}}"""),
        valueCols = Seq("min", "max", "cnt"))),

    // asof-join over a BACKWARD range (closed-top (to, from] window,
    // descending output): the carry-forward match itself is direction-
    // independent — each click still pairs with the latest view at-or-
    // before it — only the scanned window and output order flip.
    // engineUs: the asof ts comparison must see identical (µs) longs
    "ts_asof_join_backward" -> ((s, dir) =>
      usView(engineUs(s, dir).execute(
        s"""{"asof-join": {"left": "click", "right": "view"},
             "range": {"from": "$ToIso", "to": "$FromIso"}}"""),
        valueCols = Seq("click", "view"))),

    // asof-join × where-location knn × per-side filters: the k-cut
    // restricts the series universe BEFORE alignment (both metrics kept
    // at each selected location), and each side's value filter runs
    // during its scan — a filtered-out view row must NOT supply a carried
    // value (the pre-alignment semantics QUERYLANG.md documents)
    "ts_asof_join_filtered_knn" -> ((s, dir) =>
      usView(engineUs(s, dir).execute(
        s"""{"asof-join": {"left": "click", "right": "view"},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "filter": {"click": {"ge": 10}, "view": {"gt": 30}},
             "where-location": {"knn": {"lon": 10.0, "lat": 10.0, "k": 5}}}"""),
        valueCols = Seq("click", "view")))
  )

  /** bin start (µs) for a forward range anchored at `fromNs`. */
  private def binUs(fromNs: Long, stepNs: Long): String =
    s"($fromNs + ((epoch_ns(ts) - $fromNs) // $stepNs) * $stepNs) // 1000"

  val oracle: Map[String, String] = Map(
    "ts_group_aggregate_rollup_ladder" ->
      s"""SELECT concat('purchase:min|purchase:max|purchase:cnt user=',
                        CAST(user_id AS VARCHAR)) AS series,
            ${binUs(FromNs, weekNs)} AS ts_us,
            round(min(value), 6) AS "min", round(max(value), 6) AS "max",
            CAST(count(value) AS DOUBLE) AS cnt
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $AlignedToNs
          GROUP BY user_id, ts_us ORDER BY series, ts_us""",

    "ts_asof_join_backward" ->
      s"""SELECT concat('click|view user=', CAST(l.user_id AS VARCHAR)) AS series,
           epoch_us(l.ts) AS ts_us, round(l.value, 6) AS click,
           round(r.value, 6) AS "view"
         FROM (SELECT user_id, ts, value FROM events
               WHERE event_type = 'click'
                 AND epoch_ns(ts) > $FromNs AND epoch_ns(ts) <= $ToNs) l
         ASOF LEFT JOIN
           (SELECT user_id, ts, value FROM events
            WHERE event_type = 'view'
              AND epoch_ns(ts) > $FromNs AND epoch_ns(ts) <= $ToNs) r
           ON l.user_id = r.user_id AND r.ts <= l.ts
         ORDER BY series, ts_us, click""",

    "ts_asof_join_filtered_knn" ->
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
          SELECT concat('click|view user=', CAST(l.user_id AS VARCHAR)) AS series,
            epoch_us(l.ts) AS ts_us, round(l.value, 6) AS click,
            round(r.value, 6) AS "view"
          FROM (SELECT user_id, ts, value FROM events
                WHERE event_type = 'click'
                  AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
                  AND value >= 10
                  AND user_id IN (SELECT user_id FROM k)) l
          ASOF LEFT JOIN
            (SELECT user_id, ts, value FROM events
             WHERE event_type = 'view'
               AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
               AND value > 30
               AND user_id IN (SELECT user_id FROM k)) r
            ON l.user_id = r.user_id AND r.ts <= l.ts
          ORDER BY series, ts_us, click""")
}
