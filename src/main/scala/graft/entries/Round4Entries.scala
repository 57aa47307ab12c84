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
        valueCols = Seq("min", "max", "cnt")))
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
          GROUP BY user_id, ts_us ORDER BY series, ts_us""")
}
