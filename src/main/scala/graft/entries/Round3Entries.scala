package graft.entries

import EntryUtil._

/** Round-3 entries: oracle proof for the surfaces VERDICT_r2 flagged —
  * the `filter` clause on group-aggregate-join (and its multi-metric
  * group-aggregate delegation), join + where, and the rollup ×
  * group-by-tag composition (the FanInAggregateOperator analog,
  * /root/reference/stdb/storage/operators/aggregate.h:48-68).
  */
object Round3Entries {

  private val dayNs = 86400000000000L
  private val weekNs = 7 * dayNs

  val queries: Map[String, QueryFn] = Map(
    // per-metric filters on the DOWNSAMPLED values, ANY combiner: a slot
    // failing its filter becomes absent, a row survives if either filtered
    // slot is present (queryparser.cc:1869-1873 parses these per metric;
    // query_plan_builder.cc:235-273 converts each against the single func)
    "ts_group_aggregate_join_having" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"group-aggregate-join": {"metric": ["click", "view"],
                                      "step": "7d", "func": "max"},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "filter": {"click": {"gt": 40}, "view": {"le": 45},
                        "=": {"require": "any"}}}"""),
        valueCols = Seq("click", "view"))),

    // the same filter surface reached through the multi-metric
    // group-aggregate delegation: the func-keyed filter replicates across
    // every metric column (layout_aggregate_filters' duplication loop,
    // query_plan_builder.cc:205-233), default ALL combiner
    "ts_group_aggregate_multi_having" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": ["click", "view"],
                                 "step": "7d", "func": "max"},
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "filter": {"max": {"gt": 40}}}"""),
        valueCols = Seq("click", "view"))),

    // join + where: the tag universe restricted before alignment
    // (reference resolves join wheres per metric, queryparser.cc:1954-1972)
    "ts_join_where" -> ((s, dir) =>
      usView(engineFor(s, dir).execute(
        s"""{"join": ["click", "view"],
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "where": {"user": ["2", "4", "6", "8"]}}"""),
        valueCols = Seq("click", "view"))),

    // rollup-served group-aggregate combined with group-by-tag: the
    // re-keyed output series merges every source series, so interior
    // rollup bins combine ACROSS series under the same accumulator law
    // (FanInAggregateOperator, aggregate.h:48-68); range unaligned ±30 min
    // so raw edges exercise the union path too
    "ts_group_aggregate_rollup_groupby" -> ((s, dir) =>
      usView(engineRollupFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["min", "max", "cnt"]},
             "range": {"from": "20240101T003000", "to": "20240331T233000"},
             "group-by-tag": ["user"]}"""),
        valueCols = Seq("min", "max", "cnt")))
  )

  /** bin start (µs) for a forward range anchored at `fromNs`. */
  private def binUs(fromNs: Long, stepNs: Long): String =
    s"($fromNs + ((epoch_ns(ts) - $fromNs) // $stepNs) * $stepNs) // 1000"

  private def gajPivot(extra: String = ""): String =
    s"""b AS (
          SELECT user_id, event_type, ${binUs(FromNs, weekNs)} AS ts_us,
            max(value) AS v
          FROM events
          WHERE event_type IN ('click', 'view')
            AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs $extra
          GROUP BY user_id, event_type, ts_us),
        p AS (
          SELECT user_id, ts_us,
            max(v) FILTER (WHERE event_type = 'click') AS click,
            max(v) FILTER (WHERE event_type = 'view') AS "view"
          FROM b GROUP BY user_id, ts_us)"""

  val oracle: Map[String, String] = Map(
    "ts_group_aggregate_join_having" ->
      s"""WITH ${gajPivot()},
            f AS (
              SELECT user_id, ts_us,
                CASE WHEN click > 40 THEN click END AS click,
                CASE WHEN "view" <= 45 THEN "view" END AS "view"
              FROM p)
          SELECT concat('click|view user=', CAST(user_id AS VARCHAR)) AS series,
            ts_us, round(click, 6) AS click, round("view", 6) AS "view"
          FROM f WHERE click IS NOT NULL OR "view" IS NOT NULL
          ORDER BY series, ts_us""",

    "ts_group_aggregate_multi_having" ->
      s"""WITH ${gajPivot()},
            f AS (
              SELECT user_id, ts_us,
                CASE WHEN click > 40 THEN click END AS click,
                CASE WHEN "view" > 40 THEN "view" END AS "view"
              FROM p)
          SELECT concat('click|view user=', CAST(user_id AS VARCHAR)) AS series,
            ts_us, round(click, 6) AS click, round("view", 6) AS "view"
          FROM f WHERE click IS NOT NULL AND "view" IS NOT NULL
          ORDER BY series, ts_us""",

    "ts_join_where" ->
      s"""SELECT concat('click|view user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us,
            round(max(value) FILTER (WHERE event_type = 'click'), 6) AS click,
            round(max(value) FILTER (WHERE event_type = 'view'), 6) AS "view"
          FROM events
          WHERE event_type IN ('click', 'view')
            AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
            AND user_id IN (2, 4, 6, 8)
          GROUP BY user_id, ts ORDER BY series, ts_us""",

    "ts_group_aggregate_rollup_groupby" -> {
      val from2 = FromNs + 1800L * 1000000000L
      val to2 = ToNs - 1800L * 1000000000L
      s"""SELECT 'purchase:min|purchase:max|purchase:cnt' AS series,
            ${binUs(from2, dayNs)} AS ts_us,
            round(min(value), 6) AS "min", round(max(value), 6) AS "max",
            CAST(count(value) AS DOUBLE) AS cnt
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_ns(ts) >= $from2 AND epoch_ns(ts) < $to2
          GROUP BY ts_us ORDER BY ts_us"""
    })
}
