package graft.entries

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import EntryUtil._

/** Round-5 entries: rollup-LADDER serving (the multi-level
  * highest-covering-subtree answer, /root/reference/stdb/storage/
  * nbtree.h:457 — here a persisted hour→day compaction ladder with the
  * engine picking the coarsest eligible level), the remaining
  * asof-join matrix (backward range; where-location × per-side filter
  * composition; staleness tolerance), and the closed streaming loop
  * (a STREAM-maintained rollup serving an engine query), each
  * hash-locked against a DuckDB oracle.
  */
object Round5Entries {

  private val hourNs = 3600000000000L
  private val dayNs = 86400000000000L
  private val weekNs = 7 * dayNs

  // 2024-03-30T00:00Z — day-aligned (like FromIso), so every day-rollup
  // bin intersecting the range is interior: zero edge windows
  private val AlignedToIso = "20240330T000000"
  private val AlignedToNs = ToNs - 2 * dayNs

  val queries: Map[String, QueryFn] = Map(
    // rollup-ladder serving: the engine holds the hour rollup plus day
    // and week levels compacted up the ladder (Rollup.compact — raw never
    // rescanned). For this 7d-step day-aligned query the WEEK level is
    // eligible but abstains (epoch-week bins are 4 days out of phase with
    // the from-anchored query bins — zero interior), so serving falls
    // through to the DAY level alone (24× fewer interior rows than the
    // hourly level, zero raw I/O) — the multi-level SubtreeRef answer
    "ts_group_aggregate_rollup_ladder" -> ((s, dir) =>
      usView(engineRollupLadderFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "7d",
                                 "func": ["min", "max", "cnt"]},
             "range": {"from": "$FromIso", "to": "$AlignedToIso"}}"""),
        valueCols = Seq("min", "max", "cnt"))),

    // SELECT served from the PERSISTED partitioned layout
    // (metric/ts_day directory pruning + (series_id, ts) row-group
    // stats): the storage design answering a real query under the
    // oracle gate, with PlanShapeSpec pinning the partition filters
    "ts_layout_select" -> ((s, dir) =>
      usView(engineLayoutFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "where": {"user": ["2", "4", "6", "8"]}}"""))),

    // late-data upsert end-to-end: a PRIVATE layout copy absorbed a
    // correction batch (users 2/4, Jan 10-12, value + 1000) via
    // TsdbLayout.upsertSamples — only those days' directories were
    // rewritten — and the engine over the merged layout must serve the
    // corrected values (latest wins) with everything else untouched
    "ts_layout_upsert" -> ((s, dir) =>
      usView(engineUpsertedLayoutFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "where": {"user": ["2", "4", "6", "8"]}}"""))),

    // JOIN aligned on the bucketed layout's own tagkey column: the
    // engine's one unavoidable shuffle vanishes (write-time bucketing),
    // and the result still matches the plain raw-scan oracle
    "ts_layout_join" -> ((s, dir) =>
      usView(engineBucketedFor(s, dir).execute(
        s"""{"join": ["click", "view"],
             "range": {"from": "$FromIso", "to": "$ToIso"}}"""),
        valueCols = Seq("click", "view"))),

    // time-based retention end-to-end: a PRIVATE copy of the layout has
    // every ts_day directory before Jan 15 dropped (TsdbLayout.expire — a
    // metadata operation, no file rewritten; the analog of the reference
    // dropping aged volumes), and the engine over the expired layout
    // answers a WHOLE-range select with only the retained days — the
    // oracle applies the cutoff as a predicate on the raw table
    "ts_layout_expire" -> ((s, dir) =>
      usView(engineExpiredLayoutFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "$FromIso", "to": "$ToIso"},
             "where": {"user": ["2", "4", "6", "8"]}}"""))),

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
        valueCols = Seq("click", "view"))),

    // asof-join staleness tolerance through the JSON surface: a carried
    // view older than 24h at the click's timestamp is nulled out (the
    // per-column tolerance gate, TimeJoins.asof rtsCol machinery) —
    // testdata's median view gap is ~36h, so the gate genuinely fires.
    // engineUs: the ts subtraction must see identical (µs) longs
    "ts_asof_join_tolerance" -> ((s, dir) =>
      usView(engineUs(s, dir).execute(
        s"""{"asof-join": {"left": "click", "right": "view",
                           "tolerance": "24h"},
             "range": {"from": "$FromIso", "to": "$ToIso"}}"""),
        valueCols = Seq("click", "view"))),

    // the closed streaming loop: the rollup is maintained BY an executing
    // Structured Streaming query (TsdbStream.rollupBuild — watermarked
    // append, each hourly bin finalized exactly once), its memory sink is
    // registered with the engine, and an aligned group-aggregate is
    // served ENTIRELY from that stream-built rollup (aligned = zero edge
    // windows = raw samples never read; PlanShapeSpec pins that no
    // parquet scan in the served plan reads `value`), hash-matched
    // against the raw DuckDB oracle. Streamed and batch-built rollups
    // being interchangeable is the operational contract behind keeping
    // 100 TB rollups fresh as data arrives. The sentinel sits past the
    // query range and finalizes every real bin; its own (out-of-range)
    // bin stays in state, never emitted.
    "stream_rollup_serve" -> ((s, dir) => {
      implicit val enc = Encoders.product[(Long, Long, Double)]
      val ctx = EntryUtil.engineFor(s, dir).ctx
      val ids = ctx.series.where(col("metric") === "purchase")
        .select("series_id").collect().map(_.getLong(0))
      val rows = ctx.samples
        .where(col("series_id").isin(ids.toSeq: _*))
        .orderBy("ts", "series_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val sink = runStreamEntry(s, "stream_rollup_sink", rows, chunks = 3,
        cols = Seq("series_id", "ts", "value"),
        mkStream = graft.streaming.TsdbStream.rollupBuild(_, hourNs, "10 minutes"),
        sentinel = Some((ids.head, ToNs + dayNs, 0.0)))
      val eng = new graft.engine.Engine(
        ctx.copy(rollups = Seq(hourNs -> sink)))
      usView(eng.execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["min", "max", "cnt"]},
             "range": {"from": "$FromIso", "to": "$AlignedToIso"}}"""),
        valueCols = Seq("min", "max", "cnt"))
    }),

    // stream-STREAM interval join executed as a real two-input Structured
    // Streaming query (TsdbStream.intervalJoin — both sides watermarked,
    // join state bounded by window + lateness per series): each click
    // pairs with the same user's views in the preceding 6 hours. Inner
    // join matches emit as they arrive (append mode never waits on the
    // watermark to EMIT, only to evict state); the ts-ordered lockstep
    // feed keeps both inputs ahead of the global (min) watermark, so no
    // match is dropped as late. The oracle is the plain µs-precision
    // range self-join — the batch form of the same operator.
    "stream_interval_join" -> ((s, dir) => {
      implicit val enc = Encoders.product[(String, Long, Double)]
      val l = eventRows(s, dir, "click", "user=")
      val r = eventRows(s, dir, "view", "user=")
      // 2 lockstep rounds, not 4: a two-input stateful join runs ~3
      // micro-batches per round (one per input offset + the watermark
      // commit), each paying >1 s of fixed trigger overhead regardless
      // of data volume — two rounds still prove cross-batch join state
      runStreamEntry2(s, "stream_ij_sink", l, r, chunks = 2,
        cols = Seq("name", "ts", "value"),
        mkStream = (lf, rf) => graft.streaming.TsdbStream.intervalJoin(
          lf, rf, windowUs = 6L * 3600L * 1000000L, lateness = "1 hour"))
        .select(col("name"),
          expr("l_ts div 1000").as("l_ts_us"), expr("r_ts div 1000").as("r_ts_us"),
          round(col("l_value"), 6).as("l_value"), round(col("r_value"), 6).as("r_value"))
        .orderBy("name", "l_ts_us", "r_ts_us")
    }),

    // streaming corpus ingest through a REAL parquet file sink: documents
    // stream in, the quality gate filters in flight, and the entry result
    // is read back from the COMMITTED output directory (exactly-once via
    // the sink's _spark_metadata log — the streaming half of
    // CorpusLayout's write path). Stateless, so no watermark/sentinel.
    "stream_corpus_ingest" -> ((s, dir) => {
      implicit val enc =
        org.apache.spark.sql.Encoders.product[(Long, String, String)]
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = s.sqlContext
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "source", "text").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSeq
      val in = MemoryStream[(Long, String, String)]
      val out = graft.streaming.TsdbStream.corpusIngest(
        in.toDF().toDF("doc_id", "source", "text"))
      val tmp = EntryUtil.scratchDir("graft_ingest")
      val q = out.writeStream.format("parquet")
        .option("path", s"$tmp/corpus")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()
      try EntryUtil.feedChunks(in, q, docs, chunks = 3)
      finally q.stop()
      s.read.parquet(s"$tmp/corpus").orderBy("id")
    })
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

    "ts_layout_select" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, round(value, 6) AS value
          ${oracleScan("purchase", "AND user_id IN (2, 4, 6, 8)")}
          ORDER BY series, ts_us""",

    // the correction replayed as a CASE on the raw table: users 2/4 in
    // the Jan 10-12 window read value + 1000, everything else unchanged
    "ts_layout_upsert" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us,
            round(CASE WHEN user_id IN (2, 4)
                    AND epoch_ns(ts) >= ${EntryUtil.UpsertLoNs}
                    AND epoch_ns(ts) < ${EntryUtil.UpsertHiNs}
                  THEN value + 1000.0 ELSE value END, 6) AS value
          ${oracleScan("purchase", "AND user_id IN (2, 4, 6, 8)")}
          ORDER BY series, ts_us""",

    // same answer as the plain engine's ts_join — reuse its oracle body so
    // the two can never drift
    "ts_layout_join" ->
      (TsdbEntries.pivot2("click", "view") + " ORDER BY series, ts_us"),

    // retention replayed as a predicate: everything before the Jan 15
    // cutoff is gone from the expired layout
    "ts_layout_expire" ->
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
            epoch_us(ts) AS ts_us, round(value, 6) AS value
          ${oracleScan("purchase",
              s"AND user_id IN (2, 4, 6, 8) AND epoch_ns(ts) >= $ExpireCutoffNs")}
          ORDER BY series, ts_us""",

    "ts_asof_join_backward" ->
      s"""SELECT concat('click|view user=', CAST(l.user_id AS VARCHAR)) AS series,
           epoch_us(l.ts) AS ts_us, round(l.value, 6) AS click,
           round(r.value, 6) AS "view"
         FROM (SELECT user_id, ts, value FROM events
               WHERE event_type = 'click'
                 AND epoch_ns(ts) > $FromNs AND epoch_ns(ts) <= $ToNs) l
         ASOF LEFT JOIN
           -- tie rule: one row per (user, µs-ts), MAX value — the
           -- SQL equivalent of TimeJoins.asof's window-ordering tie-break
           (SELECT user_id, make_timestamp(epoch_us(ts)) AS ts,
                   max(value) AS value
            FROM events
            WHERE event_type = 'view'
              AND epoch_ns(ts) > $FromNs AND epoch_ns(ts) <= $ToNs
            GROUP BY 1, 2) r
           ON l.user_id = r.user_id AND r.ts <= l.ts
         ORDER BY series, ts_us, click""",

    // the 24h gate replayed on DuckDB's native ASOF match: the matched
    // view value survives only when it is at most 24h older than the
    // click (same µs longs on both sides via engineUs)
    "ts_asof_join_tolerance" ->
      s"""SELECT concat('click|view user=', CAST(l.user_id AS VARCHAR)) AS series,
           epoch_us(l.ts) AS ts_us, round(l.value, 6) AS click,
           CASE WHEN epoch_us(l.ts) - epoch_us(r.ts) <= ${24 * 3600L * 1000000L}
                THEN round(r.value, 6) END AS "view"
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

    // the same-user click←view pairing at µs precision (the stream
    // compares timestamp_micros values, i.e. ns-truncated-to-µs longs —
    // epoch_us applies the identical truncation)
    "stream_interval_join" ->
      """SELECT concat('user=', CAST(c.user_id AS VARCHAR)) AS name,
            epoch_us(c.ts) AS l_ts_us, epoch_us(v.ts) AS r_ts_us,
            round(c.value, 6) AS l_value, round(v.value, 6) AS r_value
          FROM events c JOIN events v
            ON c.user_id = v.user_id
            AND c.event_type = 'click' AND v.event_type = 'view'
            AND epoch_us(v.ts) >= epoch_us(c.ts) - 21600000000
            AND epoch_us(v.ts) <= epoch_us(c.ts)
          ORDER BY name, l_ts_us, r_ts_us""",

    // the committed file-sink directory must equal the batch quality
    // gate over the same documents (docs_quality's replay + threshold)
    "stream_corpus_ingest" ->
      """WITH f AS (
           SELECT doc_id, source, length(text) AS n_chars,
             string_split(text, ' ') AS ws
           FROM documents)
         SELECT doc_id AS id, source, n_chars, len(ws) AS n_tokens,
           round(list_sum(list_transform(ws, w -> length(w))) * 1.0 / len(ws), 6)
             AS mean_token_len,
           round(len(list_intersect(ws, ['the', 'a', 'of', 'and', 'to', 'in']))
             * 1.0 / len(list_distinct(ws)), 6) AS stopword_ratio,
           round(least(len(ws) / 100.0, 1.0) * 0.5 +
             (len(list_intersect(ws, ['the', 'a', 'of', 'and', 'to', 'in']))
              * 1.0 / len(list_distinct(ws))) * 0.5, 6) AS quality
         FROM f
         WHERE round(least(len(ws) / 100.0, 1.0) * 0.5 +
             (len(list_intersect(ws, ['the', 'a', 'of', 'and', 'to', 'in']))
              * 1.0 / len(list_distinct(ws))) * 0.5, 6) >= 0.25
         ORDER BY id""",

    // identical SQL to the aligned rollup entry: the STREAM-built rollup
    // must reproduce the raw answer exactly (min/max/cnt are combine-law
    // exact; the aligned range reads only finalized stream bins)
    "stream_rollup_serve" ->
      s"""SELECT concat('purchase:min|purchase:max|purchase:cnt user=',
                        CAST(user_id AS VARCHAR)) AS series,
            ${binUs(FromNs, dayNs)} AS ts_us,
            round(min(value), 6) AS "min", round(max(value), 6) AS "max",
            CAST(count(value) AS DOUBLE) AS cnt
          FROM events
          WHERE event_type = 'purchase'
            AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $AlignedToNs
          GROUP BY user_id, ts_us ORDER BY series, ts_us""",

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
            -- tie rule: one row per (user, µs-ts), MAX value — the
            -- SQL equivalent of TimeJoins.asof's window-ordering
            -- tie-break; the value filter runs BEFORE the dedup, like
            -- the engine's pre-alignment filter
            (SELECT user_id, make_timestamp(epoch_us(ts)) AS ts,
                    max(value) AS value
             FROM events
             WHERE event_type = 'view'
               AND epoch_ns(ts) >= $FromNs AND epoch_ns(ts) < $ToNs
               AND value > 30
               AND user_id IN (SELECT user_id FROM k)
             GROUP BY 1, 2) r
            ON l.user_id = r.user_id AND r.ts <= l.ts
          ORDER BY series, ts_us, click""")
}
