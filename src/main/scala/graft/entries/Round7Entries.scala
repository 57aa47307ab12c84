package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryUtil.QueryFn

/** Round-7 entries: the scale/robustness closures from the round-6
  * verdict — bounded-memory robust statistics (hash-sampled MAD index),
  * tie-pinned as-of joins over deliberately tied data, a file-source-fed
  * streaming ingest, the persisted-index probe for incremental dedup,
  * and reference ingest limits. All DuckDB-oracle-checked with identical
  * arithmetic.
  */
object Round7Entries {

  /** One definition of the click-samples series frame shared by the MAD
    * entries (name = "click user=N", ts Long ns, value). */
  private def clickSeries(s: SparkSession, dir: String): DataFrame =
    EntryUtil.rawEvents(s, dir)
      .where(col("event_type") === "click")
      .select(concat(lit("click user="), col("user_id").cast("string"))
        .as("name"), col("ts"), col("value"))

  val queries: Map[String, QueryFn] = Map(

    // bounded-memory robust anomaly detection: the med/MAD index is fit
    // on a hash-deterministic half-sample of each series (the exact form
    // buffers EVERY value of a series inside percentile's aggregation
    // buffer — unbounded in one hot series' row count at 100 TB; the
    // sample bounds it by the rate and stays SQL-replayable). Flags are
    // evaluated over the FULL data against the sampled index — model on
    // the sample, judge everything. At testdata's small per-series
    // counts the sampled flag set genuinely differs from ts_anomaly_mad's
    // exact one (391 vs 258 rows at sf0.01 — √n noise); the gate locks
    // the sampled ARITHMETIC, CorpusOpsSpec locks the convergence
    // contract at n = 10k
    "ts_anomaly_mad_sampled" -> ((s, dir) => {
      val clicks = clickSeries(s, dir)
      graft.ops.Monitoring.madAnomaliesWith(clicks,
          graft.ops.Monitoring.madIndexSampled(clicks, keyCol = "name",
            rate = 0.5),
          keyCol = "name", c = 3.0)
        .where(col("is_anomaly"))
        .select(col("name"), expr("ts div 1000").as("ts_us"),
          round(col("value"), 6).as("value"),
          round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"))
        .orderBy("name", "ts_us", "value")
    }),

    // as-of join over DELIBERATELY tied right timestamps: view ts
    // truncated to day boundaries, so every user carries many equal-ts
    // right rows. The entry locks the pinned tie rule (MAX value per
    // (key, ts) — TimeJoins.asof's right pre-aggregation) against an
    // oracle that applies the identical dedup before DuckDB's native
    // ASOF, whose own tie choice is arbitrary. EquivalenceSpec pins
    // batch ≡ streaming-probe on the same tied data
    "ts_asof_join_ties" -> ((s, dir) => {
      val dayNs = 86400000000000L
      val ev = EntryUtil.rawEvents(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"),
          (col("ts") - pmod(col("ts"), lit(1000L))).as("ts"),
          col("value").as("click"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"),
          (col("ts") - pmod(col("ts"), lit(dayNs))).as("ts"),
          col("value").as("view_asof"))
      graft.ops.TimeJoins.asof(clicks, views, Seq("user_id"),
          Seq("view_asof"))
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          round(col("click"), 6).as("click"),
          round(col("view_asof"), 6).as("view_asof"))
        .orderBy("user_id", "ts_us", "click")
    }),

    // the corpus-ingest stream fed by a REAL file source: the input is
    // a written parquet directory consumed through readStream
    // (FileStreamSource, one file per micro-batch under AvailableNow) —
    // closing the input half of the streaming story; the MemoryStream
    // twin (stream_corpus_ingest) feeds from driver-collected rows. No
    // driver-side .collect() of the corpus anywhere: input lands via a
    // Spark write job, flows through the same quality-gate transform,
    // and exits through the exactly-once parquet sink. One oracle with
    // the MemoryStream twin — the transform is the contract, the
    // transport must not change it
    "stream_corpus_ingest_file" -> ((s, dir) => {
      val tmp = EntryUtil.scratchDir("graft_ingest_file")
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "source", "text")
      docs.repartition(3).write.parquet(s"$tmp/in")
      val in = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
      val out = graft.streaming.TsdbStream.corpusIngest(in)
      val q = out.writeStream.format("parquet")
        .option("path", s"$tmp/corpus")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/corpus").orderBy("id")
    }),

    // mergeable log-bucketed quantile rollup (DDSketch-family): per
    // series, HOURLY histograms of bucket counts are built once, then
    // MERGED (counts add — quantiles themselves don't) to serve
    // p50/p95/p99 over the whole range. The bounded-memory percentile
    // path: the exact form buffers every value per group; this keeps
    // ≤ ~8·53 longs per (series, window) at any row count, with integer
    // bit-bucketing that replays bit-identically in SQL. Answers are
    // bucket lower edges — within 12.5% below the true order statistic
    // (spec-pinned), never above
    "ts_quantile_hist" -> ((s, dir) => {
      val hourNs = 3600000000000L
      val hourly = graft.ops.HistQuantiles.histogram(
        clickSeries(s, dir)
          .withColumn("hour", col("ts") - pmod(col("ts"), lit(hourNs))),
        Seq("name", "hour"))
      graft.ops.HistQuantiles.quantiles(
          graft.ops.HistQuantiles.merge(hourly, Seq("name")),
          Seq("name"), Seq("0.5", "0.95", "0.99"))
        .orderBy("name", "p")
    }),

    // the histogram maintained BY an executing stream: hourly windows
    // of bucket counts finalize exactly once (watermarked append), the
    // sink rows merge by addition, and the served p50/p95/p99 must
    // equal the batch build — streamed and batch-built percentile
    // indexes are interchangeable, the same operational contract the
    // stream-built rollup proves for min/max/sum/cnt
    "stream_quantile_hist" -> ((s, dir) => {
      implicit val enc =
        org.apache.spark.sql.Encoders.product[(String, Long, Double)]
      val hourNs = 3600000000000L
      val rows = EntryUtil.clickRows(s, dir)
      val maxTs = rows.iterator.map(_._2).max
      val sink = EntryUtil.runStreamEntry(s, "stream_qhist_sink", rows,
        chunks = 4, cols = Seq("name", "ts", "value"),
        mkStream = graft.streaming.TsdbStream.histBuild(_, hourNs,
          "10 minutes"),
        sentinel = Some((rows.head._1, maxTs + 86400000000000L, 0.0)))
      graft.ops.HistQuantiles.quantiles(
          graft.ops.HistQuantiles.merge(
            sink.select("name", "lo", "cnt"), Seq("name")),
          Seq("name"), Seq("0.5", "0.95", "0.99"))
        .orderBy("name", "p")
    }),

    // the persisted index serving alone: the hourly histogram was
    // written as parquet at build time (EntryUtil.histIndexFor, the
    // ts_layout_select pattern) and percentiles are served from that
    // parquet ONLY — PlanShapeSpec pins that no events scan appears in
    // the served plan. Build once, persist, serve any range forever
    "ts_quantile_persisted" -> ((s, dir) => {
      val path = EntryUtil.histIndexFor(s, dir)
      graft.ops.HistQuantiles.quantiles(
          graft.ops.HistQuantiles.merge(
            s.read.parquet(s"$path/hist"), Seq("name")),
          Seq("name"), Seq("0.5", "0.95", "0.99"))
        .orderBy("name", "p")
    }),

    // the same capability through the QUERY LANGUAGE: the beyond-
    // reference `quantile` statement — per-series histogram-served
    // percentiles over the range, with where/where-location composing
    // like any other statement
    "ts_quantile_json" -> ((s, dir) =>
      EntryUtil.engineFor(s, dir).execute(
        s"""{"quantile": {"metric": "purchase", "p": [0.5, 0.95, 0.99]},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // the statement SERVED from a registered persisted index — the
    // rollup-serving pattern for percentiles: the engine's ctx carries
    // the hourly histogram parquet, the aligned whole-range quantile
    // statement merges covered windows instead of scanning facts
    // (PlanShapeSpec pins no samples read + misaligned fallback), and
    // the answer is EXACTLY the scan-built one — same oracle as
    // ts_quantile_json
    "ts_quantile_json_indexed" -> ((s, dir) =>
      EntryUtil.engineHistFor(s, dir).execute(
        s"""{"quantile": {"metric": "purchase", "p": [0.5, 0.95, 0.99]},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // the stepped form: per-(series, 7d bin) percentiles — "p99 per
    // week", the dashboard query; bins anchor at range.from like
    // group-aggregate, the bin is just another histogram key
    "ts_quantile_step" -> ((s, dir) =>
      EntryUtil.engineFor(s, dir).execute(
        s"""{"quantile": {"metric": "purchase", "p": [0.5, 0.95, 0.99],
                          "step": "7d"},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // the SIGNED domain under the gate: histogram percentiles over
    // values straddling zero (clicks re-centered by their ~median 33)
    // — negative magnitudes take mirrored log buckets keyed on MINUS
    // their upper edge, so the never-above guarantee holds on both
    // signs and the served p25 is genuinely negative, not the old
    // underflow-bucket 0
    "ts_quantile_hist_signed" -> ((s, dir) =>
      graft.ops.HistQuantiles.quantiles(
          graft.ops.HistQuantiles.histogram(
            clickSeries(s, dir)
              .withColumn("value", col("value") - lit(33.0)),
            Seq("name")),
          Seq("name"), Seq("0.25", "0.5", "0.75"))
        .orderBy("name", "p")),

    // silence-interval detection with a PER-SERIES adaptive threshold:
    // gaps longer than 3x the series' own mean spacing — a dense and a
    // sparse series each judged by its own cadence. Unit note: the op
    // is unit-agnostic; feeding µs keeps the mean-spacing division on
    // the same integers DuckDB sees
    "ts_gaps" -> ((s, dir) => {
      val clicks = clickSeries(s, dir).withColumn("ts", expr("ts div 1000"))
      graft.ops.Monitoring.gapsRelative(clicks, factor = 3.0,
          keyCol = "name")
        .select(col("name"), col("gap_start").as("gap_start_us"),
          col("gap_end").as("gap_end_us"), col("gap_ns").as("gap_us"))
        .orderBy("name", "gap_start_us")
    }),

    // the ABSOLUTE-threshold form under the gate too ("any silence over
    // 12 h"), the SLO-style rule the adaptive entry doesn't exercise —
    // same lag window, fixed threshold, emitted rows gap-count-sized
    "ts_gaps_abs" -> ((s, dir) => {
      val clicks = clickSeries(s, dir).withColumn("ts", expr("ts div 1000"))
      graft.ops.Monitoring.gaps(clicks, minGapNs = 43200000000L,
          keyCol = "name")
        .select(col("name"), col("gap_start").as("gap_start_us"),
          col("gap_end").as("gap_end_us"), col("gap_ns").as("gap_us"))
        .orderBy("name", "gap_start_us")
    }),

    // the same gap rule flagging ONLINE: per-series cadence thresholds
    // modeled offline (broadcast index), only the last-arrival ts
    // carried as state (8 bytes/series) — a gap interval is emitted the
    // moment the ending sample arrives. Same output as ts_gaps, same
    // oracle: batch and streaming silence detection are interchangeable
    "stream_gaps" -> ((s, dir) => {
      implicit val enc =
        org.apache.spark.sql.Encoders.product[(String, Long, Double)]
      val clicksUs = clickSeries(s, dir).withColumn("ts", expr("ts div 1000"))
      val idx = graft.ops.Monitoring.gapThresholdIndex(clicksUs,
        factor = 3.0, keyCol = "name").cache()
      try {
        val rows = EntryUtil.clickRows(s, dir)
          .map { case (n, t, v) => (n, t / 1000L, v) }
        EntryUtil.runStreamEntry(s, "stream_gaps_sink", rows, chunks = 4,
            cols = Seq("name", "ts", "value"),
            mkStream = graft.streaming.TsdbStream.flagGaps(_, idx),
            outputMode = "update")
          .select(col("name"), col("gap_start").as("gap_start_us"),
            col("gap_end").as("gap_end_us"), col("gap_ns").as("gap_us"))
          .orderBy("name", "gap_start_us")
      } finally idx.unpersist(false)
    }),

    // seasonal (phase-of-period) outlier detection: per (metric,
    // hour-of-day) histogram-served interquartile HULL bands, flags
    // judged against the sample's OWN phase — "unusual for 3am", where
    // the global MAD index would call every rush hour an anomaly. The
    // hull (pLo bucket's lower edge .. pHi bucket's UPPER edge) means
    // a flagged value lies outside every value the quartile buckets
    // ever saw; bounded fit (log-bucket counts, no value buffer),
    // replayed band-for-band in the oracle
    "ts_seasonal_outliers" -> ((s, dir) => {
      val dayNs = 86400000000000L; val hourNs = 3600000000000L
      val clicks = EntryUtil.rawEvents(s, dir)
        .where(col("event_type") === "click")
        .select(lit("click").as("name"), col("ts"), col("value"))
      graft.ops.Monitoring.seasonalOutliers(clicks, dayNs, hourNs,
          keyCol = "name", pLo = "0.25", pHi = "0.75")
        .select(col("name"), expr("ts div 1000").as("ts_us"),
          round(col("value"), 6).as("value"), col("phase"),
          col("lo"), col("hi"))
        .orderBy("name", "ts_us", "value")
    }),

    // the band INDEX through the query language: the beyond-reference
    // `seasonal` statement — per-series phase bands over the range, the
    // persistable baseline behind "unusual for 3am" (6h phases here:
    // users x 4 band rows)
    "ts_seasonal_json" -> ((s, dir) =>
      EntryUtil.engineFor(s, dir).execute(
        s"""{"seasonal": {"metric": "purchase", "period": "1d",
                          "bin": "6h"},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // the seasonal band gate flagging ONLINE: the SAME stateless op
    // (seasonalOutliersWith is a projection + broadcast band join) runs
    // unchanged on the executing stream — bands modeled offline, each
    // micro-batch judged in flight; one code path and one oracle with
    // the batch entry
    "stream_seasonal" -> ((s, dir) => {
      implicit val enc =
        org.apache.spark.sql.Encoders.product[(String, Long, Double)]
      val dayNs = 86400000000000L; val hourNs = 3600000000000L
      val hist = EntryUtil.rawEvents(s, dir)
        .where(col("event_type") === "click")
        .select(lit("click").as("name"), col("ts"), col("value"))
      val bands = graft.ops.Monitoring.seasonalBands(hist, dayNs, hourNs,
        keyCol = "name", pLo = "0.25", pHi = "0.75").cache()
      try {
        val rows = EntryUtil.clickRows(s, dir)
          .map { case (_, t, v) => ("click", t, v) }
        EntryUtil.runStreamEntry(s, "stream_seasonal_sink", rows,
          chunks = 4, cols = Seq("name", "ts", "value"),
          mkStream = graft.ops.Monitoring.seasonalOutliersWith(_, bands,
            dayNs, hourNs, keyCol = "name"))
          .select(col("name"), expr("ts div 1000").as("ts_us"),
            round(col("value"), 6).as("value"), col("phase"),
            col("lo"), col("hi"))
          .orderBy("name", "ts_us", "value")
      } finally bands.unpersist(false)
    }),

    // silence ALERTING with a timeout clock (EventTimeTimeout): an
    // alert fires when a series has been silent > 12 h — on the next
    // arrival (inline) OR when other series' progress pushes the
    // watermark past the deadline with NO sample arriving at all (the
    // "still silent now" answer flagGaps can't give). For the ordered
    // feed the alert set is deterministic: ns-exact gaps > thr plus
    // terminally-silent series whose ms-floored deadline lies below the
    // final watermark — both replayed in the oracle (the sentinel
    // advances the clock but holds no threshold, so it never alerts)
    "stream_stale" -> ((s, dir) => {
      implicit val enc =
        org.apache.spark.sql.Encoders.product[(String, Long, Double)]
      val thrNs = 43200000000000L
      val rows = EntryUtil.clickRows(s, dir)
      val maxTs = rows.iterator.map(_._2).max
      val idx = clickSeries(s, dir).select("name").distinct()
        .withColumn("thr", lit(thrNs))
      val sink = EntryUtil.runStreamEntry(s, "stream_stale_sink", rows,
        chunks = 4, cols = Seq("name", "ts", "value"),
        mkStream = graft.streaming.TsdbStream.flagStale(_, idx,
          "10 minutes"),
        sentinel = Some(("__sentinel", maxTs + 86400000000000L, 0.0)))
      sink.select(col("name"), expr("last_ts div 1000").as("last_ts_us"))
        .orderBy("name", "last_ts_us")
    }),

    // linear-interpolation join: each click carries the view LEVEL at
    // its instant — v0 + (v1−v0)·(ts−t0)/(t1−t0) between the bracketing
    // view samples; null past either end (no extrapolation). The
    // alignment mode beyond as-of for continuously-varying quantities;
    // one union + two window passes over ONE key exchange. Oracle:
    // chained backward+forward DuckDB ASOF over the max-deduped right
    // side, identical IEEE op order
    "ts_interp_join" -> ((s, dir) => {
      val ev = EntryUtil.rawEvents(s, dir)
        .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      graft.ops.TimeJoins.interpolationJoin(clicks, views, Seq("user_id"),
          "value", asCol = "view_interp")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          round(col("click"), 6).as("click"),
          round(col("view_interp"), 6).as("view_interp"))
        .orderBy("user_id", "ts_us", "click")
    }),

    // M4 visualization downsampling (Jugel et al., VLDB 2014): per
    // (series, day bucket) the first/last/min/max samples — the four
    // points that draw the same line chart as all rows. Struct min/max
    // aggregates: ties pinned lexicographically, partial aggregation
    // reduces each map task to one struct per bucket before the
    // exchange (the shuffle carries bucket counts, not sample counts)
    "ts_m4_downsample" -> ((s, dir) => {
      val dayNs = 86400000000000L
      val clicks = clickSeries(s, dir)
        .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      graft.ops.Downsample.m4(clicks, Seq("name"), dayNs)
        .select(col("name"), col("bucket"),
          expr("first_ts div 1000").as("first_ts_us"),
          round(col("first_v"), 6).as("first_v"),
          expr("last_ts div 1000").as("last_ts_us"),
          round(col("last_v"), 6).as("last_v"),
          expr("min_ts div 1000").as("min_ts_us"),
          round(col("min_v"), 6).as("min_v"),
          expr("max_ts div 1000").as("max_ts_us"),
          round(col("max_v"), 6).as("max_v"))
        .orderBy("name", "bucket")
    }),

    // Prometheus-style counter increase over a reset-prone counter: a
    // synthetic monotonic counter (running integer sum of rounded click
    // values) wrapped mod 10000 provides genuine resets; the operator
    // must credit a reset with the post-reset reading, not a huge
    // negative delta (the plain rate node's failure mode on counter
    // restarts). Weekly buckets; integer-exact end to end
    "ts_counter_increase" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val weekNs = 7L * 86400000000000L
      val clicks = clickSeries(s, dir)
        .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      val w = Window.partitionBy("name").orderBy("ts", "value")
      val counter = clicks
        .withColumn("value",
          pmod(sum(round(col("value"), 0).cast("long")).over(w), lit(10000L))
            .cast("double"))
        .select("name", "ts", "value")
      graft.ops.Downsample.counterIncrease(counter, Seq("name"), weekNs)
        .orderBy("name", "bucket")
    }),

    // cross-series Pearson correlation on aligned hourly buckets —
    // "which metrics move together". Bucket means quantize to integer
    // milli-units so every moment is an order-independent integer sum;
    // the fact scan reduces to (keys x buckets) rows BEFORE the pair
    // join ever runs (plan-pinned) and one double formula at the end
    // replays with identical IEEE op order in the mirror
    "ts_corr_matrix" -> ((s, dir) =>
      graft.ops.Stats.corrAligned(
          EntryUtil.rawEvents(s, dir)
            .select(col("event_type").as("metric"), col("ts"), col("value")),
          bucketNs = 3600000000000L)
        .orderBy("key_a", "key_b")),

    // the same capability through the QUERY LANGUAGE: the beyond-
    // reference `correlate` statement — metric-level bucket-mean
    // correlation over the range, where/where-location composing like
    // any statement (epoch-aligned buckets: the alignment grid is
    // absolute, so different ranges' correlations are comparable)
    "ts_corr_json" -> ((s, dir) =>
      EntryUtil.engineFor(s, dir).execute(
        s"""{"correlate": {"metric": ["click", "purchase", "view"],
                           "step": "1h"},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // active-series counts through the query language: per metric, the
    // DISTINCT series with data in the range — "how many emitters are
    // alive", the churn dashboard readout; the scan reduces to distinct
    // (metric, series) pairs before counting (catalog-sized, never
    // sample-sized)
    "ts_active_json" -> ((s, dir) =>
      EntryUtil.engineFor(s, dir).execute(
        s"""{"active": {"metric": ["click", "purchase", "view"]},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // the stepped form: active series per 7d bin (bins anchored at
    // range.from, the group-aggregate rule)
    "ts_active_step_json" -> ((s, dir) =>
      EntryUtil.engineFor(s, dir).execute(
        s"""{"active": {"metric": ["click", "purchase", "view"],
                        "step": "7d"},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // the statement's lag path end-to-end: day-lag hourly correlation
    // through JSON (lag must be a whole number of steps)
    "ts_corr_json_lagged" -> ((s, dir) =>
      EntryUtil.engineFor(s, dir).execute(
        s"""{"correlate": {"metric": ["click", "purchase", "view"],
                           "step": "1h", "lag": "1d"},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // the lead/lag form: corr of each type at hour b with each other
    // type at hour b+24 — "does today's a predict tomorrow's b" (the
    // direction matters; key_a < key_b with the day lag on key_b)
    "ts_corr_lagged" -> ((s, dir) =>
      graft.ops.Stats.corrAligned(
          EntryUtil.rawEvents(s, dir)
            .select(col("event_type").as("metric"), col("ts"), col("value")),
          bucketNs = 3600000000000L, lagBuckets = 24L)
        .orderBy("key_a", "key_b")),

    // autocorrelation: per event type, the ACF of hourly bucket means
    // at lags 1h / 1d / 1w — the periodicity readout that justifies a
    // seasonal-band period choice; same integer-moment machinery, one
    // rollup-sized self-join
    "ts_autocorr" -> ((s, dir) =>
      graft.ops.Stats.autocorr(
          EntryUtil.rawEvents(s, dir)
            .select(col("event_type").as("metric"), col("ts"), col("value")),
          bucketNs = 3600000000000L, lags = Seq(1L, 24L, 168L))
        .orderBy("key", "lag")),

    // mergeable distinct-count rollup: per (event_type, day) KMV index
    // rows (the k minimal distinct user-id hashes), merged to serve the
    // whole-range distinct-user estimate — the distinct-count analog of
    // the histogram rollup (counts don't add across windows; k-min hash
    // SETS merge exactly, spec-pinned against the direct sketch). Build
    // once at ingest granularity, persist, serve any range
    "ts_distinct_rollup" -> ((s, dir) => {
      val dayNs = 86400000000000L
      val idx = graft.ops.Sketches.kmvIndex(
        EntryUtil.rawEvents(s, dir)
          .select(col("event_type"),
            graft.functions.VectorExpressions.longFloorDiv(col("ts"), dayNs)
              .as("day"),
            col("user_id").cast("string").as("uid")),
        "event_type", "day", "uid", k = 256)
      graft.ops.Sketches.kmvServe(idx, "event_type", k = 256)
        .orderBy("event_type")
    }),

    // the persisted KMV index serving alone: the daily index was
    // written as parquet at build time (EntryUtil.kmvIndexFor, the
    // ts_quantile_persisted pattern) and the estimate is served from
    // that parquet ONLY — PlanShapeSpec pins that no events scan
    // appears in the served plan. Same answers as ts_distinct_rollup,
    // same oracle
    "ts_distinct_persisted" -> ((s, dir) => {
      val path = EntryUtil.kmvIndexFor(s, dir)
      graft.ops.Sketches.kmvServe(
          s.read.parquet(s"$path/kmv"), "event_type", k = 256)
        .orderBy("event_type")
    }),

    // the KMV index maintained BY an executing stream (kmvBuild):
    // per-(type, day) k-min sets fold in 8·k-byte state, each hash
    // emitted the batch it is admitted (update mode); the sink is a
    // superset of every window's final k-min set, and serving re-cuts
    // to the k minimal — so the streamed estimate equals the batch
    // sketch EXACTLY (the histBuild contract, for distinct counts).
    // Click users only: the feed is one metric's rows, the harness
    // convention
    "stream_distinct_rollup" -> ((s, dir) => {
      implicit val enc =
        org.apache.spark.sql.Encoders.product[(String, Long, String)]
      val dayNs = 86400000000000L
      val rows = EntryUtil.clickUserRows(s, dir)
      val sink = EntryUtil.runStreamEntry(s, "stream_kmv_sink", rows,
        chunks = 4, cols = Seq("name", "ts", "value"),
        mkStream = graft.streaming.TsdbStream.kmvBuild(_, dayNs, k = 256),
        outputMode = "update")
      graft.ops.Sketches.kmvServe(
          sink.select(col("name").as("event_type"), col("h")),
          "event_type", k = 256)
        .orderBy("event_type")
    }),

    // incremental dedup probing the PERSISTED curation-time index
    // (Dedup.writeCorpusIndex: content hashes + band rows carrying
    // verify sets): identical result to docs_incremental_dedup — same
    // oracle — but the corpus side is an index READ; the corpus text is
    // never re-touched at ingest time (PlanShapeSpec pins that the only
    // corpus-side file scans are the index paths)
    "docs_incremental_dedup_indexed" -> ((s, dir) => {
      val path = EntryUtil.corpusIndexFor(s, dir)
      val batch = EntryUtil.repartitioned(s, dir, "documents")
        .where(col("doc_id") % Round6Entries.BatchMod === 0)
      graft.pipeline.Dedup.dedupAgainstIndex(
          s.read.parquet(s"$path/hashes"), s.read.parquet(s"$path/bands"),
          batch, "doc_id", "text")
        .orderBy("id")
    })
  )

  private def h60(s: String): String = EntryUtil.h60Sql(s)

  val oracle: Map[String, String] = Map(

    // the sampled-index replay: identical hash-sample predicate
    // (hash60(name|ns-ts) mod 1e6 < rate·1e6), med/MAD fit on the
    // sample only, flag over the full series frame. Statistics round to
    // 6dp before the compare (quantile_cont vs Spark percentile can
    // split on the last ulp — the ts_anomaly_mad precedent)
    "ts_anomaly_mad_sampled" ->
      s"""WITH s AS (SELECT 'click user=' || CAST(user_id AS VARCHAR) AS name,
               ts, value
             FROM events WHERE event_type = 'click'),
           sm AS (SELECT name, value FROM s
             WHERE ${h60("name || '|' || CAST(epoch_ns(ts) AS VARCHAR)")}
               % 1000000 < 0.5 * 1000000.0),
           med AS (SELECT name, round(quantile_cont(value, 0.5), 6) AS med
                   FROM sm GROUP BY name),
           mad AS (SELECT sm.name, m.med,
               round(quantile_cont(abs(sm.value - m.med), 0.5), 6) AS mad
             FROM sm JOIN med m USING (name) GROUP BY sm.name, m.med)
         SELECT s.name, epoch_us(s.ts) AS ts_us, round(s.value, 6) AS value,
           round(m.med, 6) AS med, round(m.mad, 6) AS mad
         FROM s JOIN mad m USING (name)
         WHERE abs(s.value - m.med) > m.mad * 3.0
         ORDER BY name, ts_us, value""",

    // day-truncated right timestamps make the ties; the dedup-to-MAX
    // subquery resolves them identically to the engine BEFORE native
    // ASOF runs (86400000000000 ns = 1 day; // is integer floor)
    "ts_asof_join_ties" ->
      s"""SELECT l.user_id AS user_id, epoch_us(l.ts) AS ts_us,
           round(l.value, 6) AS click, round(r.value, 6) AS view_asof
         FROM (SELECT user_id, ts, value FROM events
               WHERE event_type = 'click') l
         ASOF LEFT JOIN
           (SELECT user_id,
              make_timestamp(((epoch_ns(ts) // 86400000000000)
                * 86400000000000) // 1000) AS ts,
              max(value) AS value
            FROM events WHERE event_type = 'view' GROUP BY 1, 2) r
           ON l.user_id = r.user_id AND r.ts <= l.ts
         ORDER BY user_id, ts_us, click""",

    // probing the persisted index must yield exactly what the live-scan
    // form yields — ONE oracle for both
    "docs_incremental_dedup_indexed" -> Round6Entries.incrementalDedupSql,

    // transport must not change the transform: the file-source form
    // shares the MemoryStream form's oracle verbatim
    "stream_corpus_ingest_file" -> Round5Entries.oracle("stream_corpus_ingest"),

    // the histogram replay: identical integer bucketing (micro-unit
    // round, floor-log2 via bin()-string length, clear the low e−3
    // bits), cumulative counts, first bucket at or past ⌈p·n⌉. The
    // hourly build + merge on the Spark side collapses to one GROUP BY
    // here — counts adding across windows is exactly the claim
    "ts_quantile_hist" -> QuantileHistSql,

    // the signed-domain twin: identical bucketing replay over the
    // re-centered values (mirrored negative buckets)
    "ts_quantile_hist_signed" -> QuantileHistSignedSql,

    // the STREAM-built histogram must serve the same answers — counts
    // merging across finalized windows is the whole claim; one oracle
    "stream_quantile_hist" -> QuantileHistSql,

    // the JSON `quantile` statement over purchase in the canonical
    // window — same generator, range-filtered source, engine series
    // naming
    "ts_quantile_json" -> QuantileJsonSql,

    // index-served = scan-built exactly (counts are exact) — one oracle
    "ts_quantile_json_indexed" -> QuantileJsonSql,

    "ts_quantile_step" -> QuantileStepSql,

    // serving from the persisted parquet must answer exactly what the
    // in-session build answers — one oracle
    "ts_quantile_persisted" -> QuantileHistSql,

    // batch and streaming silence detection are interchangeable — one
    // oracle (the gap depends only on arrival timestamps, which both
    // forms see identically)
    "stream_gaps" -> GapsSql,

    // lag-window replay of the adaptive gap rule: identical mean-gap
    // division (same integers, same IEEE divide), identical (ts, value)
    // lag ordering
    "ts_gaps" -> GapsSql,

    // bands-only replay for the statement form
    "ts_seasonal_json" -> SeasonalJsonSql,

    // phase-banded replay: identical bit-bucketing per (name, hour-of-
    // day), identical band pivot, identical raw-value compares
    "ts_seasonal_outliers" -> SeasonalSql,

    // batch and streaming seasonal gates are interchangeable (the op
    // is stateless) — one oracle
    "stream_seasonal" -> SeasonalSql,

    // silence alerts = ns-exact gap episodes UNION terminally-silent
    // series whose ms-floored deadline precedes the final watermark
    // (sentinel event-µs // 1000 minus the 10-minute lateness)
    "stream_stale" ->
      """WITH s AS (SELECT 'click user=' || CAST(user_id AS VARCHAR) AS name,
               epoch_ns(ts) AS ts
             FROM events WHERE event_type = 'click'),
           l AS (SELECT name, ts,
               lag(ts) OVER (PARTITION BY name ORDER BY ts) AS prev
             FROM s),
           g AS (SELECT name, prev AS last_ts FROM l
             WHERE prev IS NOT NULL AND ts - prev > 43200000000000),
           w AS (SELECT ((max(ts) + 86400000000000) // 1000) // 1000
                   - 600000 AS wm FROM s),
           t AS (SELECT name, max(ts) AS last_ts FROM s GROUP BY name),
           term AS (SELECT t.name, t.last_ts FROM t, w
             WHERE (t.last_ts + 43200000000000) // 1000000 < w.wm)
         SELECT name, last_ts // 1000 AS last_ts_us
         FROM (SELECT * FROM g UNION ALL SELECT * FROM term)
         ORDER BY name, last_ts_us""",

    // the fixed-threshold form: same lag replay, constant cutoff
    "ts_gaps_abs" ->
      """WITH s AS (SELECT 'click user=' || CAST(user_id AS VARCHAR) AS name,
               epoch_us(ts) AS ts, value
             FROM events WHERE event_type = 'click'),
           l AS (SELECT name, ts,
               lag(ts) OVER (PARTITION BY name ORDER BY ts, value) AS prev
             FROM s)
         SELECT name, prev AS gap_start_us, ts AS gap_end_us,
           ts - prev AS gap_us
         FROM l WHERE prev IS NOT NULL AND ts - prev > 43200000000
         ORDER BY name, gap_start_us""",

    // integer-moment replay of the aligned correlation: identical
    // milli-quantized bucket means (same two divisions, same half-up
    // round), integer moment sums, one identically-shaped double
    // formula at the end
    "ts_corr_matrix" -> corrSql(0),

    // same replay with key_b's hourly bucket led by a day
    "ts_corr_lagged" -> corrSql(24),

    // distinct-user counts per metric = distinct series (series =
    // (metric, user) in the engine model)
    "ts_active_json" ->
      s"""SELECT event_type AS metric,
            CAST(count(DISTINCT user_id) AS BIGINT) AS n_series
          FROM events
          WHERE event_type IN ('click', 'purchase', 'view')
            AND epoch_ns(ts) >= ${EntryUtil.FromNs}
            AND epoch_ns(ts) < ${EntryUtil.ToNs}
          GROUP BY 1 ORDER BY 1""",

    // per-7d-bin active counts; bins anchored at range.from
    "ts_active_step_json" ->
      s"""SELECT event_type AS metric,
            (${EntryUtil.FromNs} + ((epoch_ns(ts) - ${EntryUtil.FromNs})
               // ${7L * 86400000000000L}) * ${7L * 86400000000000L})
              // 1000 AS ts_us,
            CAST(count(DISTINCT user_id) AS BIGINT) AS n_series
          FROM events
          WHERE event_type IN ('click', 'purchase', 'view')
            AND epoch_ns(ts) >= ${EntryUtil.FromNs}
            AND epoch_ns(ts) < ${EntryUtil.ToNs}
          GROUP BY 1, 2 ORDER BY 1, 2""",

    // the ACF replay — the ONE generator (Round9Entries.autocorrSql):
    // all types, unranged like the library entry, library key name
    "ts_autocorr" -> Round9Entries.autocorrSql(Nil, Seq(1, 24, 168),
      ranged = false, keyName = "key"),

    // the statement's day-lag form over the same range
    "ts_corr_json_lagged" -> corrSql(24,
      s"""WHERE event_type IN ('click', 'purchase', 'view')
            AND epoch_ns(ts) >= ${graft.entries.EntryUtil.FromNs}
            AND epoch_ns(ts) < ${graft.entries.EntryUtil.ToNs}"""),

    // the statement form: three metrics, engine range
    "ts_corr_json" -> corrSql(0,
      s"""WHERE event_type IN ('click', 'purchase', 'view')
            AND epoch_ns(ts) >= ${graft.entries.EntryUtil.FromNs}
            AND epoch_ns(ts) < ${graft.entries.EntryUtil.ToNs}"""),

    // the merged KMV rollup equals the direct sketch over the union
    // (k-min sets merge exactly), so the oracle replays the DIRECT
    // form: distinct user hashes, k smallest, same estimator
    "ts_distinct_rollup" -> kmvUserSql(""),

    // persisted-index serving: identical answers, one oracle
    "ts_distinct_persisted" -> kmvUserSql(""),

    // stream-built index re-cut at serve time = the direct sketch
    // over the clicks feed
    "stream_distinct_rollup" ->
      kmvUserSql("WHERE event_type = 'click'"),


    // backward + forward nearest via chained ASOF over the max-deduped
    // right side (ties resolved before ASOF, both directions); the
    // interpolation ratio uses µs integer diffs cast to double — the
    // engine's ns diffs are the same ratio exactly (both scale by 1000,
    // both products stay under 2^53)
    "ts_interp_join" ->
      """SELECT l.user_id AS user_id, epoch_us(l.ts) AS ts_us,
           round(l.value, 6) AS click,
           round(CASE
               WHEN b.ts IS NULL OR f.ts IS NULL THEN NULL
               WHEN f.ts = b.ts THEN b.value
               ELSE b.value + (f.value - b.value) *
                 (CAST(epoch_us(l.ts) - epoch_us(b.ts) AS DOUBLE) /
                  CAST(epoch_us(f.ts) - epoch_us(b.ts) AS DOUBLE))
             END, 6) AS view_interp
         FROM (SELECT user_id, ts, value FROM events
               WHERE event_type = 'click') l
         ASOF LEFT JOIN
           (SELECT user_id, make_timestamp(epoch_us(ts)) AS ts,
                   max(value) AS value
            FROM events WHERE event_type = 'view' GROUP BY 1, 2) b
           ON l.user_id = b.user_id AND b.ts <= l.ts
         ASOF LEFT JOIN
           (SELECT user_id, make_timestamp(epoch_us(ts)) AS ts,
                   max(value) AS value
            FROM events WHERE event_type = 'view' GROUP BY 1, 2) f
           ON l.user_id = f.user_id AND f.ts >= l.ts
         ORDER BY user_id, ts_us, click""",

    // the four extremes via rank-1 window rows — tie orderings mirror
    // the engine's lexicographic struct min/max exactly (first/last:
    // (ts, value); min/max: (value, ts)); day bucket on raw ns is the
    // µs-truncated bucket because the day width is µs-aligned
    "ts_m4_downsample" ->
      """WITH b AS (SELECT 'click user=' || CAST(user_id AS VARCHAR) AS name,
               epoch_ns(ts) // 86400000000000 AS bucket,
               epoch_us(ts) AS ts_us, value
             FROM events WHERE event_type = 'click'),
           r AS (SELECT *,
               row_number() OVER (PARTITION BY name, bucket
                 ORDER BY ts_us, value) AS rf,
               row_number() OVER (PARTITION BY name, bucket
                 ORDER BY ts_us DESC, value DESC) AS rl,
               row_number() OVER (PARTITION BY name, bucket
                 ORDER BY value, ts_us) AS rmin,
               row_number() OVER (PARTITION BY name, bucket
                 ORDER BY value DESC, ts_us DESC) AS rmax
             FROM b)
         SELECT name, bucket,
           max(CASE WHEN rf = 1 THEN ts_us END) AS first_ts_us,
           round(max(CASE WHEN rf = 1 THEN value END), 6) AS first_v,
           max(CASE WHEN rl = 1 THEN ts_us END) AS last_ts_us,
           round(max(CASE WHEN rl = 1 THEN value END), 6) AS last_v,
           max(CASE WHEN rmin = 1 THEN ts_us END) AS min_ts_us,
           round(max(CASE WHEN rmin = 1 THEN value END), 6) AS min_v,
           max(CASE WHEN rmax = 1 THEN ts_us END) AS max_ts_us,
           round(max(CASE WHEN rmax = 1 THEN value END), 6) AS max_v
         FROM r GROUP BY name, bucket
         ORDER BY name, bucket""",

    // counter build (running integer sum mod 10000 — RANGE-frame window
    // sum, so tied (ts, value) rows share a cumulative value in both
    // engines), lag-based increase with the reset rule, micro-unit
    // integer bucket sums (order-independent)
    "ts_counter_increase" ->
      """WITH s AS (SELECT 'click user=' || CAST(user_id AS VARCHAR) AS name,
               epoch_us(ts) AS ts_us, value
             FROM events WHERE event_type = 'click'),
           c AS (SELECT name, ts_us,
               CAST(((sum(CAST(round(value) AS BIGINT))
                   OVER (PARTITION BY name ORDER BY ts_us, value)
                 % 10000) + 10000) % 10000 AS DOUBLE) AS cv
             FROM s),
           l AS (SELECT name, ts_us, cv,
               lag(cv) OVER (PARTITION BY name ORDER BY ts_us, cv) AS pv
             FROM c),
           i AS (SELECT name, ts_us // 604800000000 AS bucket,
               CASE WHEN pv IS NULL THEN 0.0
                    WHEN cv >= pv THEN cv - pv
                    ELSE cv END AS inc
             FROM l)
         SELECT name, bucket,
           round(sum(CAST(round(inc * 1000000.0) AS BIGINT)) / 1000000.0, 6)
             AS increase
         FROM i GROUP BY name, bucket
         ORDER BY name, bucket"""
  )

  /** ONE histogram replay generator — the batch entry, its streaming
    * twin and the JSON `quantile` statement all mirror the identical
    * integer bucketing over their own source CTE. `lazy` callers: the
    * oracle map above initializes first and must not read these as null
    * (object vals initialize in declaration order). */
  def histQuantileSql(srcSql: String, keys: Seq[String],
      ps: Seq[String] = Seq("0.5", "0.95", "0.99")): String = {
    val k = keys.mkString(", ")
    val ck = keys.map("c." + _).mkString(", ")
    val nGroup = (1 to keys.size + 1).mkString(", ")
    val pVals = ps.map(p => s"('$p', $p)").mkString(", ")
    s"""WITH s AS ($srcSql),
           bq AS (SELECT $k, CAST(round(value * 1000000.0) AS BIGINT) AS q
                  FROM s),
           be AS (SELECT $k, q, abs(q) AS m,
                    length(bin(greatest(abs(q), 1))) - 1 AS e FROM bq),
           bs AS (SELECT $k, q, m,
                    CASE WHEN e - 3 > 0 THEN e - 3 ELSE 0 END AS sh FROM be),
           b AS (SELECT $k,
                   CASE WHEN m < 1 THEN 0
                        WHEN q > 0 THEN (m >> sh) << sh
                        ELSE -(((m >> sh) << sh) + (CAST(1 AS BIGINT) << sh))
                   END AS lo
                 FROM bs),
           h AS (SELECT $k, lo, count(*) AS cnt FROM b GROUP BY $nGroup),
           c AS (SELECT $k, lo,
                   sum(cnt) OVER (PARTITION BY $k ORDER BY lo) AS cum,
                   sum(cnt) OVER (PARTITION BY $k) AS n FROM h),
           p(p, pv) AS (VALUES $pVals)
         SELECT $ck, p.p, round(min(lo) / 1000000.0, 6) AS q
         FROM c, p WHERE cum >= ceil(n * pv)
         GROUP BY $ck, p.p
         ORDER BY $k, p"""
  }

  /** ONE correlation replay generator — the aligned matrix and the
    * lead/lag form differ only in the bucket join offset. Identical
    * milli-quantized bucket means, integer moments, one double formula. */
  def corrSql(lag: Int, where: String = "",
      bucketNs: Long = 3600000000000L): String =
    s"""WITH b AS (SELECT event_type AS k,
               epoch_ns(ts) // $bucketNs AS bk,
               CAST(round(sum(CAST(round(value * 1000000.0) AS BIGINT))
                   / count(*) / 1000.0) AS BIGINT) AS m
             FROM events $where GROUP BY 1, 2),
           p AS (SELECT l.k AS key_a, r.k AS key_b, l.m AS x, r.m AS y
             FROM b l JOIN b r ON l.bk = r.bk - $lag AND l.k < r.k),
           mo AS (SELECT key_a, key_b, count(*) AS n,
               sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
               sum(x * x) AS sxx, sum(y * y) AS syy
             FROM p GROUP BY 1, 2),
           md AS (SELECT key_a, key_b, n,
               CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
               CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
               CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
             FROM mo)
         SELECT key_a, key_b, CAST(n AS BIGINT) AS n_buckets,
           round(CASE WHEN sqrt(nd * sxxd - sxd * sxd) *
                           sqrt(nd * syyd - syd * syd) > 0
                 THEN (nd * sxyd - sxd * syd) /
                      (sqrt(nd * sxxd - sxd * sxd) *
                       sqrt(nd * syyd - syd * syd))
                 END, 6) AS corr
         FROM md ORDER BY key_a, key_b"""

  /** ONE KMV replay generator — the batch rollup, the persisted-index
    * serve and the stream-built form all mirror the identical direct
    * sketch (k-min sets merge exactly, so every serving path equals
    * it): distinct user hash60s, k smallest, the (k−1)·2⁶⁰/h_k
    * estimator. Declared as a def: the oracle map initializes before
    * this object's lazy vals. */
  def kmvUserSql(where: String): String =
    s"""WITH t AS (SELECT DISTINCT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                 AS BIGINT) AS h
             FROM events $where),
           r AS (SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
             FROM t),
           kk AS (SELECT event_type, max(h) AS hk, count(*) AS n
             FROM r WHERE r <= 256 GROUP BY event_type)
         SELECT event_type, CAST(n AS BIGINT) AS n_kept,
           round(CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
                 ELSE 255.0 * 1152921504606846976.0 / hk END, 6)
             AS est_distinct
         FROM kk ORDER BY event_type"""

  /** ONE seasonal-band CTE generator: given a source CTE producing at
    * least ($key, phase, value), emit the WITH chain ending in a
    * `bands($key, phase, lo, hi)` CTE — identical integer bucketing,
    * band quantiles and hull edges for every seasonal oracle (the JSON
    * statement, its indexed and group-by twins, and the outlier
    * replays), which append their own final SELECT. The playbook rule:
    * one arithmetic mirror, never hand-copied. */
  def seasonalBandCtes(srcSql: String, key: String): String =
    s"""WITH s AS ($srcSql),
           bq AS (SELECT $key, phase,
               CAST(round(value * 1000000.0) AS BIGINT) AS q FROM s),
           be AS (SELECT $key, phase, q, abs(q) AS m,
               length(bin(greatest(abs(q), 1))) - 1 AS e FROM bq),
           bs AS (SELECT $key, phase, q, m,
               CASE WHEN e - 3 > 0 THEN e - 3 ELSE 0 END AS sh FROM be),
           b AS (SELECT $key, phase,
               CASE WHEN m < 1 THEN 0
                    WHEN q > 0 THEN (m >> sh) << sh
                    ELSE -(((m >> sh) << sh) + (CAST(1 AS BIGINT) << sh))
               END AS lo
             FROM bs),
           h AS (SELECT $key, phase, lo, count(*) AS cnt
             FROM b GROUP BY 1, 2, 3),
           c AS (SELECT $key, phase, lo,
               sum(cnt) OVER (PARTITION BY $key, phase ORDER BY lo) AS cum,
               sum(cnt) OVER (PARTITION BY $key, phase) AS n FROM h),
           p(p, pv) AS (VALUES ('0.25', 0.25), ('0.75', 0.75)),
           qr AS (SELECT c.$key, c.phase, p.p, min(lo) AS lo_key
             FROM c, p WHERE cum >= ceil(n * pv) GROUP BY 1, 2, 3),
           bk AS (SELECT $key, phase,
               min(CASE WHEN p = '0.25' THEN lo_key END) AS lok,
               min(CASE WHEN p = '0.75' THEN lo_key END) AS hik
             FROM qr GROUP BY 1, 2),
           bands AS (SELECT $key, phase,
               round((CASE WHEN lok = 0 THEN -1 ELSE lok END)
                 / 1000000.0, 6) AS lo,
               round((CASE WHEN hik = 0 THEN 1
                      WHEN hik > 0 THEN hik + (CAST(1 AS BIGINT) <<
                        greatest(length(bin(hik)) - 4, 0))
                      ELSE hik + (CAST(1 AS BIGINT) <<
                        (CASE WHEN ((-hik) & ((-hik) - 1)) = 0
                         THEN greatest(length(bin(-hik)) - 5, 0)
                         ELSE greatest(length(bin(-hik)) - 4, 0) END))
                      END) / 1000000.0, 6) AS hi
             FROM bk)"""

  /** Bands-only replay for the `seasonal` statement: per (series,
    * 6h phase) [p25, p75] bucket hulls over the ranged purchases.
    * Shared with Round8's index-served twin (served bands equal
    * scan-built bands exactly — counts are exact). */
  lazy val SeasonalJsonSql: String =
    seasonalBandCtes(
      s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR))
                 AS series, value,
               (epoch_ns(ts) % 86400000000000) // 21600000000000 AS phase
             FROM events
             WHERE event_type = 'purchase'
               AND epoch_ns(ts) >= ${EntryUtil.FromNs}
               AND epoch_ns(ts) < ${EntryUtil.ToNs}""", "series") +
    """
         SELECT series, CAST(phase AS BIGINT) AS phase, lo, hi
         FROM bands ORDER BY series, phase"""

  /** ONE phase-band replay for the batch entry and its streaming
    * twin (the op is stateless, so transport cannot change it). */
  private lazy val SeasonalSql: String =
    seasonalBandCtes(
      """SELECT 'click' AS name,
               epoch_ns(ts) AS ts, value,
               (epoch_ns(ts) % 86400000000000) // 3600000000000 AS phase
             FROM events WHERE event_type = 'click'""", "name") +
    """
         SELECT s.name, s.ts // 1000 AS ts_us, round(s.value, 6) AS value,
           CAST(s.phase AS BIGINT) AS phase, bands.lo, bands.hi
         FROM s JOIN bands USING (name, phase)
         WHERE CAST(round(s.value * 1000000.0) AS BIGINT)
                 < CAST(round(bands.lo * 1000000.0) AS BIGINT)
            OR CAST(round(s.value * 1000000.0) AS BIGINT)
                 > CAST(round(bands.hi * 1000000.0) AS BIGINT)
         ORDER BY name, ts_us, value"""

  private lazy val QuantileHistSql: String = histQuantileSql(
    """SELECT 'click user=' || CAST(user_id AS VARCHAR) AS name, value
             FROM events WHERE event_type = 'click'""", Seq("name"))

  private lazy val QuantileHistSignedSql: String = histQuantileSql(
    """SELECT 'click user=' || CAST(user_id AS VARCHAR) AS name,
               value - 33.0 AS value
             FROM events WHERE event_type = 'click'""", Seq("name"),
    ps = Seq("0.25", "0.5", "0.75"))

  lazy val QuantileJsonSql: String = histQuantileSql(
    s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
               value
             FROM events
             WHERE event_type = 'purchase'
               AND epoch_ns(ts) >= ${EntryUtil.FromNs}
               AND epoch_ns(ts) < ${EntryUtil.ToNs}""", Seq("series"))

  /** The ONE adaptive-gap replay for the batch entry and its streaming
    * twin: identical mean-gap division (same integers, same IEEE
    * divide), identical (ts, value) lag ordering. */
  private lazy val GapsSql: String =
    """WITH s AS (SELECT 'click user=' || CAST(user_id AS VARCHAR) AS name,
               epoch_us(ts) AS ts, value
             FROM events WHERE event_type = 'click'),
           st AS (SELECT name,
               CAST(max(ts) - min(ts) AS DOUBLE) /
                 CAST(count(*) - 1 AS DOUBLE) AS mg
             FROM s GROUP BY name HAVING count(*) >= 2),
           l AS (SELECT name, ts,
               lag(ts) OVER (PARTITION BY name ORDER BY ts, value) AS prev
             FROM s)
         SELECT l.name, prev AS gap_start_us, ts AS gap_end_us,
           ts - prev AS gap_us
         FROM l JOIN st USING (name)
         WHERE prev IS NOT NULL AND CAST(ts - prev AS DOUBLE) > mg * 3.0
         ORDER BY name, gap_start_us"""

  /** 7d-binned variant for the stepped statement (bins anchored at the
    * range start — the group-aggregate rule; ts_us = bin start in µs).
    * Shared with Round8's index-served twin — one oracle, two plans. */
  lazy val QuantileStepSql: String = histQuantileSql(
    s"""SELECT concat('purchase user=', CAST(user_id AS VARCHAR)) AS series,
               (${EntryUtil.FromNs} + ((epoch_ns(ts) - ${EntryUtil.FromNs})
                  // ${7L * 86400000000000L}) * ${7L * 86400000000000L})
                 // 1000 AS ts_us,
               value
             FROM events
             WHERE event_type = 'purchase'
               AND epoch_ns(ts) >= ${EntryUtil.FromNs}
               AND epoch_ns(ts) < ${EntryUtil.ToNs}""",
    Seq("series", "ts_us"))
}
