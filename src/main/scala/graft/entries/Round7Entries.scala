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
    "stream_corpus_ingest_file" -> Round5Entries.oracle("stream_corpus_ingest")
  )
}
