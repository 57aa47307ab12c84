package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 driver entries: the persisted index catalog — statements
  * served through a registration LOADED from storage
  * ([[graft.model.IndexCatalog]]), sharing one oracle each with their
  * hand-wired twins because the catalog hop must change nothing — and
  * the MinHash banding sweep, the tuning table the round-9 trust
  * readout promised.
  */
object Round10Entries {

  /** The banding grid the sweep measures: (numPerm, bands). Contiguous
    * row-block banding makes the candidate sets NESTED at fixed
    * numPerm — a pair matching a coarse band (all 8 minima equal)
    * matches every constituent finer band — so recall is monotone in
    * bands down the 32-perm rows, and the 16-perm row isolates the
    * permutation-count effect at the same rows-per-band as (32, 8). */
  val SweepConfigs: Seq[(Int, Int)] =
    Seq((16, 4), (32, 4), (32, 8), (32, 16))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // the LSH TUNING TABLE the round-9 trust readout promised
    // (Dedup.bandingSweep): pairEval over the (bands × permutations)
    // grid against ONE exact capped-jaccard baseline — recall/precision
    // per banding in a single frame, the artifact an operator reads to
    // pick a banding BEFORE trading the exact pass away at corpus
    // scale. The corpus is SCANNED ONCE for the whole table (shared
    // scope-cached shingle hashes; one signature frame per distinct
    // numPerm), every side pair-sized, never a corpus self-join
    "docs_minhash_sweep" -> ((s, dir) =>
      graft.pipeline.Dedup.bandingSweep(
          EntryUtil.repartitioned(s, dir, "documents"), "doc_id", "text",
          k = 3, threshold = 0.8, configs = SweepConfigs,
          maxShingleFreq = Some(20))
        .orderBy("num_perm", "bands")),

    // group-aggregate served through a LOADED index catalog: the hourly
    // rollup was built, SAVED (parquet + manifest) and re-registered by
    // IndexCatalog.load onto a fresh base context — the restart path the
    // reference covers with its sqlite metastorage (meta_storage.h:44+).
    // Same statement and oracle as ts_group_aggregate_rollup: loading a
    // registration from storage is invisible to answers
    "ts_group_aggregate_catalog" -> ((s, dir) =>
      EntryUtil.usView(EntryUtil.engineCatalogFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["min", "max", "cnt"]},
             "range": {"from": "20240101T003000", "to": "20240331T233000"}}"""),
        valueCols = Seq("min", "max", "cnt"))),

    // the anomaly statement served from the LOADED med/MAD index — the
    // second family through the same catalog round-trip, proving load
    // reconstructs parameterized IndexDefs (build range), not just
    // step-keyed frames; one oracle with ts_anomaly_json_indexed
    "ts_anomaly_catalog" -> ((s, dir) =>
      EntryUtil.engineCatalogFor(s, dir).execute(
        s"""{"anomaly": {"metric": "purchase", "c": 3.0},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // the FULL restart story: TsdbLayout.writeDatabase persists
    // catalog + events + the partitioned/sorted samples layout + the
    // index catalog as ONE directory; openDatabase reconstructs the
    // whole context from storage and this statement serves through it
    // — rollup interior from the loaded index, range edges from the
    // PRUNED layout scan, nothing re-derived from code (the
    // reference's volumes + metastorage restart unit). Same statement
    // and oracle as ts_group_aggregate_rollup
    "ts_group_aggregate_opened_db" -> ((s, dir) =>
      EntryUtil.usView(EntryUtil.engineOpenedDbFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["min", "max", "cnt"]},
             "range": {"from": "20240101T003000", "to": "20240331T233000"}}"""),
        valueCols = Seq("min", "max", "cnt"))),

    // LIVE ingest into the queryable layout: a REAL Structured
    // Streaming query (TsdbStream.layoutIngest) sank the purchase
    // rows through Spark's transactional file sink into the
    // metric/ts_day-partitioned layout — exactly-once files,
    // kill/restart pinned in StreamingSpec — and this SELECT reads
    // the directory through the ordinary layout path: streamed-in
    // data is immediately queryable with pruning intact, no batch
    // rewrite in between. Same statement and oracle as
    // ts_layout_select (the batch-written layout twin)
    "stream_layout_ingest" -> ((s, dir) => {
      val path = EntryUtil.streamIngestedLayoutFor(s, dir)
      val base = EntryUtil.engineFor(s, dir).ctx
      EntryUtil.usView(new graft.engine.Engine(
        graft.model.TsdbLayout.contextOver(s, path, base.series, base.events))
        .execute(
          s"""{"select": "purchase",
               "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"},
               "where": {"user": ["2", "4", "6", "8"]}}"""))
    }),

    // the TWO-TIER database end-to-end: the batch layout owns the
    // window's first 19 days (the testdata spans January), a real
    // stream delivered Jan 20-30 into the L0 tier, and compactL0
    // claimed days 20-24 into the batch layout (watermark Jan 25) —
    // this select reads THREE provenances (batch, compacted-from-
    // stream, live L0) through one opened context and must equal the
    // plain scan exactly: tier flips change plans, never answers.
    // Oracle shared with ts_layout_select
    "ts_select_l0_db" -> ((s, dir) =>
      EntryUtil.usView(EntryUtil.engineL0DbFor(s, dir).execute(
        s"""{"select": "purchase",
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"},
             "where": {"user": ["2", "4", "6", "8"]}}"""))),

    // the LOG half of the database directory: writeDatabase lays out
    // events partitioned by (metric, ts_day) exactly like samples, and
    // select-events through the OPENED database pushes both partition
    // predicates (plan-pinned in LayoutSpec) — the reference's event
    // series get the same two-level pruning as metrics at 100 TB.
    // Same statement and oracle as ts_select_events_regex
    "ts_select_events_opened_db" -> ((s, dir) =>
      EntryUtil.usView(EntryUtil.engineOpenedDbFor(s, dir).execute(
        s"""{"select-events": "!log",
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"},
             "filter": "\\"k\\": 4[0-9]"}"""), valueCols = Nil)))

  /** One sweep config's mirror CTEs + metrics row: the SAME
    * [[EntryUtil.minhashSqlParts]] generator the docs_minhash_pairs
    * oracle replays, parameterized per (numPerm, bands) and reading
    * the SHARED materialized shingle/base-hash/size CTEs (DuckDB would
    * otherwise inline the shingle chain once per reference —
    * 4 configs × 3 reads — and blow up). */
  private def sweepConfigSql(np: Int, b: Int): (String, String) = {
    val (minSelects, bandKeys) = EntryUtil.minhashSqlParts(np, b)
    val p = s"${np}_$b"
    val ctes =
      s"""mh_$p AS (SELECT doc_id, $minSelects FROM shb GROUP BY doc_id),
          bd_$p AS (SELECT doc_id, b AS band, CASE b $bandKeys END AS band_key
            FROM mh_$p, UNNEST(generate_series(0, ${b - 1})) AS t(b)),
          cd_$p AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
            FROM bd_$p x JOIN bd_$p y ON x.band = y.band
              AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
          vr_$p AS (SELECT id_a, id_b, count(*) AS c
            FROM cd_$p JOIN shm sa ON sa.doc_id = id_a
              JOIN shm sb ON sb.doc_id = id_b AND sa.g = sb.g
            GROUP BY id_a, id_b),
          ap_$p AS (SELECT id_a, id_b FROM vr_$p
            JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b
            WHERE c * 1.0 / (za.n + zb.n - c) >= 0.8)"""
    val row =
      s"""SELECT $np AS num_perm, $b AS bands,
            (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_exact,
            (SELECT CAST(count(*) AS BIGINT) FROM ap_$p) AS n_approx,
            (SELECT CAST(count(*) AS BIGINT)
             FROM e JOIN ap_$p USING (id_a, id_b)) AS n_hit"""
    (ctes, row)
  }

  // lazy: references sibling entry objects' oracle maps, and cross-object
  // initialization order at JVM clinit is otherwise circular
  lazy val oracle: Map[String, String] = Map(

    // the grid mirror: shared shingles/base-hashes/sizes/exact-baseline,
    // then per config the docs_minhash_pairs CTE chain via the one
    // shared generator and a three-count metrics row; ratios
    // zero-guarded like pairEval. NOT materialized: AS MATERIALIZED
    // anywhere in this nested-WITH + scalar-subquery shape trips a
    // DuckDB INTERNAL error ("Recursive CTE scan found without
    // recursive CTE node"); the fully-inlined chain is ~2 s at sf0.01
    "docs_minhash_sweep" -> {
      val per = SweepConfigs.map { case (np, b) => sweepConfigSql(np, b) }
      s"""WITH ${PipelineEntries.shinglesCte},
           shm AS (SELECT doc_id, g FROM sh),
           shb AS (SELECT doc_id,
             ${EntryUtil.h60Sql("g")} % ${graft.pipeline.Dedup.MinhashPrime}
               AS hb FROM shm),
           sz AS (SELECT doc_id, count(*) AS n
             FROM shm GROUP BY doc_id),
           e AS (SELECT DISTINCT id_a, id_b
             FROM (${PipelineEntries.oracle("docs_jaccard_pairs")})),
           ${per.map(_._1).mkString(",\n")}
         SELECT num_perm, bands, n_exact, n_approx, n_hit,
           CASE WHEN n_approx > 0 THEN round(n_hit / n_approx, 6) END
             AS precision,
           CASE WHEN n_exact > 0 THEN round(n_hit / n_exact, 6) END
             AS recall
         FROM (${per.map(_._2).mkString(" UNION ALL ")})
         ORDER BY num_perm, bands"""
    },
    // catalog-loaded = hand-wired exactly — one replay each
    "ts_group_aggregate_catalog" ->
      Round2Entries.oracle("ts_group_aggregate_rollup"),
    "ts_anomaly_catalog" -> Round9Entries.oracle("ts_anomaly_json_indexed"),
    "ts_group_aggregate_opened_db" ->
      Round2Entries.oracle("ts_group_aggregate_rollup"),
    // stream-ingested layout = batch-written layout exactly
    "stream_layout_ingest" -> Round5Entries.oracle("ts_layout_select"),
    // three-provenance read = the plain scan exactly
    "ts_select_l0_db" -> Round5Entries.oracle("ts_layout_select"),
    // laid-out events = the flat events frame exactly
    "ts_select_events_opened_db" ->
      TsdbEntries.oracle("ts_select_events_regex"))
}
