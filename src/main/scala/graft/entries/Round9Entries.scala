package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 driver entries: corpus-scale weak labeling, the bucket-sums
  * compaction ladder, SQL set ops, the registered MAD index — the
  * round-8 verdict's asks, each with its DuckDB mirror.
  */
object Round9Entries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // corpus-scale kNN weak labeling: the SEED side (20 hand-labeled
    // vectors) broadcasts and the corpus-sized query side streams
    // through — codebook fit on the seeds, in-row probe-cell
    // assignment (no shuffle ever carries a corpus vector,
    // plan-pinned), broadcast cell join, (qid, id, cos) top-k,
    // broadcast label join, qid-keyed vote. The production direction
    // of emb_knn_label: labels for the WHOLE corpus from a seed set,
    // deterministic end to end so the oracle replays codebook, probes,
    // neighbor cut AND vote
    "emb_knn_label_ivf" -> ((s, dir) => {
      val emb = EntryUtil.repartitioned(s, dir, "embeddings")
      graft.pipeline.Similarity.knnLabelIvf(
          emb.where(col("vec_id") < 20)
            .select(col("vec_id").as("id"), col("embedding"), col("label")),
          emb.where(col("vec_id") >= 20)
            .select(col("vec_id").as("qid"), col("embedding")),
          k = 3, nlist = 4, nprobe = 2, iters = 2)
        .orderBy("qid")
    }),

    // the bucket-sums COMPACTION LADDER serving: the day-level index is
    // built FROM the hour parquet (Stats.bucketSumsCompact — µu sums
    // and counts add, raw samples scanned exactly once) and registered
    // coarsest-first, so this day-step whole-range trend serves from
    // 1/24th the index rows; hour-aligned statements fall through to
    // the hour level (plan-pinned). Same answers as the scan — one
    // oracle with ts_trend_json_indexed (trendSql); the histogram
    // ladder (ts_quantile_ladder) for the integer-moment statements
    "ts_trend_ladder" -> ((s, dir) =>
      EntryUtil.engineBucketSumsLadderFor(s, dir).execute(
        s"""{"trend": {"metric": ["click", "purchase", "view"],
                       "step": "1d"},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // correlate rides the same ladder rung: the day-step matrix reads
    // the day-level index rows (1/24th of the hour level; sums add),
    // same answers as the scan — the ladder witness for the pair
    // statement (trend's is ts_trend_ladder; the serving core is one)
    "ts_corr_ladder" -> ((s, dir) =>
      EntryUtil.engineBucketSumsLadderFor(s, dir).execute(
        s"""{"correlate": {"metric": ["click", "purchase", "view"],
                           "step": "1d"},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // SQL SET OPS (the last named SURVEY §2.8 item): retention cohorts
    // via INTERSECT / EXCEPT over registerViews — purchasers active in
    // both of the range's first two weeks, lapsed after week one, and
    // new in week two. The reference's ts-alignment joins cannot ask
    // set-membership questions across ranges; the relational surface
    // answers them in one statement, oracle-gated like the rest of the
    // ts_sql_* trio
    "ts_sql_set_ops" -> ((s, dir) => {
      EntryUtil.engineFor(s, dir).ctx.registerViews()
      val wk = 7L * 86400000000000L
      val (w0, w1, w2) =
        (EntryUtil.FromNs, EntryUtil.FromNs + wk, EntryUtil.FromNs + 2 * wk)
      s.sql(
        s"""WITH a AS (
              SELECT DISTINCT se.tags['user'] AS user
              FROM tsdb_samples sa JOIN tsdb_series se
                ON sa.series_id = se.series_id
              WHERE se.metric = 'purchase'
                AND sa.ts >= $w0 AND sa.ts < $w1),
            b AS (
              SELECT DISTINCT se.tags['user'] AS user
              FROM tsdb_samples sa JOIN tsdb_series se
                ON sa.series_id = se.series_id
              WHERE se.metric = 'purchase'
                AND sa.ts >= $w1 AND sa.ts < $w2)
            SELECT 'both_weeks' AS cohort, user
            FROM (SELECT user FROM a INTERSECT SELECT user FROM b)
            UNION ALL
            SELECT 'lapsed' AS cohort, user
            FROM (SELECT user FROM a EXCEPT SELECT user FROM b)
            UNION ALL
            SELECT 'new' AS cohort, user
            FROM (SELECT user FROM b EXCEPT SELECT user FROM a)
            ORDER BY cohort, user""")
    }),

    // the anomaly statement SERVED from a REGISTERED med/MAD index
    // (Monitoring.madIndex persisted over the canonical range, the
    // ctx.histograms pattern for robust statistics): the exact-range
    // statement skips both percentile fit passes — the per-series-
    // buffering half — and judges the one ranged fact pass against the
    // broadcast index rows; flags identical to the scan fit (one
    // oracle with ts_anomaly_json), no-percentile plan-pinned
    "ts_anomaly_json_indexed" -> ((s, dir) =>
      EntryUtil.engineMadFor(s, dir).execute(
        s"""{"anomaly": {"metric": "purchase", "c": 3.0},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // the stale statement SERVED from the registered rollup (the
    // servedActive rule pointed at the ts_max accumulator): per-series
    // max over covered bins' ts_max IS the max raw ts under whole-bin
    // alignment, so the heartbeat readout — an operational query run
    // constantly — reads series x bins index rows, never raw samples;
    // same oracle as ts_stale_json, no-facts plan-pinned
    "ts_stale_rollup" -> ((s, dir) =>
      EntryUtil.engineRollupFor(s, dir).execute(
        s"""{"stale": {"metric": "purchase", "older-than": "30d"},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // the gaps factor statement SERVED from a REGISTERED gap-cadence
    // index (Monitoring.gapThresholdIndex persisted over the canonical
    // range at factor 3 — the MadIndexDef pattern for the adaptive gap
    // rule): the matching statement skips the cadence-model
    // aggregation and flags one ranged fact pass against the broadcast
    // parquet thresholds; identical intervals (one oracle with
    // ts_gaps_json_factor), plan-pinned
    "ts_gaps_factor_indexed" -> ((s, dir) =>
      EntryUtil.engineGapFor(s, dir).execute(
        s"""{"gaps": {"metric": "click", "factor": 3.0},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // the autocorr STATEMENT (the ts_autocorr library op promoted to
    // the query language): per-metric ACF of hourly bucket means at
    // 1h/1d/7d lags — the periodicity readout that justifies a
    // seasonal period choice, now where/range/location-composable
    "ts_autocorr_json" -> ((s, dir) =>
      EntryUtil.engineFor(s, dir).execute(
        s"""{"autocorr": {"metric": ["click", "purchase", "view"],
                          "step": "1h", "lags": ["1h", "1d", "7d"]},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // the same statement SERVED from the registered bucket-sums index
    // (the correlate/trend serving core — the ACF consumes exactly the
    // (metric, bucket, mean) frame the index reduces to): no fact
    // scan, same coefficients, one oracle with the scan form
    "ts_autocorr_json_indexed" -> ((s, dir) =>
      EntryUtil.engineBucketSumsFor(s, dir).execute(
        s"""{"autocorr": {"metric": ["click", "purchase", "view"],
                          "step": "1h", "lags": ["1h", "1d", "7d"]},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")),

    // recall@3 of the seed-probe path against the brute neighbors on
    // the same seeds — the emb_ivf_recall readout for the corpus-query
    // direction: before trusting knnLabelIvf's labels, measure what
    // fraction of each query's true nearest seeds the probed cells
    // actually contain (tune nlist/nprobe against it)
    "emb_seed_recall" -> ((s, dir) => {
      val emb = EntryUtil.repartitioned(s, dir, "embeddings")
      val seeds = emb.where(col("vec_id") < 20 && col("label").isNotNull)
        .select(col("vec_id").as("id"), col("embedding"))
      val queries = emb.where(col("vec_id") >= 20)
        .select(col("vec_id").as("qid"), col("embedding"))
      graft.pipeline.Similarity.recallAtK(
          graft.pipeline.Similarity.knnSeedProbe(
            graft.pipeline.Similarity.fitCodebook(seeds, nlist = 4, iters = 2),
            seeds, queries, k = 3, nprobe = 2),
          graft.pipeline.Similarity.knnBrute(seeds, queries, k = 3))
        .orderBy("qid")
    }),

    // label-driven corpus filtering — the weak labels put to WORK: the
    // corpus-scale labeler assigns every non-seed embedding a tier
    // from the 20 hand-labeled seeds, and documents whose embedding
    // drew a low tier (< 5) survive — the "filter by weakly-labeled
    // quality tier" curation stage, composing the embeddings and
    // documents tables by shared id. Broadcast-seed labeling + one
    // id equi-join; no corpus-sized broadcast anywhere
    "docs_label_filter" -> ((s, dir) => {
      val emb = EntryUtil.repartitioned(s, dir, "embeddings")
      val labels = graft.pipeline.Similarity.knnLabelIvf(
        emb.where(col("vec_id") < 20)
          .select(col("vec_id").as("id"), col("embedding"), col("label")),
        emb.where(col("vec_id") >= 20)
          .select(col("vec_id").as("qid"), col("embedding")),
        k = 3, nlist = 4, nprobe = 2, iters = 2)
      labels.where(col("label") < 5)
        .join(EntryUtil.repartitioned(s, dir, "documents"),
          col("qid") === col("doc_id"))
        .select(col("doc_id"), col("label"), col("votes"))
        .orderBy("doc_id")
    }),

    // LSH trust readout (the emb_ivf_recall discipline for dedup):
    // recall/precision of the MinHash-banded verified pairs against
    // the exact capped-jaccard baseline on the same corpus — the
    // number to tune bands/permutations against before trading the
    // exact pass away. Both sides are the library's own named
    // baselines (docs_minhash_pairs / docs_jaccard_pairs parameters)
    "docs_minhash_eval" -> ((s, dir) => {
      val d = EntryUtil.repartitioned(s, dir, "documents")
      graft.pipeline.Dedup.pairEval(
        graft.pipeline.Dedup.minhashPairs(d, "doc_id", "text",
          k = 3, numPerm = 32, bands = 8, threshold = 0.8),
        graft.pipeline.Dedup.jaccardPairs(d, "doc_id", "text",
          k = 3, threshold = 0.8, maxShingleFreq = Some(20)))
    }),

    // split-leakage AUDIT (the verification half of group-safe
    // splitting): the matrix of near-dup pair counts per split
    // combination, under the NAIVE per-doc content-hash assignment
    // AND the group-safe one — off-diagonal cells are train/test
    // leakage, zero by construction for the group-safe scheme. The
    // number a release pipeline gates on, measured rather than assumed
    "docs_split_leakage" -> ((s, dir) => {
      // the pair spine is scoped-cached inside groupSafeSplitsFor —
      // the group pass and both matrices share one jaccard run
      val (pairs, safe) = PipelineEntries.groupSafeSplitsFor(s, dir)
      val p = pairs.select("id_a", "id_b")
      val naive = graft.pipeline.TextOps.assignSplits(
        EntryUtil.repartitioned(s, dir, "documents"), "doc_id", "text")
      def m(splits: org.apache.spark.sql.DataFrame, scheme: String) =
        graft.pipeline.TextOps.splitLeakage(p, splits)
          .select(lit(scheme).as("scheme"), col("split_a"),
            col("split_b"), col("n_pairs"))
      m(naive, "naive")
        .unionByName(m(safe.select(col("doc_id").as("id"), col("split")),
          "group_safe"))
        .orderBy("scheme", "split_a", "split_b")
    }),

    // hard-negative mining for contrastive training pairs: per query,
    // the 3 most similar embeddings inside the cosine band [0.2, 0.5)
    // — informative negatives above random, below the near-dup cut
    // (the emb_dup_pairs threshold region). knnBrute's plan with a
    // rounded-band cut before the top-k
    "emb_hard_negatives" -> ((s, dir) => {
      val emb = EntryUtil.repartitioned(s, dir, "embeddings")
      graft.pipeline.Similarity.hardNegatives(
          emb.select(col("vec_id").as("id"), col("embedding")),
          emb.where(col("vec_id") < 10)
            .select(col("vec_id").as("qid"), col("embedding")),
          k = 3, loCos = 0.2, hiCos = 0.5)
        .orderBy("qid", "rank")
    }),

    // embedding-distribution drift, localized per IVF cell (the
    // ingest-drift monitor pointed at embedding space): every 5th
    // embedding plays the incoming batch and each codebook cell
    // reports its share of batch vs corpus — the readout that catches
    // "this crawl is suddenly 3x heavier in one mode" before it skews
    // training mixes. Same memoized codebook + assignment arithmetic
    // as emb_knn_ivf, so the oracle reuses the shared kmeans CTEs
    "emb_cell_drift" -> ((s, dir) => {
      val emb = EntryUtil.repartitioned(s, dir, "embeddings")
      graft.pipeline.Similarity.cellDrift(
          EntryUtil.ivfCodebookFor(s, dir),
          emb.select(col("vec_id").as("id"), col("embedding")),
          emb.where(col("vec_id") % 5 === 0)
            .select(col("vec_id").as("id"), col("embedding")))
        .orderBy("cell")
    }),

    // the ACF over the STREAM-maintained bucket-mean index (the
    // stream_corr machinery pointed at periodicity): the sink's
    // integer ingredients reduce through the SAME mean formula and lag
    // machinery as the batch scan, so the streamed ACF equals the
    // batch bit-for-bit — one oracle. The sentinel only pushes the
    // watermark: its own far-future bucket never finalizes and stays
    // out of the sink (the runStreamEntry contract), so nothing can
    // pair with real history through the lag join
    "stream_autocorr" -> ((s, dir) => {
      implicit val enc =
        org.apache.spark.sql.Encoders.product[(String, Long, Double)]
      val hourNs = 3600000000000L
      val rows = EntryUtil.typedEventRows(s, dir, Seq("click", "view"))
      val maxTs = rows.iterator.map(_._2).max
      val sink = EntryUtil.runStreamEntry(s, "stream_acf_sink", rows,
        chunks = 4, cols = Seq("name", "ts", "value"),
        mkStream = graft.streaming.TsdbStream.bucketMeansBuild(_, hourNs,
          "10 minutes"),
        sentinel = Some((rows.head._1, maxTs + 86400000000000L, 0.0)))
      graft.ops.Stats.autocorrFromBucketMeans(
          graft.ops.Stats.meansFromSums(sink, "name"),
          "name", lags = Seq(1L, 24L))
        .select(col("name").as("metric"), col("lag"),
          col("n_buckets"), col("corr"))
        .orderBy("metric", "lag")
    }))

  private val labeledSeedSrc =
    """SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       FROM embeddings WHERE vec_id < 20 AND label IS NOT NULL"""

  /** The seed-probe CTE chain shared by the labeling and recall
    * mirrors (one definition — the playbook rule): seed codebook fit
    * (shared kmeans CTEs, prefix "s"), seed cells and query probe
    * cells through the one (distance, cell) assignment tie-break, and
    * the rank-3 ANN neighbor cut `nn` (cosine desc, id asc). */
  private lazy val seedProbeCtes: String =
    s"""${EntryUtil.kmeansCtes("s", labeledSeedSrc, 4, 2)},
         scells AS (${EntryUtil.nearestCellsSql("se", "sc2", 1)}),
         qq AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id >= 20),
         qcells AS (SELECT id AS qid, v AS qv, cell FROM
           (${EntryUtil.nearestCellsSql("qq", "sc2", 2)})),
         nn AS (SELECT * FROM (
             SELECT qid, sc.id AS id,
               row_number() OVER (PARTITION BY qid
                 ORDER BY list_cosine_similarity(qv, sc.v) DESC, sc.id)
                 AS rank
             FROM qcells q JOIN scells sc
               ON q.cell = sc.cell AND sc.id != q.qid)
           WHERE rank <= 3)"""

  /** The full corpus-scale labeling replay — the shared probe chain's
    * neighbor cut + the vote replaying emb_knn_label's
    * (votes desc, label asc) rule; the labeling entry's mirror AND the
    * label-filter entry's subquery (one definition). */
  private lazy val seedLabelSql: String =
    s"""WITH $seedProbeCtes,
           lbl AS (SELECT vec_id AS id, label FROM embeddings
                   WHERE vec_id < 20 AND label IS NOT NULL),
           v AS (SELECT qid, l.label, count(*) AS votes
                 FROM nn JOIN lbl l ON nn.id = l.id GROUP BY 1, 2),
           p AS (SELECT qid, label, votes,
               row_number() OVER (PARTITION BY qid
                 ORDER BY votes DESC, label) AS r
             FROM v)
         SELECT qid, label, CAST(votes AS BIGINT) AS votes
         FROM p WHERE r = 1 ORDER BY qid"""

  // lazy: Round7's oracle map reaches back here for autocorrSql at its
  // own class init, while THIS map reaches forward into Round8 (whose
  // init reads Round7.oracle) — an eager val would close that cycle
  // into a null map at JVM clinit time
  lazy val oracle: Map[String, String] = Map(

    // the shared probe chain's neighbor cut + the vote replaying
    // emb_knn_label's (votes desc, label asc) rule
    "emb_knn_label_ivf" -> seedLabelSql,

    // the labeling statement reused as a subquery (one definition),
    // low tiers joined onto documents by shared id
    "docs_label_filter" ->
      s"""SELECT d.doc_id AS doc_id, l.label, l.votes
         FROM ($seedLabelSql) l
         JOIN documents d ON l.qid = d.doc_id
         WHERE l.label < 5
         ORDER BY doc_id""",

    // ladder-served = hour-served = scan-built exactly — one oracle
    // with ts_trend_json_indexed / ts_trend_json
    "ts_trend_ladder" -> Round8Entries.trendSql(0),

    // the day-bucket correlate replay (corrSql with the day width)
    "ts_corr_ladder" -> Round7Entries.corrSql(0,
      s"""WHERE event_type IN ('click', 'purchase', 'view')
            AND epoch_ns(ts) >= ${EntryUtil.FromNs}
            AND epoch_ns(ts) < ${EntryUtil.ToNs}""",
      bucketNs = 86400000000000L),

    // DuckDB runs the same relational set-op query over the raw events
    "ts_sql_set_ops" -> {
      val wk = 7L * 86400000000000L
      val (w0, w1, w2) =
        (EntryUtil.FromNs, EntryUtil.FromNs + wk, EntryUtil.FromNs + 2 * wk)
      s"""WITH a AS (
            SELECT DISTINCT CAST(user_id AS VARCHAR) AS user
            FROM events
            WHERE event_type = 'purchase'
              AND epoch_ns(ts) >= $w0 AND epoch_ns(ts) < $w1),
          b AS (
            SELECT DISTINCT CAST(user_id AS VARCHAR) AS user
            FROM events
            WHERE event_type = 'purchase'
              AND epoch_ns(ts) >= $w1 AND epoch_ns(ts) < $w2)
          SELECT 'both_weeks' AS cohort, user
          FROM (SELECT user FROM a INTERSECT SELECT user FROM b)
          UNION ALL
          SELECT 'lapsed' AS cohort, user
          FROM (SELECT user FROM a EXCEPT SELECT user FROM b)
          UNION ALL
          SELECT 'new' AS cohort, user
          FROM (SELECT user FROM b EXCEPT SELECT user FROM a)
          ORDER BY cohort, user"""
    },

    // index-served = scan-modeled exactly — one replay with
    // ts_gaps_json_factor (lazy map: Round8's oracle val is
    // initialized by access time)
    "ts_gaps_factor_indexed" -> Round8Entries.oracle("ts_gaps_json_factor"),

    // rollup-served = scan exactly — one replay with ts_stale_json
    "ts_stale_rollup" -> Round8Entries.oracle("ts_stale_json"),

    // index-served = scan-fit exactly — one replay with ts_anomaly_json
    "ts_anomaly_json_indexed" -> Round6bEntries.anomalySql(
      """SELECT s.series, epoch_us(s.ts) AS ts_us,
           round(s.value, 6) AS value,
           round(m.med, 6) AS med, round(m.mad, 6) AS mad""",
      Round8Entries.AnomalyJsonSrc, key = "series", cLit = "3.0"),

    // the ranged ACF replay (the ts_autocorr mirror, statement-ranged
    // and metric-named); served = scan exactly — one mirror for both
    "ts_autocorr_json" ->
      autocorrSql(Seq("click", "purchase", "view"), Seq(1, 24, 168)),
    "ts_autocorr_json_indexed" ->
      autocorrSql(Seq("click", "purchase", "view"), Seq(1, 24, 168)),
    // stream-maintained bucket means + the shared mean/lag formulas =
    // the batch ACF over the same feed — unranged like its feed (the
    // stream-mirror convention), restricted to the two fed types
    "stream_autocorr" ->
      autocorrSql(Seq("click", "view"), Seq(1, 24), ranged = false),

    // one mirror composed from the TWO existing pipelines' SQL (the
    // emb_ivf_recall rule): exact side joins the minhash side on the
    // unordered pair key, three counts, two rounded ratios
    "docs_minhash_eval" ->
      s"""WITH a AS (SELECT DISTINCT id_a, id_b
             FROM (${PipelineEntries.oracle("docs_minhash_pairs")})),
           e AS (SELECT DISTINCT id_a, id_b
             FROM (${PipelineEntries.oracle("docs_jaccard_pairs")})),
           h AS (SELECT count(*) AS n_hit
             FROM e JOIN a USING (id_a, id_b)),
           ne AS (SELECT count(*) AS n_exact FROM e),
           na AS (SELECT count(*) AS n_approx FROM a)
         SELECT CAST(n_exact AS BIGINT) AS n_exact,
           CAST(n_approx AS BIGINT) AS n_approx,
           CAST(n_hit AS BIGINT) AS n_hit,
           CASE WHEN n_approx > 0 THEN round(n_hit / n_approx, 6) END
             AS precision,
           CASE WHEN n_exact > 0 THEN round(n_hit / n_exact, 6) END
             AS recall
         FROM ne, na, h""",

    // the shared pair/group/rep chain feeds both split schemes; the
    // matrix is two inner joins + a count per unordered combination
    "docs_split_leakage" ->
      s"""WITH RECURSIVE ${PipelineEntries.groupSafeCtes},
           safeh AS (SELECT rep.doc_id,
               ${EntryUtil.h60Sql("rd.text")} % 100 AS bucket
             FROM rep JOIN documents rd ON rd.doc_id = rep.rep),
           safes AS (SELECT doc_id,
               ${PipelineEntries.splitCaseSql} AS split FROM safeh),
           naiveh AS (SELECT doc_id,
               ${EntryUtil.h60Sql("text")} % 100 AS bucket
             FROM documents),
           naives AS (SELECT doc_id,
               ${PipelineEntries.splitCaseSql} AS split FROM naiveh),
           m AS (
             SELECT 'group_safe' AS scheme,
               least(sa.split, sb.split) AS split_a,
               greatest(sa.split, sb.split) AS split_b
             FROM pairs p JOIN safes sa ON sa.doc_id = p.id_a
                          JOIN safes sb ON sb.doc_id = p.id_b
             UNION ALL
             SELECT 'naive',
               least(na.split, nb.split), greatest(na.split, nb.split)
             FROM pairs p JOIN naives na ON na.doc_id = p.id_a
                          JOIN naives nb ON nb.doc_id = p.id_b)
         SELECT scheme, split_a, split_b, count(*) AS n_pairs
         FROM m GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    // the brute scoring replay with the band cut on the ROUNDED cosine
    // before the rank — the knn_brute mirror's shape, banded
    "emb_hard_negatives" ->
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
           q AS (SELECT id AS qid, v AS qv FROM e WHERE id < 10),
           sc AS (SELECT qid, e.id,
               round(list_cosine_similarity(qv, e.v), 6) AS cos
             FROM q JOIN e ON e.id != q.qid),
           b AS (SELECT qid, id, cos,
               row_number() OVER (PARTITION BY qid
                 ORDER BY cos DESC, id) AS rank
             FROM sc WHERE cos >= 0.2 AND cos < 0.5)
         SELECT qid, id, CAST(rank AS INT) AS rank, cos
         FROM b WHERE rank <= 3 ORDER BY qid, rank""",

    // shared kmeans CTEs assign both populations; counts are exact
    // integers and each share/delta is one raw-ratio op sequence
    // rounded once — replayed verbatim
    "emb_cell_drift" ->
      s"""WITH ${EntryUtil.kmeansCtes("",
            "SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
            8, 2)},
           corc AS (SELECT cell, count(*) AS nc FROM
             (${EntryUtil.nearestCellsSql("e", "c2", 1)}) GROUP BY 1),
           qb AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings WHERE vec_id % 5 = 0),
           batc AS (SELECT cell, count(*) AS nb FROM
             (${EntryUtil.nearestCellsSql("qb", "c2", 1)}) GROUP BY 1),
           base AS (SELECT c2.cell AS cell,
               coalesce(nc, 0) AS n_corpus, coalesce(nb, 0) AS n_batch
             FROM c2 LEFT JOIN corc ON c2.cell = corc.cell
                     LEFT JOIN batc ON c2.cell = batc.cell),
           tot AS (SELECT sum(n_corpus) AS tc, sum(n_batch) AS tb
                   FROM base)
         SELECT cell, CAST(n_corpus AS BIGINT) AS n_corpus,
           CAST(n_batch AS BIGINT) AS n_batch,
           round(n_corpus / tc, 6) AS share_corpus,
           round(n_batch / tb, 6) AS share_batch,
           round(n_batch / tb - n_corpus / tc, 6) AS share_delta
         FROM base CROSS JOIN tot ORDER BY cell""",

    // the shared probe chain's ANN cut left-joined from the brute
    // top-3 over the same seeds — the emb_ivf_recall composition for
    // the corpus-query direction (per-qid exact-count denominator)
    "emb_seed_recall" ->
      s"""WITH $seedProbeCtes,
           brute AS (SELECT * FROM (
               SELECT q.id AS qid, sc.id AS id,
                 row_number() OVER (PARTITION BY q.id
                   ORDER BY list_cosine_similarity(q.v, sc.v) DESC, sc.id)
                   AS rank
               FROM qq q JOIN se sc ON sc.id != q.id)
             WHERE rank <= 3)
         SELECT b.qid,
           CAST(sum(CASE WHEN a.id IS NULL THEN 0 ELSE 1 END)
             AS BIGINT) AS n_hit,
           round(sum(CASE WHEN a.id IS NULL THEN 0 ELSE 1 END)
             / count(*), 6) AS recall
         FROM brute b
         LEFT JOIN (SELECT DISTINCT qid, id FROM nn) a
           ON b.qid = a.qid AND b.id = a.id
         GROUP BY b.qid ORDER BY b.qid""")

  /** THE ACF mirror generator (the corrSql pattern — one arithmetic
    * mirror, never hand-copied): one bucket CTE (identical
    * milli-quantized hourly means), a lags VALUES table, the shared
    * double formula per (key, lag). `types` empty = all event types;
    * `ranged = false` is the stream/library-entry convention (unranged
    * like the feed); `keyName` names the output key column (the
    * library op emits `key`, the statement emits `metric`). The
    * ts_autocorr library mirror (Round7Entries) derives from here
    * too. */
  private[entries] def autocorrSql(types: Seq[String], lags: Seq[Int],
      ranged: Boolean = true, keyName: String = "metric"): String = {
    val typePred = if (types.isEmpty) ""
      else s"event_type IN (${types.map(t => s"'$t'").mkString(", ")})"
    val rangePred = if (ranged)
      s"""epoch_ns(ts) >= ${EntryUtil.FromNs}
             AND epoch_ns(ts) < ${EntryUtil.ToNs}"""
    else ""
    val preds = Seq(typePred, rangePred).filter(_.nonEmpty)
    val where = if (preds.isEmpty) "" else preds.mkString("WHERE ", "\n             AND ", "")
    val lagRows = lags.map(l => s"($l)").mkString(", ")
    s"""WITH b AS (SELECT event_type AS k,
             epoch_ns(ts) // 3600000000000 AS bk,
             CAST(round(sum(CAST(round(value * 1000000.0) AS BIGINT))
                 / count(*) / 1000.0) AS BIGINT) AS m
           FROM events
           $where
           GROUP BY 1, 2),
         lg(lag) AS (VALUES $lagRows),
         p AS (SELECT l.k AS $keyName, lg.lag, l.m AS x, r.m AS y
           FROM b l JOIN lg ON true
                JOIN b r ON l.k = r.k AND l.bk = r.bk - lg.lag),
         mo AS (SELECT $keyName, lag, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
           FROM p GROUP BY 1, 2),
         md AS (SELECT $keyName, lag, n,
             CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
             CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
           FROM mo)
       SELECT $keyName, CAST(lag AS BIGINT) AS lag,
         CAST(n AS BIGINT) AS n_buckets,
         round(CASE WHEN sqrt(nd * sxxd - sxd * sxd) *
                         sqrt(nd * syyd - syd * syd) > 0
               THEN (nd * sxyd - sxd * syd) /
                    (sqrt(nd * sxxd - sxd * sxd) *
                     sqrt(nd * syyd - syd * syd))
               END, 6) AS corr
       FROM md ORDER BY $keyName, lag"""
  }
}
