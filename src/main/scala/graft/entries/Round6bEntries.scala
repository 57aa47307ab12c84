package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryUtil.QueryFn
import graft.pipeline.TextOps

/** Round-6 continuation entries: the mixture-design / corpus-hygiene /
  * export / monitoring operators a training-data owner runs around the
  * dedup core — Gopher rule gates, temperature mixture reweighting,
  * OOV coverage, shard shuffle, segment-level dedup and repeat-collapse
  * EDITS (cleaned text md5-locked), an in-engine trained quality
  * classifier (integer-exact GD, full training run replayed CTE-for-CTE)
  * with a streaming gate, greedy boundary-respecting packing, the
  * composed export manifest, multi-probe SRP kNN, per-cell embedding
  * outliers, ingest drift, and TSDB operational monitoring (staleness,
  * tag cardinality, catalog churn) plus a stateless stream-static asof.
  * All DuckDB-oracle-checked with identical arithmetic.
  */
object Round6bEntries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    EntryUtil.repartitioned(s, dir, "documents")

  // mixture target for the temperature entry: fixed across sf so the
  // rate genuinely saturates (small strata hit rate = 1) at sf0.001 and
  // genuinely subsamples at sf0.1
  private val MixtureTargetTokens = 20000L
  private val OovVocabSize = 32
  private val ShuffleShards = 8
  private val SegTokens = 10
  // classifier hyperparameters, shared by the entry and its oracle; lr
  // and the teacher threshold as STRINGS so both engines parse the
  // identical double literals
  private val ClsBuckets = 32
  private val ClsRounds = 6
  private val ClsLrStr = "0.2"
  private val ClsLr = ClsLrStr.toDouble
  private val ClsQualityThrStr = "0.31"
  private val ClsQualityThr = ClsQualityThrStr.toDouble
  private val PackBudget = 512L
  // 2024-01-25T00:00Z — inside the events' Jan 1-30 span at every sf,
  // so staleness is a genuine split (some series last write earlier)
  private val StaleCutoffNs = 1706140800000000000L
  // the same every-5th-doc ingest-batch split Round6Entries' incremental
  // dedup uses — drift is measured for the batch that dedup screens
  private val BatchMod = 5
  // shard count of the export manifest's shuffle, interpolated into the
  // oracle so the two sides cannot drift
  private val ExportShards = 4

  /** Documents + the teacher label: quality >= threshold on the rounded
    * quality score (the heuristic rule the classifier distills). */
  private def labeledDocs(s: SparkSession, dir: String): DataFrame = {
    val d0 = docs(s, dir)
    val labels = TextOps.quality(d0, "doc_id", "text")
      .select(col("id").as("doc_id"),
        (col("quality") >= ClsQualityThr).cast("int").as("y"))
    d0.join(labels, "doc_id")
  }

  private val clsModels = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), TextOps.TextClassifierModel]

  /** Memoized trained classifier per (session, dir) — the model is a
    * build-once artifact (the same amortization as the IVF/PQ codebooks
    * in [[EntryUtil]]): the scoring entry, the streaming gate and the
    * bench's repeated passes all reuse one training run. */
  private def classifierModelFor(s: SparkSession, dir: String): TextOps.TextClassifierModel =
    clsModels.getOrElseUpdate((s, dir),
      TextOps.trainTextClassifier(labeledDocs(s, dir), "text", "y",
        buckets = ClsBuckets, rounds = ClsRounds, lr = ClsLr))

  val queries: Map[String, QueryFn] = Map(
    // hard boolean quality gates (Gopher rule set): each rule is a flag
    // column, keep = conjunction — the audit-friendly filter stage that
    // runs before any model scoring; one codegen'd projection
    "docs_gopher_rules" -> ((s, dir) =>
      TextOps.gopherRules(docs(s, dir), "doc_id", "text",
          minWords = 50, maxWords = 100000, minStop = 2)
        .orderBy("id")),

    // temperature-scaled (α = 0.5) mixture recipe: per-source token
    // counts → √-scaled weights → sampling rates; the table
    // stratifiedSample consumes — derivation and application as two
    // separately-oracled operators
    "docs_mixture_temperature" -> ((s, dir) =>
      TextOps.temperatureMixture(docs(s, dir), "source", "text",
          targetTokens = MixtureTargetTokens)
        .orderBy("stratum")),

    // vocabulary coverage: top-32 word vocab by (count desc, word asc),
    // per-doc OOV fraction via a broadcast membership join; the vocab
    // cut plans as TakeOrderedAndProject (per-task heap, no full sort)
    "docs_oov_rate" -> ((s, dir) =>
      TextOps.oovRate(docs(s, dir), "doc_id", "text",
          vocabSize = OovVocabSize)
        .orderBy("id")),

    // deterministic training-order shuffle: shard = salted content hash
    // mod 8, seq = hash rank within the shard (per-shard windows — the
    // sort is 8 independent shard sorts, never global)
    "docs_shard_shuffle" -> ((s, dir) =>
      TextOps.shardShuffle(docs(s, dir), "doc_id", "text",
          nShards = ShuffleShards)
        .orderBy("id")),

    // segment-level corpus dedup: 10-token segments occurring in >= 2
    // DISTINCT docs are REMOVED everywhere and the survivors reassembled
    // — the md5 of the cleaned text itself is oracle-compared, so the
    // edit (not just the count) is hash-locked
    "docs_segment_dedup" -> ((s, dir) =>
      TextOps.segmentDedup(docs(s, dir), "doc_id", "text",
          segTokens = SegTokens, minDocs = 2)
        .orderBy("id")),

    // learned quality classifier trained IN the engine: hashed
    // bag-of-words -> mean-centering -> linear -> Elliott sigmoid, 6
    // full-batch GD rounds distilling the heuristic quality RULE
    // (quality >= 0.31, the corpus median — a genuine ~50/50 cut) into
    // a parametric content model that then predicts it at ~96%.
    // Gradients and feature means are exact integer micro-unit sums
    // (order-independent), the link is algebraic (no exp), so the
    // oracle replays the ENTIRE training run CTE-for-CTE and the
    // scores hash-match bit-for-bit
    "docs_quality_classifier" -> ((s, dir) => {
      TextOps.scoreTextClassifier(labeledDocs(s, dir), "doc_id", "text", "y",
          classifierModelFor(s, dir))
        .orderBy("id")
    }),

    // the trained model applied as a STREAMING quality gate: documents
    // stream through and only predicted-high-quality ones reach the
    // sink — train-offline / score-online, the model as plan literals
    // in a stateless micro-batch projection (no watermark, no store)
    "stream_classifier_gate" -> ((s, dir) => {
      implicit val enc =
        org.apache.spark.sql.Encoders.product[(Long, String)]
      val model = classifierModelFor(s, dir)
      val feed = docs(s, dir).select("doc_id", "text").orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      EntryUtil.runStreamEntry(s, "stream_cls_gate_sink", feed, chunks = 3,
        cols = Seq("doc_id", "text"),
        mkStream = df => TextOps.withClassifierScore(df, "text", model)
          .select(col("doc_id").as("id"), col("score"))
          .where(col("score") >= 0.5))
        .orderBy("id")
    }),

    // boundary-respecting greedy packing: per source, docs fill a
    // 512-token bin until the next doc would overflow, then a new bin
    // opens — no document ever straddles two training sequences (the
    // concat-and-cut docs_packed permits); integer-exact fold, oracle
    // replays it as a per-shard recursive CTE
    "docs_packed_greedy" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("tok",
        TextOps.tokenCountWs(col("text")).cast("long"))
      TextOps.packGreedyBins(d, "source", "doc_id", "tok", budget = PackBudget)
        .orderBy("id")
    }),

    // the EXPORT side composed end-to-end (the curation funnel's
    // sibling): temperature mixture recipe -> stratified sample at the
    // derived rates -> salted shard shuffle -> boundary-respecting
    // greedy packing, emitted as the (shard, seq, doc, bin) manifest a
    // training job reads. Every stage is the already-oracled operator;
    // this entry proves they COMPOSE under one oracle. The recipe
    // collect is driver-sized (one row per stratum).
    "docs_export_manifest" -> ((s, dir) => {
      val d = docs(s, dir)
      val rates = TextOps.temperatureMixture(d, "source", "text",
          MixtureTargetTokens)
        .select("stratum", "rate").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val sampled = TextOps.stratifiedSample(d, "text", "source", rates)
      val sh = TextOps.shardShuffle(sampled, "doc_id", "text",
        nShards = ExportShards)
      val toks = sampled.select(col("doc_id"),
        TextOps.tokenCountWs(col("text")).cast("long").as("tok"))
      val packIn = sh.withColumnRenamed("id", "doc_id").join(toks, "doc_id")
        .select(col("doc_id"), col("shard").cast("string").as("shard"),
          col("seq").cast("long").as("seq"), col("tok"))
      val packed = TextOps.packGreedyBins(packIn, "shard", "seq", "tok",
        budget = PackBudget)
      packed
        .join(packIn.select(col("shard"), col("seq").as("id"), col("doc_id")),
          Seq("shard", "id"))
        .select(col("shard").cast("int").as("shard"),
          col("id").cast("int").as("seq"), col("doc_id"),
          col("n_tokens"), col("bin_id"), col("bin_pos"))
        .orderBy("shard", "seq")
    }),

    // robust anomaly detection: |x - median| > 3·MAD per series
    // (Hampel's identifier) — exact percentiles, flags on the raw
    // statistics, only the anomalous samples emitted
    "ts_anomaly_mad" -> ((s, dir) => {
      val clicks = EntryUtil.rawEvents(s, dir)
        .where(col("event_type") === "click")
        .select(concat(lit("click user="), col("user_id").cast("string"))
          .as("name"), col("ts"), col("value"))
      graft.ops.Monitoring.madAnomalies(clicks, keyCol = "name", c = 3.0)
        .where(col("is_anomaly"))
        .select(col("name"), expr("ts div 1000").as("ts_us"),
          round(col("value"), 6).as("value"),
          round(col("med"), 6).as("med"), round(col("mad"), 6).as("mad"))
        .orderBy("name", "ts_us", "value")
    }),

    // the same rule flagging ONLINE: a real streaming query joins each
    // micro-batch against the broadcast med/MAD index (model offline,
    // flag in-flight — stateless, like the classifier gate)
    "stream_anomaly" -> ((s, dir) => {
      implicit val enc =
        org.apache.spark.sql.Encoders.product[(String, Long, Double)]
      val hist = EntryUtil.rawEvents(s, dir)
        .where(col("event_type") === "click")
        .select(concat(lit("click user="), col("user_id").cast("string"))
          .as("name"), col("value"))
      val idx = graft.ops.Monitoring.madIndex(hist, keyCol = "name").cache()
      try {
        EntryUtil.runStreamEntry(s, "stream_anomaly_sink",
          EntryUtil.clickRows(s, dir), chunks = 4,
          cols = Seq("name", "ts", "value"),
          mkStream = graft.streaming.TsdbStream.flagAnomalies(_, idx, c = 3.0))
          .select(col("name"), expr("ts div 1000").as("ts_us"),
            round(col("value"), 6).as("value"))
          .orderBy("name", "ts_us", "value")
      } finally idx.unpersist(false)
    }),

    // shared-winnowing-fingerprint pairs: the plagiarism detector —
    // long shared passages surface even when whole-doc Jaccard is
    // diluted; capped posting arrays, in-row pair expansion
    "docs_winnow_pairs" -> ((s, dir) =>
      graft.pipeline.Dedup.winnowPairs(docs(s, dir), "doc_id", "text",
          k = 3, w = 4, minShared = 8, maxFpFreq = Some(128))
        .orderBy("id_a", "id_b")),

    // multi-probe SRP kNN: each query also probes the 6 buckets one
    // flipped sign bit away — recall approaches brute force while the
    // scored fraction stays ~7/64 of the corpus; fan-out is query-side
    "emb_knn_multiprobe" -> ((s, dir) => {
      val emb = EntryUtil.repartitioned(s, dir, "embeddings")
      graft.pipeline.Similarity.knnMultiprobe(
          emb.select(col("vec_id").as("id"), col("embedding")),
          emb.where(col("vec_id") < 10)
            .select(col("vec_id").as("qid"), col("embedding")),
          k = 1, bits = 6)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("qid", "rank")
    }),

    // the de-looping edit: consecutive duplicate tokens collapse to one
    // (stutter artifacts); the cleaned text's md5 locks the edit
    "docs_collapse_repeats" -> ((s, dir) =>
      TextOps.collapseRepeats(docs(s, dir), "doc_id", "text")
        .orderBy("id")),

    // catalog churn: new series per day + running total — the
    // series-creation-rate monitor (each new series is an index entry
    // forever)
    "ts_catalog_growth" -> ((s, dir) => {
      val ctx = EntryUtil.engineFor(s, dir).ctx
      graft.ops.Monitoring.catalogGrowth(ctx.samples).orderBy("day_idx")
    }),

    // per-cell embedding outliers: each IVF cell's 3 farthest members
    // (rounded distance desc, ties to lower id) — SemDeDup's complement,
    // the least cluster-typical vectors surfaced for triage
    "emb_cell_outliers" -> ((s, dir) => {
      val emb = EntryUtil.repartitioned(s, dir, "embeddings")
      graft.pipeline.Similarity.cellOutliers(
          EntryUtil.ivfCodebookFor(s, dir),
          emb.select(col("vec_id").as("id"), col("embedding")), k = 3)
        .orderBy("cell", "rank")
    }),

    // ingest drift monitor: KL(batch || corpus) over hashed-bigram
    // bucket models, per-bucket micro-nat terms (total = exact integer
    // sum) — the distribution readout a crawl owner alerts on per batch
    "docs_ingest_drift" -> ((s, dir) => {
      val d = docs(s, dir)
      TextOps.ingestDrift(
          corpus = d.where(col("doc_id") % BatchMod =!= 0),
          batch = d.where(col("doc_id") % BatchMod === 0),
          "text", buckets = 64, k = 2)
        .orderBy("b")
    }),

    // absence detection: series whose last sample predates the cutoff
    // (heartbeat monitoring) — one partial-agg max per series joined to
    // the broadcast catalog. staleSeries also reports never-wrote series
    // (null last_ts); the testdata catalog is DERIVED from events, so
    // that branch is unreachable here by construction and the oracle
    // (events-only) cannot diverge on it — CorpusOpsSpec covers the
    // null branch with a synthetic catalog instead
    "ts_stale_series" -> ((s, dir) => {
      val ctx = EntryUtil.engineFor(s, dir).ctx
      graft.ops.Monitoring.staleSeries(
          ctx.series.where(col("metric") =!= "!log"), ctx.samples,
          StaleCutoffNs)
        .select(col("name"), expr("last_ts div 1000").as("last_ts_us"))
        .orderBy("name")
    }),

    // cardinality monitoring: per (metric, tag key) distinct values +
    // series count — the tag-explosion readout; catalog-only
    "ts_tag_cardinality" -> ((s, dir) => {
      val ctx = EntryUtil.engineFor(s, dir).ctx
      graft.ops.Monitoring.tagCardinality(ctx.series)
        .orderBy("metric", "tag_key")
    }),

    // stream-static as-of join executed as a REAL streaming query: click
    // samples stream in ts-ordered micro-batches and each picks up its
    // user's latest view value at-or-before its own ts from the cached
    // static asofIndex — statelessly (broadcast index probe, no
    // watermark, no store). Both sides µs-truncated so the <= compare
    // is the one DuckDB's native ASOF evaluates.
    "stream_asof_join" -> ((s, dir) => {
      implicit val enc =
        org.apache.spark.sql.Encoders.product[(String, Long, Double)]
      val idx = graft.streaming.TsdbStream.asofIndex(
        EntryUtil.rawEvents(s, dir)
          .where(col("event_type") === "view")
          .select(concat(lit("u"), col("user_id").cast("string")).as("name"),
            (col("ts") - pmod(col("ts"), lit(1000L))).as("ts"),
            col("value").cast("double").as("value"))).cache()
      try {
        val clicks = EntryUtil.eventRows(s, dir, "click", "u")
          .map { case (n, ts, v) => (n, ts - ts % 1000L, v) }
        EntryUtil.runStreamEntry(s, "stream_asof_sink", clicks, chunks = 4,
          cols = Seq("name", "ts", "value"),
          mkStream = graft.streaming.TsdbStream.asofStatic(_, idx,
            toleranceNs = None, asCol = "view_asof"))
          .select(col("name"), expr("ts div 1000").as("ts_us"),
            round(col("value"), 6).as("click"),
            round(col("view_asof"), 6).as("view_asof"))
          .orderBy("name", "ts_us", "click")
      } finally idx.unpersist(false)
    })
  )

  private def h60(s: String): String = EntryUtil.h60Sql(s)

  /** The ONE med/MAD anomaly replay (batch and streaming entries differ
    * only in their SELECT list): per-series exact medians, Hampel flag
    * at 3·MAD. Both statistics round to 6dp BEFORE any downstream use —
    * quantile_cont and Spark's percentile interpolate in different IEEE
    * op orders, so a raw-valued flag compare could split on the last
    * ulp (mirrors Monitoring.madIndex exactly). */
  /** ONE med/MAD replay generator (src must yield ($key, ts, value)):
    * the batch entry, its streaming twin and the `anomaly` JSON
    * statement (+ its sampled form, via `fitWhere` restricting the FIT
    * source while flags judge all of `s`) share the identical
    * quantile_cont chain — rounded statistics, raw-value compare. */
  def anomalySql(selectList: String, srcSql: String, key: String = "name",
      cLit: String = "3", fitWhere: String = ""): String =
    s"""WITH s AS ($srcSql),
         sm AS (SELECT * FROM s $fitWhere),
         med AS (SELECT $key, round(quantile_cont(value, 0.5), 6) AS med
                 FROM sm GROUP BY $key),
         mad AS (SELECT sm.$key, m.med,
             round(quantile_cont(abs(sm.value - m.med), 0.5), 6) AS mad
           FROM sm JOIN med m USING ($key) GROUP BY sm.$key, m.med)
       $selectList
       FROM s JOIN mad m USING ($key)
       WHERE abs(s.value - m.med) > $cLit * m.mad
       ORDER BY $key, ts_us, value"""

  private val ClickAnomalySrc =
    """SELECT 'click user=' || CAST(user_id AS VARCHAR) AS name,
             ts, value
           FROM events WHERE event_type = 'click'"""

  private def AnomalySql(selectList: String): String =
    anomalySql(selectList, ClickAnomalySrc)

  private val stopList =
    TextOps.GopherStopwords.map(w => s"'$w'").mkString(", ")

  /** SQL replay of [[graft.pipeline.TextOps.trainTextClassifier]] +
    * [[graft.pipeline.TextOps.scoreTextClassifier]]: the teacher label
    * is docs_quality's exact quality expression thresholded on its
    * rounded value; feature means are exact integer sums over exact
    * division; one CTE block per unrolled GD round — margins as
    * list-order zip-sums over CENTERED features (list_sum folds
    * sequentially, matching the engine's aggregate() fold; list_zip
    * carries xs, mu, ws in one pass), the Elliott link
    * 0.5 + 0.5·m/(1+|m|) (algebraic, hence IEEE-identical), the
    * per-(doc, bucket) gradient contributions quantized to BIGINT
    * micro-units before their sums, and the weight update in the exact
    * scalar op order the Scala loop uses. */
  private def classifierOracle(b: Int, rounds: Int, lr: String,
      thr: String, tail: String): String = {
    val zipSum = "list_sum(list_transform(list_zip(f.xs, u.mu, g.ws), " +
      "z -> (z[1] - z[2]) * z[3]))"
    val roundCtes = (0 until rounds).map { r =>
      s"""m$r AS MATERIALIZED (SELECT f.doc_id, f.y, f.xs, g.w0 + $zipSum AS m
             FROM feats f CROSS JOIN mus u CROSS JOIN g$r g),
           p$r AS MATERIALIZED (SELECT doc_id, y, xs,
               0.5 + 0.5 * m / (1 + abs(m)) AS p FROM m$r),
           gb$r AS MATERIALIZED (SELECT t.b,
               sum(CAST(round((p - y) * (xs[t.b + 1] - u.mu[t.b + 1])
                 * 1000000.0) AS BIGINT)) AS g
             FROM p$r CROSS JOIN mus u,
               UNNEST(generate_series(0, ${b - 1})) AS t(b)
             GROUP BY t.b),
           gz$r AS MATERIALIZED (SELECT sum(CAST(round((p - y) * 1000000.0) AS BIGINT))
               AS g FROM p$r),
           g${r + 1} AS MATERIALIZED (SELECT
             (SELECT g.w0 - $lr * (z.g / 1000000.0) / nn.n
              FROM g$r g, gz$r z, nn) AS w0,
             (SELECT list(wb ORDER BY b) FROM (
                SELECT q.b AS b,
                  g.ws[q.b + 1] - $lr * (q.g / 1000000.0) / nn.n AS wb
                FROM gb$r q, g$r g, nn)) AS ws)"""
    }.mkString(",\n ")
    s"""WITH nn AS (SELECT count(*) AS n FROM documents),
         lab AS (SELECT doc_id,
             CASE WHEN round(least(len(ws) / 100.0, 1.0) * 0.5 +
               (len(list_intersect(ws, ['the', 'a', 'of', 'and', 'to', 'in']))
                * 1.0 / len(list_distinct(ws))) * 0.5, 6) >= $thr
               THEN 1 ELSE 0 END AS y
           FROM (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents)),
         feats AS MATERIALIZED (SELECT d.doc_id, lab.y,
             list_transform(range(0, $b), bb ->
               CAST(len(list_filter(hs, h -> h = bb)) AS INT)) AS xs
           FROM (SELECT doc_id,
               list_transform(list_filter(string_split(text, ' '),
                 w -> len(w) > 0), w -> ${h60("w")} % $b) AS hs
             FROM documents) d JOIN lab ON lab.doc_id = d.doc_id),
         bsum AS (SELECT t.b, CAST(sum(xs[t.b + 1]) AS BIGINT) AS s
           FROM feats, UNNEST(generate_series(0, ${b - 1})) AS t(b)
           GROUP BY t.b),
         mus AS MATERIALIZED (SELECT list(s / nn.n ORDER BY b) AS mu
           FROM bsum CROSS JOIN nn),
         g0 AS MATERIALIZED (SELECT 0.0 AS w0,
           list_transform(range(0, $b), bb -> 0.0) AS ws),
         $roundCtes,
         mf AS (SELECT f.doc_id, f.y, g.w0 + $zipSum AS m
           FROM feats f CROSS JOIN mus u CROSS JOIN g$rounds g)
       $tail"""
  }

  val oracle: Map[String, String] = Map(
    // flags computed from the ROUNDED signal columns in both engines, so
    // the threshold compare can never split on a sub-6dp difference
    "docs_gopher_rules" ->
      s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws
                     FROM documents),
           s AS (SELECT doc_id,
               len(ws) AS n_words,
               round(list_sum(list_transform(ws, x -> length(x))) * 1.0
                 / len(ws), 6) AS mean_word_len,
               round(len(regexp_extract_all(text, '#|[.][.][.]')) * 1.0
                 / len(ws), 6) AS symbol_ratio,
               round(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))
                 * 1.0 / len(ws), 6) AS alpha_frac,
               len(list_filter([$stopList], x -> list_contains(ws, x)))
                 AS n_stop
             FROM w)
         SELECT doc_id AS id, n_words, mean_word_len, symbol_ratio,
           alpha_frac, n_stop,
           n_words >= 50 AND n_words <= 100000 AS flag_word_count,
           mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS flag_mean_len,
           symbol_ratio <= 0.1 AS flag_symbol,
           alpha_frac >= 0.8 AS flag_alpha,
           n_stop >= 2 AS flag_stop,
           n_words >= 50 AND n_words <= 100000
             AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
             AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
             AND n_stop >= 2 AS keep
         FROM s ORDER BY id""",

    // same operand order as the engine: (sqrt(c)/z) * T / c, rate
    // rounded BEFORE the expected-token product in both engines
    "docs_mixture_temperature" ->
      s"""WITH c AS (SELECT source AS stratum, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
             FROM documents GROUP BY source),
           z AS (SELECT sum(sqrt(n_tokens)) AS z FROM c)
         SELECT stratum, n_docs, n_tokens,
           round(sqrt(n_tokens) / z, 6) AS weight,
           round(least(1.0, sqrt(n_tokens) / z * $MixtureTargetTokens
             / n_tokens), 6) AS rate,
           CAST(round(round(least(1.0, sqrt(n_tokens) / z
               * $MixtureTargetTokens / n_tokens), 6) * n_tokens, 0)
             AS BIGINT) AS expected_tokens
         FROM c, z ORDER BY stratum""",

    "docs_oov_rate" ->
      s"""WITH toks AS (SELECT doc_id, u.w AS word
             FROM (SELECT doc_id, string_split(text, ' ') AS ws
                   FROM documents), UNNEST(ws) AS u(w)),
           vc AS (SELECT word, count(*) AS c FROM toks
                  WHERE len(word) > 0 GROUP BY word),
           vocab AS (SELECT word FROM vc ORDER BY c DESC, word
                     LIMIT $OovVocabSize)
         SELECT t.doc_id AS id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           round(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 6) AS oov_rate
         FROM toks t LEFT JOIN vocab v ON t.word = v.word
         GROUP BY t.doc_id ORDER BY id""",

    "docs_shard_shuffle" ->
      s"""WITH h AS (SELECT doc_id,
               ${h60("text || '#' || doc_id")} AS hh
             FROM documents)
         SELECT doc_id AS id, CAST(hh % $ShuffleShards AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY hh % $ShuffleShards
             ORDER BY hh, doc_id) AS INT) AS seq
         FROM h ORDER BY id""",

    // string_agg skips the CASE's NULLs exactly as collect_list skips
    // them; coalesce('') matches array_join over an empty survivor set
    "docs_segment_dedup" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                     FROM documents),
           segs AS (SELECT doc_id, i AS pos,
               array_to_string(ws[i*$SegTokens+1 : i*$SegTokens+$SegTokens],
                 ' ') AS seg
             FROM w, UNNEST(generate_series(0,
               CAST(floor((len(ws) + $SegTokens - 1) / $SegTokens.0)
                 AS BIGINT) - 1)) AS t(i)),
           sh AS (SELECT doc_id, pos, seg, ${h60("seg")} AS h FROM segs),
           dup AS (SELECT h FROM (
               SELECT h, count(DISTINCT doc_id) AS nd FROM sh GROUP BY h)
             WHERE nd >= 2)
         SELECT sh.doc_id AS id,
           count(*) AS n_segments,
           CAST(sum(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           md5(coalesce(string_agg(CASE WHEN d.h IS NULL THEN sh.seg END,
             ' ' ORDER BY sh.pos), '')) AS clean_hash
         FROM sh LEFT JOIN dup d ON sh.h = d.h
         GROUP BY sh.doc_id ORDER BY id""",

    "docs_quality_classifier" ->
      classifierOracle(ClsBuckets, ClsRounds, ClsLrStr, ClsQualityThrStr,
        """SELECT doc_id AS id, y AS label,
             round(0.5 + 0.5 * m / (1 + abs(m)), 6) AS score,
             round(0.5 + 0.5 * m / (1 + abs(m)), 6) >= 0.5 AS pred
           FROM mf ORDER BY id"""),

    // same training replay, gate tail: only predicted-high-quality
    // documents survive to the (streaming) sink
    "stream_classifier_gate" ->
      classifierOracle(ClsBuckets, ClsRounds, ClsLrStr, ClsQualityThrStr,
        """SELECT doc_id AS id,
             round(0.5 + 0.5 * m / (1 + abs(m)), 6) AS score
           FROM mf
           WHERE round(0.5 + 0.5 * m / (1 + abs(m)), 6) >= 0.5
           ORDER BY id"""),

    // Spark percentile() and DuckDB quantile_cont share exact linear
    // interpolation (docs_length_quantiles precedent); the flag
    // compares the RAW statistics in both engines
    "ts_anomaly_mad" -> AnomalySql(
      """SELECT s.name, epoch_us(s.ts) AS ts_us, round(s.value, 6) AS value,
           round(m.med, 6) AS med, round(m.mad, 6) AS mad"""),

    "stream_anomaly" -> AnomalySql(
      "SELECT s.name, epoch_us(s.ts) AS ts_us, round(s.value, 6) AS value"),

    // the SHARED winnowing-selection generator (k=3, w=4 — one
    // definition with docs_winnow's oracle), then capped-frequency
    // posting self-join and the shared count
    "docs_winnow_pairs" ->
      s"""WITH ${EntryUtil.winnowSelSql(3, 4)},
           freq AS (SELECT fp, count(*) AS df FROM wn GROUP BY fp),
           wp AS (SELECT wn.doc_id, wn.fp FROM wn JOIN freq USING (fp)
                  WHERE df <= 128)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS BIGINT) AS shared
         FROM wp a JOIN wp b ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 8
         ORDER BY id_a, id_b""",

    // query buckets expand via xor over [0, 1<<0 .. 1<<5]; corpus keeps
    // one bucket per vector so the probe join needs no pair dedup
    "emb_knn_multiprobe" -> {
      val flipList = (0L +: (0 until 6).map(j => 1L << j)).mkString("[", ", ", "]")
      s"""WITH c AS (SELECT vec_id, embedding, ${EntryUtil.srpSql(6)} AS bucket
                     FROM embeddings),
           q0 AS (SELECT * FROM c WHERE vec_id < 10),
           q AS (SELECT vec_id, embedding, xor(bucket, t.f) AS bucket
                 FROM q0, UNNEST($flipList) AS t(f))
         SELECT * FROM (
           SELECT q.vec_id AS qid, b.vec_id AS id,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                 CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id) AS rank,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
               CAST(b.embedding AS DOUBLE[])), 6) AS cos
           FROM q JOIN c b ON q.bucket = b.bucket AND q.vec_id != b.vec_id)
         WHERE rank <= 1 ORDER BY qid, rank"""
    },

    // 1-based list_filter index: i = 1 keeps the first token; ws[i-1]
    // at i = 1 is NULL so the <> is NULL and OR short-circuits true —
    // the same null algebra as the engine's 0-based get()
    "docs_collapse_repeats" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents),
           k AS (SELECT doc_id, len(ws) AS n_tokens,
               list_filter(ws, (x, i) -> i = 1 OR x <> ws[i - 1]) AS kept
             FROM w)
         SELECT doc_id AS id, n_tokens,
           n_tokens - len(kept) AS n_collapsed,
           md5(array_to_string(kept, ' ')) AS clean_hash
         FROM k ORDER BY id""",

    "ts_catalog_growth" ->
      """WITH f AS (SELECT event_type, user_id, epoch_us(min(ts)) AS first_us
                    FROM events GROUP BY event_type, user_id),
           g AS (SELECT first_us // 86400000000 AS day_idx,
                   count(*) AS new_series
                 FROM f GROUP BY 1)
         SELECT day_idx, new_series,
           CAST(sum(new_series) OVER (ORDER BY day_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS total_series
         FROM g ORDER BY day_idx""",

    // every stage's own oracle arithmetic chained: mixture rates
    // (rounded 6 before application, as the engine applies the
    // collected recipe), hash-rate sampling, salted shuffle, recursive
    // greedy pack keyed by (shard, seq)
    "docs_export_manifest" ->
      s"""WITH RECURSIVE
           c AS (SELECT source AS stratum,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
             FROM documents GROUP BY source),
           z AS (SELECT sum(sqrt(n_tokens)) AS z FROM c),
           rates AS (SELECT stratum,
               round(least(1.0, sqrt(n_tokens) / z * $MixtureTargetTokens
                 / n_tokens), 6) AS rate
             FROM c, z),
           samp AS (SELECT d.doc_id, d.text
             FROM documents d JOIN rates r ON d.source = r.stratum
             WHERE ${h60("d.text")} % 1000000 < r.rate * 1000000.0),
           sha AS (SELECT doc_id,
               CAST(hh % $ExportShards AS INT) AS shard,
               CAST(row_number() OVER (PARTITION BY hh % $ExportShards
                 ORDER BY hh, doc_id) AS INT) AS seq
             FROM (SELECT doc_id, ${h60("text || '#' || doc_id")} AS hh
                   FROM samp)),
           o AS (SELECT sha.shard, sha.seq AS rk, sha.doc_id,
               CAST(len(string_split(s.text, ' ')) AS BIGINT) AS tok
             FROM sha JOIN samp s ON s.doc_id = sha.doc_id),
           st AS (
             SELECT shard, rk, doc_id, tok,
               CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS pos,
               tok AS fill
             FROM o WHERE rk = 1
             UNION ALL
             SELECT o.shard, o.rk, o.doc_id, o.tok,
               CASE WHEN st.fill > 0 AND st.fill + o.tok > $PackBudget
                    THEN st.bin + 1 ELSE st.bin END,
               CASE WHEN st.fill > 0 AND st.fill + o.tok > $PackBudget
                    THEN CAST(0 AS BIGINT) ELSE st.fill END,
               CASE WHEN st.fill > 0 AND st.fill + o.tok > $PackBudget
                    THEN o.tok ELSE st.fill + o.tok END
             FROM st JOIN o ON o.shard = st.shard AND o.rk = st.rk + 1)
         SELECT shard, rk AS seq, doc_id, tok AS n_tokens,
           bin AS bin_id, pos AS bin_pos
         FROM st ORDER BY shard, seq""",

    // the shared kmeans CTEs assign cells on the raw distance; the
    // outlier rank cuts on the ROUNDED distance desc, id asc
    "emb_cell_outliers" ->
      s"""WITH ${EntryUtil.kmeansCtes("",
            "SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
            8, 2)},
           asg AS (SELECT cell, id, round(d, 6) AS dist FROM (
               SELECT e.id, c.cell, ${EntryUtil.sqlDist("e.v", "c.cv")} AS d,
                 row_number() OVER (PARTITION BY e.id
                   ORDER BY ${EntryUtil.sqlDist("e.v", "c.cv")}, c.cell) AS r
               FROM e CROSS JOIN c2 c) WHERE r = 1),
           rk AS (SELECT cell, id, dist,
               row_number() OVER (PARTITION BY cell
                 ORDER BY dist DESC, id) AS rank
             FROM asg)
         SELECT cell, CAST(rank AS INT) AS rank, id, dist
         FROM rk WHERE rank <= 3 ORDER BY cell, rank""",

    // same add-1-smoothed bucket-model arithmetic as the DSIR oracle,
    // KL form: p * ln(p/q) * 1e6 rounded to BIGINT per bucket
    "docs_ingest_drift" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                     FROM documents),
           g AS (SELECT doc_id,
               ${h60("ws[i] || ' ' || ws[i+1]")} % 64 AS b
             FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)),
           bm AS (SELECT b, count(*) AS bc FROM g
                  WHERE doc_id % $BatchMod = 0 GROUP BY b),
           cm AS (SELECT b, count(*) AS cc FROM g
                  WHERE doc_id % $BatchMod <> 0 GROUP BY b),
           tb AS (SELECT CAST(sum(bc) AS DOUBLE) AS tbc FROM bm),
           tc AS (SELECT CAST(sum(cc) AS DOUBLE) AS tcc FROM cm),
           j AS (SELECT bb.b,
               coalesce(bc, 0) AS batch_n, coalesce(cc, 0) AS corpus_n,
               (coalesce(bc, 0) + 1.0) / (tbc + 64.0) AS p,
               (coalesce(cc, 0) + 1.0) / (tcc + 64.0) AS q
             FROM range(64) bb(b)
             LEFT JOIN bm ON bb.b = bm.b LEFT JOIN cm ON bb.b = cm.b
             CROSS JOIN tb CROSS JOIN tc)
         SELECT b, CAST(batch_n AS BIGINT) AS batch_n,
           CAST(corpus_n AS BIGINT) AS corpus_n,
           round(p, 6) AS p_batch, round(q, 6) AS q_corpus,
           CAST(round(p * ln(p / q) * 1000000.0) AS BIGINT) AS kl_micro
         FROM j ORDER BY b""",

    // heartbeat oracle: last event per (metric, user) against the same
    // cutoff instant (ts is µs-grained in both engines)
    "ts_stale_series" ->
      """SELECT event_type || ' user=' || CAST(user_id AS VARCHAR) AS name,
           epoch_us(max(ts)) AS last_ts_us
         FROM events GROUP BY event_type, user_id
         HAVING max(ts) < TIMESTAMP '2024-01-25 00:00:00'
         ORDER BY name""",

    // catalog cardinality: the !log event series carry the same user
    // tag as the five metric series
    "ts_tag_cardinality" ->
      """WITH s AS (
           SELECT event_type AS metric, CAST(user_id AS VARCHAR) AS v
           FROM events
           UNION ALL
           SELECT '!log', CAST(user_id AS VARCHAR) FROM events)
         SELECT metric, 'user' AS tag_key,
           CAST(count(DISTINCT v) AS BIGINT) AS n_values,
           CAST(count(DISTINCT v) AS BIGINT) AS n_series
         FROM s GROUP BY metric ORDER BY metric, tag_key""",

    // the greedy fold replayed as a per-shard recursive CTE: one row
    // per (shard, rank) step, integer state (bin, pos, fill)
    "docs_packed_greedy" ->
      s"""WITH RECURSIVE o AS (
             SELECT source AS shard, doc_id AS id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk
             FROM documents),
           st AS (
             SELECT shard, rk, id, tok,
               CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS pos,
               tok AS fill
             FROM o WHERE rk = 1
             UNION ALL
             SELECT o.shard, o.rk, o.id, o.tok,
               CASE WHEN st.fill > 0 AND st.fill + o.tok > $PackBudget
                    THEN st.bin + 1 ELSE st.bin END,
               CASE WHEN st.fill > 0 AND st.fill + o.tok > $PackBudget
                    THEN CAST(0 AS BIGINT) ELSE st.fill END,
               CASE WHEN st.fill > 0 AND st.fill + o.tok > $PackBudget
                    THEN o.tok ELSE st.fill + o.tok END
             FROM st JOIN o ON o.shard = st.shard AND o.rk = st.rk + 1)
         SELECT shard, id, tok AS n_tokens, bin AS bin_id, pos AS bin_pos
         FROM st ORDER BY id""",

    // DuckDB's native ASOF LEFT JOIN is the semantic ground truth the
    // streaming probe must reproduce row-for-row
    "stream_asof_join" ->
      """SELECT 'u' || CAST(l.user_id AS VARCHAR) AS name,
           epoch_us(l.ts) AS ts_us,
           round(l.value, 6) AS click, round(r.value, 6) AS view_asof
         FROM (SELECT user_id, ts, value FROM events
               WHERE event_type = 'click') l
         ASOF LEFT JOIN
           -- tie rule: one row per (user, µs-ts), MAX value — identical
           -- by construction to asofIndex's pinned pre-aggregation, so
           -- same-µs ties from distinct ns timestamps cannot split the
           -- entry from its oracle on data luck
           (SELECT user_id, make_timestamp(epoch_us(ts)) AS ts,
                   max(value) AS value
            FROM events WHERE event_type = 'view' GROUP BY 1, 2) r
           ON l.user_id = r.user_id AND r.ts <= l.ts
         ORDER BY name, ts_us, click""")
}
