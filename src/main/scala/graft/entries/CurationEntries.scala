package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryUtil.QueryFn
import graft.pipeline.TextOps

/** Dataset-curation entries added late in round 4: benchmark
  * decontamination, repetition quality signals, deterministic splits and
  * stratified sampling — the operators between "deduped corpus" and
  * "training mixture" in a data pipeline. All DuckDB-oracle-checked; the
  * oracle replays the identical shingling / md5-hash arithmetic.
  */
object CurationEntries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    EntryUtil.repartitioned(s, dir, "documents")

  // deterministic per-lang mixture rates for the stratified-sample entry:
  // exact binary fractions so rate*1e6 is the same double in both engines
  private val SampleRates = Map("en" -> 0.25, "de" -> 0.5, "zh" -> 0.0)

  val queries: Map[String, QueryFn] = Map(
    // eval-set leakage scan: src0 plays the benchmark, the rest the corpus
    "docs_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      TextOps.contamination(
          d.where(col("source") =!= "src0"), "doc_id", "text",
          d.where(col("source") === "src0"), "text",
          k = 3, threshold = 0.05)
        .orderBy("id")
    }),

    // DSIR data selection (importance resampling weights): src0 plays
    // the target domain, the rest the raw pool — positive logw marks a
    // doc that looks more like src0 than like the pool average. k=2
    // hashed-bigram buckets; the fixed-point per-bucket log-ratio makes
    // the score an exact integer sum (aggregation-order independent)
    "docs_dsir_weights" -> ((s, dir) => {
      val d = docs(s, dir)
      TextOps.dsirWeights(
          d.where(col("source") =!= "src0"),
          d.where(col("source") === "src0"),
          "doc_id", "text", buckets = 64, k = 2)
        .orderBy("id")
    }),

    "docs_repetition" -> ((s, dir) =>
      TextOps.repetition(docs(s, dir), "doc_id", "text", k = 2)
        .orderBy("id")),

    "docs_split_assign" -> ((s, dir) =>
      TextOps.assignSplits(docs(s, dir), "doc_id", "text",
          valPct = 10, testPct = 10)
        .orderBy("id")),

    "docs_stratified_sample" -> ((s, dir) =>
      TextOps.stratifiedSample(docs(s, dir), "text", "lang",
          SampleRates, defaultRate = 1.0)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")),

    "docs_tfidf_top3" -> ((s, dir) =>
      TextOps.tfidf(docs(s, dir), "doc_id", "text", k = 3)
        .orderBy("id", "rank")),

    "docs_chunks" -> ((s, dir) =>
      TextOps.chunk(docs(s, dir), "doc_id", "text",
          width = 40, overlap = 10)
        .orderBy("id", "chunk_idx")),

    // exact-k per stratum: the 3 smallest-hash docs of every source
    "docs_sample_k_per_source" -> ((s, dir) =>
      TextOps.sampleKPerStratum(docs(s, dir), "doc_id", "text", "source", k = 3)
        .select(col("source"), col("rank"), col("doc_id"))
        .orderBy("source", "rank")),

    // concat-and-cut packing of whole docs into 2048-token sequences,
    // per source shard in doc_id order
    "docs_packed" -> ((s, dir) =>
      TextOps.packSequences(
          docs(s, dir).select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).as("n_tokens")),
          "source", Seq("doc_id"), "n_tokens", budget = 2048L)
        .select(col("source"), col("seq_id"), col("seq_pos"),
          col("doc_id"), col("n_tokens"))
        .orderBy("source", "doc_id")),

    // per-source token-length distribution (corpus monitoring): exact
    // interpolated percentiles — Spark `percentile` and DuckDB
    // quantile_cont share the linear-interpolation definition
    "docs_length_quantiles" -> ((s, dir) =>
      docs(s, dir)
        .select(col("source"),
          TextOps.tokenCountWs(col("text")).cast("double").as("nt"))
        .groupBy("source")
        .agg(
          round(expr("percentile(nt, 0.5)"), 6).as("p50"),
          round(expr("percentile(nt, 0.9)"), 6).as("p90"),
          round(avg(col("nt")), 6).as("mean_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy("source")),

    // write → compact → read round trip under the oracle: the corpus
    // layout is written fragmented (salted tasks), bin-packed by
    // CorpusLayout.compact, and the COMPACTED directory must still hold
    // exactly the split-assigned corpus (oracle replays the content-hash
    // split; any doc lost or duplicated by the rewrite hash-mismatches)
    "docs_corpus_compact" -> ((s, dir) => {
      val d = docs(s, dir)
      val withSplit = TextOps.assignSplits(d, "doc_id", "text")
        .select(col("id").as("doc_id"), col("split"))
        .join(d.select("doc_id", "source", "text"), "doc_id")
      val base = EntryUtil.scratchDir("graft_ccorp")
      graft.model.CorpusLayout.writeDocuments(withSplit, s"$base/raw")
      graft.model.CorpusLayout.compact(s, s"$base/raw", s"$base/opt")
      s.read.parquet(s"$base/opt")
        .select("doc_id", "split", "source").orderBy("doc_id")
    }),

    // KMV approximate distinct (per-source 3-shingle vocabulary): the
    // oracle-replayable sketch form — see Sketches.kmvDistinct. k=256 ≈
    // 6% standard error; every source has >256 distinct shingles at
    // every SF, so the sketch path (not the exact small-group fallback)
    // is what the gate locks
    "docs_distinct_shingles_kmv" -> ((s, dir) =>
      graft.ops.Sketches.kmvDistinct(
          docs(s, dir).select(col("source"),
            explode(graft.functions.TextExpressions.wordShingles(col("text"), 3))
              .as("g")),
          "source", "g", k = 256)
        .orderBy("source")),

    // quantiles over a hash-deterministic half sample: the scale path
    // for percentile monitoring (the exact form buffers every value per
    // group; the sample bounds that buffer by the rate and stays
    // cross-engine replayable, unlike percentile_approx's GK sketch)
    "docs_length_quantiles_sampled" -> ((s, dir) =>
      TextOps.stratifiedSample(docs(s, dir), "text", "source",
          Map.empty, defaultRate = 0.5)
        .select(col("source"),
          TextOps.tokenCountWs(col("text")).cast("double").as("nt"))
        .groupBy("source")
        .agg(
          round(expr("percentile(nt, 0.5)"), 6).as("p50"),
          round(expr("percentile(nt, 0.9)"), 6).as("p90"),
          count(lit(1)).as("n_sampled"))
        .orderBy("source")),

    // the mixture manifest: stratified sample -> content-hash splits ->
    // per (lang, split) doc and token counts — the "data recipe" summary a
    // training run records; proves the curation ops COMPOSE
    "docs_mixture_manifest" -> ((s, dir) => {
      val d = docs(s, dir)
      val sampled = TextOps.stratifiedSample(d, "text", "lang",
        SampleRates, defaultRate = 1.0)
      val withSplit = TextOps.assignSplits(sampled, "doc_id", "text")
        .select(col("id").as("doc_id"), col("split"))
        .join(sampled.select("doc_id", "lang", "text"), "doc_id")
      withSplit.groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).as("n_tokens"))
        .orderBy("lang", "split")
    })
  )

  private val Hash60 = "CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    // anchored on the corpus docs themselves (LEFT JOIN sz), not on the
    // shingled docs: a doc with fewer than k tokens has zero shingles and
    // must still appear (n_shingles=0, contamination 0.0) exactly as the
    // Spark side emits it
    "docs_contamination" ->
      """WITH w AS (
           SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
         sh AS (
           SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
           FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
           WHERE source <> 'src0'),
         bs AS (
           SELECT DISTINCT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
           FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
           WHERE source = 'src0'),
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         hits AS (
           SELECT doc_id, count(*) AS c FROM sh
           WHERE g IN (SELECT g FROM bs) GROUP BY doc_id),
         corpus AS (SELECT doc_id FROM documents WHERE source <> 'src0')
       SELECT corpus.doc_id AS id,
         CAST(coalesce(n, 0) AS INT) AS n_shingles,
         CAST(coalesce(c, 0) AS BIGINT) AS n_overlap,
         round(coalesce(c, 0) * 1.0 / greatest(coalesce(n, 0), 1), 6)
           AS contamination,
         coalesce(c, 0) * 1.0 / greatest(coalesce(n, 0), 1) >= 0.05
           AS contaminated
       FROM corpus
       LEFT JOIN sz ON corpus.doc_id = sz.doc_id
       LEFT JOIN hits ON corpus.doc_id = hits.doc_id
       ORDER BY id""",

    // replays dsirWeights exactly: same hashed-bigram buckets (hash60 %
    // 64), same add-1 smoothing, same per-bucket micro-unit fixed-point
    // log-ratio, so the per-doc sum is integer-exact on both engines
    "docs_dsir_weights" ->
      """WITH w AS (
           SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
         gb AS (
           SELECT doc_id, source,
             CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 15))
               AS BIGINT) % 64 AS b
           FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)),
         tm AS (SELECT b, count(*) AS tc FROM gb WHERE source = 'src0' GROUP BY b),
         rm AS (SELECT b, count(*) AS rc FROM gb WHERE source <> 'src0' GROUP BY b),
         tt AS (SELECT CAST(sum(tc) AS DOUBLE) AS tt FROM tm),
         rt AS (SELECT CAST(sum(rc) AS DOUBLE) AS rt FROM rm),
         lr AS (
           SELECT bb.b,
             CAST(round(ln(((coalesce(tc, 0) + 1.0) / (tt + 64.0)) /
                           ((coalesce(rc, 0) + 1.0) / (rt + 64.0)))
                  * 1000000.0) AS BIGINT) AS lr
           FROM range(64) bb(b)
           LEFT JOIN tm ON bb.b = tm.b
           LEFT JOIN rm ON bb.b = rm.b
           CROSS JOIN tt CROSS JOIN rt),
         f AS (SELECT doc_id, b, count(*) AS f FROM gb
               WHERE source <> 'src0' GROUP BY doc_id, b),
         sc AS (SELECT doc_id, CAST(sum(f) AS BIGINT) AS n_grams,
                  CAST(sum(f * lr) AS BIGINT) AS logw_micro
                FROM f JOIN lr ON f.b = lr.b GROUP BY doc_id)
       SELECT d.doc_id AS id,
         coalesce(n_grams, 0) AS n_grams,
         coalesce(logw_micro, 0) AS logw_micro,
         round(coalesce(logw_micro, 0) / 1000000.0, 6) AS logw,
         coalesce(logw_micro, 0) >= 0 AS selected
       FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
       WHERE d.source <> 'src0'
       ORDER BY id""",

    "docs_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         g AS (
           SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
           FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)),
         c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g)
       SELECT doc_id AS id, CAST(sum(c) AS BIGINT) AS n_grams,
         round(max(c) * 1.0 / sum(c), 6) AS top_ngram_frac,
         round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c), 6)
           AS dup_ngram_frac
       FROM c GROUP BY doc_id ORDER BY id""",

    "docs_split_assign" ->
      s"""SELECT doc_id AS id, $Hash60 % 100 AS bucket,
            CASE WHEN $Hash60 % 100 < 10 THEN 'test'
                 WHEN $Hash60 % 100 < 20 THEN 'val'
                 ELSE 'train' END AS split
          FROM documents ORDER BY id""",

    "docs_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
          WHERE $Hash60 % 1000000 <
            (CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.5
                       WHEN 'zh' THEN 0.0 ELSE 1.0 END) * 1000000.0
          ORDER BY doc_id""",

    // the compacted corpus must hold exactly the split-assigned docs
    "docs_corpus_compact" ->
      s"""SELECT doc_id,
            CASE WHEN $Hash60 % 100 < 10 THEN 'test'
                 WHEN $Hash60 % 100 < 20 THEN 'val'
                 ELSE 'train' END AS split,
            source
          FROM documents ORDER BY doc_id""",

    // replays kmvDistinct: distinct (source, shingle-hash60), k smallest
    // per source, (k−1)·2^60/h_k — 255.0 * 2^60 is exactly representable
    // (8 significant bits), so the arithmetic is engine-identical
    "docs_distinct_shingles_kmv" ->
      """WITH t AS (
           SELECT DISTINCT source,
             CAST(('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]),
               1, 15)) AS BIGINT) AS h
           FROM (SELECT source, string_split(text, ' ') AS ws FROM documents),
                UNNEST(generate_series(1, len(ws) - 2)) AS tt(i)),
         r AS (SELECT source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h) AS r
               FROM t),
         kk AS (SELECT source, max(h) AS hk, count(*) AS n
                FROM r WHERE r <= 256 GROUP BY source)
       SELECT source, CAST(n AS BIGINT) AS n_kept,
         round(CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
               ELSE 255.0 * 1152921504606846976.0 / hk END, 6) AS est_distinct
       FROM kk ORDER BY source""",

    "docs_length_quantiles_sampled" ->
      s"""SELECT source,
            round(quantile_cont(nt, 0.5), 6) AS p50,
            round(quantile_cont(nt, 0.9), 6) AS p90,
            count(*) AS n_sampled
          FROM (SELECT source,
                  CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt
                FROM documents
                WHERE $Hash60 % 1000000 < 0.5 * 1000000.0)
          GROUP BY source ORDER BY source""",

    "docs_tfidf_top3" ->
      """WITH t AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         r AS (
           SELECT doc_id, term, round(tf * ln(n / df), 6) AS score,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY round(tf * ln(n / df), 6) DESC, term) AS rank
           FROM tf JOIN dfreq USING (term), n)
       SELECT doc_id AS id, CAST(rank AS INT) AS rank, term, score
       FROM r WHERE rank <= 3 ORDER BY id, rank""",

    "docs_chunks" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
       SELECT doc_id AS id, CAST((i - 1) // 30 AS INT) AS chunk_idx,
         array_to_string(ws[i:i+39], ' ') AS chunk_text,
         CAST(least(len(ws) - i + 1, 40) AS INT) AS n_tokens
       FROM w, UNNEST(generate_series(1, len(ws), 30)) AS t(i)
       ORDER BY id, chunk_idx""",

    "docs_packed" ->
      """SELECT source, CAST(start // 2048 AS BIGINT) AS seq_id,
           CAST(start % 2048 AS BIGINT) AS seq_pos,
           doc_id, nt AS n_tokens
         FROM (
           SELECT source, doc_id, nt,
             coalesce(sum(nt) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
           FROM (SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS INT) AS nt
                 FROM documents))
         ORDER BY source, doc_id""",

    "docs_length_quantiles" ->
      """WITH t AS (
           SELECT source,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt
           FROM documents)
         SELECT source,
           round(quantile_cont(nt, 0.5), 6) AS p50,
           round(quantile_cont(nt, 0.9), 6) AS p90,
           round(avg(nt), 6) AS mean_tokens,
           count(*) AS n_docs
         FROM t GROUP BY source ORDER BY source""",

    "docs_sample_k_per_source" ->
      s"""SELECT source, CAST(rank AS INT) AS rank, doc_id FROM (
            SELECT source, doc_id,
              row_number() OVER (PARTITION BY source
                ORDER BY $Hash60, doc_id) AS rank
            FROM documents)
          WHERE rank <= 3 ORDER BY source, rank""",

    "docs_mixture_manifest" ->
      s"""WITH kept AS (
            SELECT doc_id, lang, text FROM documents
            WHERE $Hash60 % 1000000 <
              (CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.5
                         WHEN 'zh' THEN 0.0 ELSE 1.0 END) * 1000000.0),
          a AS (
            SELECT lang,
              CASE WHEN $Hash60 % 100 < 10 THEN 'test'
                   WHEN $Hash60 % 100 < 20 THEN 'val'
                   ELSE 'train' END AS split,
              len(string_split(text, ' ')) AS nt
            FROM kept)
          SELECT lang, split, count(*) AS n_docs,
            CAST(sum(nt) AS BIGINT) AS n_tokens
          FROM a GROUP BY lang, split ORDER BY lang, split"""
  )
}
