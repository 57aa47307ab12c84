package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryUtil.QueryFn
import graft.pipeline.{Dedup, TextOps}

/** Round-6 entries: the continuous-ingest / retrieval side of corpus
  * curation — incremental dedup of an ingest batch against an existing
  * corpus (the batch-vs-100TB form, corpus side never shuffled),
  * exact-substring duplicate spans (the shingle-hash form of
  * suffix-array substring dedup), and BM25 batch retrieval (per-query
  * top-k as one plan). All DuckDB-oracle-checked with the identical
  * hash / minhash / scoring arithmetic replayed in SQL.
  */
object Round6Entries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    EntryUtil.repartitioned(s, dir, "documents")

  // every 5th document plays the incoming ingest batch; the rest the
  // already-curated corpus. A modulus split (not a range) so both sides
  // span all sources and the batch genuinely contains exact and near
  // duplicates of corpus documents at every sf.
  private[entries] val BatchMod = 5

  // BM25 query set for the entry: three 3-term queries over the synthetic
  // vocabulary (all terms occur corpus-wide, so df/idf genuinely vary)
  private val Bm25Queries: Seq[(String, Seq[String])] = Seq(
    "q1" -> Seq("fast", "table", "scan"),
    "q2" -> Seq("hash", "join", "merge"),
    "q3" -> Seq("window", "group", "stream"))
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  val queries: Map[String, QueryFn] = Map(
    // continuous-ingest dedup: flag each batch document that duplicates
    // the EXISTING corpus (exact content hash, or ≥0.8 exact Jaccard
    // among MinHash-LSH band candidates) without comparing corpus docs
    // to each other — the corpus side never shuffles (all batch-derived
    // frames broadcast), which is the shape that matters when the corpus
    // is 100 TB and the batch is one crawl increment
    "docs_incremental_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.dedupAgainstCorpus(
          corpus = d.where(col("doc_id") % BatchMod =!= 0),
          batch = d.where(col("doc_id") % BatchMod === 0),
          idCol = "doc_id", textCol = "text",
          k = 3, numPerm = 32, bands = 8, threshold = 0.8)
        .orderBy("id")
    }),

    // substring-level duplication signal: per document, the fraction of
    // its 8-token span occurrences that appear anywhere else in the
    // corpus (Lee et al. 2022's suffix-array dedup in fixed-k shingle
    // form) — catches templated boilerplate document-level Jaccard misses
    "docs_substring_spans" -> ((s, dir) =>
      TextOps.substringSpans(docs(s, dir), "doc_id", "text", k = 8)
        .orderBy("id")),

    // BM25 batch retrieval: top-5 documents per query for a 3-query set,
    // scored corpus-wide in one plan (broadcast query terms prune the
    // token explosion; WindowGroupLimit keeps the per-query cut map-side)
    "docs_bm25_topk" -> ((s, dir) =>
      TextOps.bm25TopK(docs(s, dir), "doc_id", "text",
          Bm25Queries, k1 = Bm25K1, b = Bm25B, k = 5)
        .orderBy("query_id", "rank")),

    // containment (|A∩B|/|A|, ordered): the snippet-inside-aggregator
    // duplication symmetric Jaccard misses when the containing side is
    // much larger; same capped posting-list shape as docs_jaccard_pairs
    "docs_containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairs(docs(s, dir), "doc_id", "text", k = 3,
          threshold = 0.8, maxShingleFreq = Some(20))
        .withColumn("containment", round(col("containment"), 6))
        .orderBy("id_a", "id_b")),

    // detect -> REDACT: the same synthetic PII fixture as docs_pii, each
    // match replaced by its typed placeholder; the entry compares the
    // audit count and the md5 of the redacted text itself (the patterns
    // are the RE2∩Java-identical set, so the rewritten bytes agree)
    "docs_pii_redact" -> ((s, dir) =>
      TextOps.piiRedact(EntryUtil.piiFixture(docs(s, dir)), "doc_id", "text")
        .select(col("id"), col("n_redacted"),
          md5(col("text_redacted")).as("redacted_hash"))
        .orderBy("id")),

    // real BPE: 6 merges learned on the word-type table (frequency-
    // weighted, lexicographic tie-break), then every doc's subword count
    // via a broadcast vocab-state join — the trainer the "BPE-ish regex"
    // token count approximates, integer/string-exact end to end
    "docs_bpe_tokens" -> ((s, dir) =>
      TextOps.bpeTokenCounts(docs(s, dir), "doc_id", "text", rounds = 6)
        .orderBy("id")),

    // CCNet-style perplexity filter: avg negative log-prob of each doc's
    // hashed bigrams under the corpus bucket model, selection threshold
    // 4.13 nats/gram (the corpus median — a genuine ~50/50 cut at every
    // sf); fixed-point micro-nats make the scores exact integer sums
    "docs_ngram_ppl" -> ((s, dir) =>
      TextOps.ngramPerplexity(docs(s, dir), "doc_id", "text",
          buckets = 64, k = 2, maxAvgNllMicro = 4130000L)
        .orderBy("id")),

    // PQ + ADC nearest-neighbor: the corpus compresses to m=2 sub-centroid
    // codes per vector (the index that makes 100 TB of embeddings
    // searchable in memory) and each query scores the corpus by summing
    // its broadcast per-subspace distance table at the codes — fit,
    // encode, table and ranking all replayed CTE-for-CTE by the oracle
    "emb_pq_adc" -> ((s, dir) => {
      val emb = EntryUtil.repartitioned(s, dir, "embeddings")
      graft.pipeline.Similarity.pqAdcTopK(
          emb.select(col("vec_id").as("id"), col("embedding")),
          emb.where(col("vec_id") < 10)
            .select(col("vec_id").as("qid"), col("embedding")),
          EntryUtil.pqCodebooksFor(s, dir), k = 3)
        .orderBy("qid", "rank")
    }),

    // IVF-PQ: the production ANN layout — the memoized IVF codebook's
    // cells prune candidates (nprobe=2 of 8), the memoized PQ codebooks
    // score the survivors by ADC; both index columns are build-time
    // artifacts and a query never touches a float vector of the corpus
    "emb_knn_ivfpq" -> ((s, dir) => {
      val emb = EntryUtil.repartitioned(s, dir, "embeddings")
      graft.pipeline.Similarity.knnIvfPq(
          EntryUtil.ivfCodebookFor(s, dir),
          EntryUtil.pqCodebooksFor(s, dir),
          emb.select(col("vec_id").as("id"), col("embedding")),
          emb.where(col("vec_id") < 10)
            .select(col("vec_id").as("qid"), col("embedding")),
          k = 3, nprobe = 2)
        .orderBy("qid", "rank")
    }),

    // incremental dedup executed as a REAL Structured Streaming query:
    // the batch documents stream in ts-ordered micro-batches (synthetic
    // event time: 1 s per doc_id), each probing the static corpus hash
    // index by broadcast anti-join. In-stream repeats are exercised two
    // ways — mapChunk re-sends every row within its micro-batch, and the
    // feed appends copies of the first 50 docs at the end, so CROSS-batch
    // dedup state is live too (a broken state store would re-emit them →
    // ROWS mismatch). The watermark horizon is sized past the whole feed
    // span, so in-horizon dedup ≡ the oracle's global min-per-hash at
    // every sf (state eviction before end-of-feed would break that
    // equivalence, not just shrink state). Sink = exactly the batch docs
    // new to the corpus — docs_incremental_dedup's continuous half.
    "stream_incremental_dedup" -> ((s, dir) => {
      implicit val enc =
        org.apache.spark.sql.Encoders.product[(Long, Long, String, String)]
      val d = s.read.parquet(s"$dir/documents.parquet")
      // cache the index: a stream-static join re-executes the static
      // subtree every micro-batch — without this the corpus scan +
      // distinct shuffle would run once per trigger
      val corpusHashes = d.where(col("doc_id") % BatchMod =!= 0)
        .select(md5(col("text")).as("text_hash")).distinct().cache()
      try {
        val batch = d.where(col("doc_id") % BatchMod === 0)
          .select("doc_id", "source", "text").orderBy("doc_id")
          .collect()
          // day-one base: an event time of exactly epoch 0 (doc_id 0) sits
          // on the initial watermark and is discarded as late
          .map(r => (r.getLong(0), 86400000000000L + r.getLong(0) * 1000000000L,
            r.getString(1), r.getString(2))).toSeq
        val feed = batch ++ batch.take(50)
        // foldLeft max: an empty batch must degrade to an empty result,
        // not throw on Seq.max
        val horizon =
          s"${batch.map(_._1).foldLeft(0L)(math.max) + 3600} seconds"
        EntryUtil.runStreamEntry(s, "stream_incr_dedup_sink", feed, chunks = 3,
          cols = Seq("doc_id", "ts", "source", "text"),
          mkStream = graft.streaming.TsdbStream.incrementalDedup(
            _, corpusHashes, "text", "ts", horizon),
          mapChunk = (c: Seq[(Long, Long, String, String)]) => c ++ c)
          .select(col("doc_id").as("id"), col("source"))
          .orderBy("id")
      } finally corpusHashes.unpersist(false)
    })
  )

  private def h60(s: String): String = EntryUtil.h60Sql(s)

  /** k-word positional span string ws[i]..ws[i+k-1], ' '-joined. */
  private def spanExpr(k: Int): String =
    (0 until k).map(j => if (j == 0) "ws[i]" else s"ws[i+$j]")
      .mkString(" || ' ' || ")

  // the same 32-perm/8-band MinHash mirror docs_minhash_pairs uses,
  // restricted to corpus×batch candidate pairs (identical arithmetic to
  // Dedup.dedupAgainstCorpus: base hash mod 2^31-1, affine perms, band
  // keys as comma-joined minima)
  private[entries] val incrementalDedupSql: String = {
    val M = Dedup.MinhashPrime
    val (minSelects, bandKeys) = EntryUtil.minhashSqlParts(32, 8)
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         sh AS (SELECT DISTINCT doc_id, ${spanExpr(3)} AS g
                FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
         ex AS (
           SELECT bt.doc_id AS id, min(ct.doc_id) AS exact_dup_of
           FROM documents bt JOIN documents ct ON md5(bt.text) = md5(ct.text)
           WHERE bt.doc_id % $BatchMod = 0 AND ct.doc_id % $BatchMod <> 0
           GROUP BY bt.doc_id),
         shh AS (SELECT DISTINCT doc_id, ${h60("g")} AS h FROM sh),
         shb AS (SELECT doc_id, h % $M AS hb FROM shh),
         mh AS (SELECT doc_id, $minSelects FROM shb GROUP BY doc_id),
         bands AS (
           SELECT doc_id, b AS band, CASE b $bandKeys END AS band_key
           FROM mh, UNNEST(generate_series(0, 7)) AS t(b)),
         cand AS (
           SELECT DISTINCT x.doc_id AS bid, y.doc_id AS cid
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.band_key = y.band_key
           WHERE x.doc_id % $BatchMod = 0 AND y.doc_id % $BatchMod <> 0),
         -- sizes AND intersections over DISTINCT hashes (shh), exactly
         -- the engine's set-Jaccard arithmetic: a 60-bit collision then
         -- shrinks the union and dedupes the intersection identically
         -- in both engines instead of inflating only one side
         sz AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY doc_id),
         ver AS (
           SELECT bid, cid, count(*) AS c
           FROM cand JOIN shh sa ON sa.doc_id = bid
             JOIN shh sb ON sb.doc_id = cid AND sa.h = sb.h
           GROUP BY bid, cid),
         near AS (
           SELECT bid AS id, min(cid) AS near_dup_of
           FROM ver JOIN sz za ON za.doc_id = bid
             JOIN sz zb ON zb.doc_id = cid
           WHERE c * 1.0 / (za.n + zb.n - c) >= 0.8
           GROUP BY bid)
       SELECT d.doc_id AS id, ex.exact_dup_of, near.near_dup_of,
         CASE WHEN ex.exact_dup_of IS NOT NULL THEN 'exact'
              WHEN near.near_dup_of IS NOT NULL THEN 'near'
              ELSE 'new' END AS status
       FROM documents d
       LEFT JOIN ex ON ex.id = d.doc_id
       LEFT JOIN near ON near.id = d.doc_id
       WHERE d.doc_id % $BatchMod = 0
       ORDER BY id"""
  }

  private val bm25Sql: String = {
    val qvals = Bm25Queries.flatMap { case (q, ts) =>
      ts.map(t => s"('$q', '$t')")
    }.mkString(", ")
    // literals stringified from the SAME Scala doubles the Spark plan
    // uses (shortest round-trip repr), so both engines parse identical
    // values: k1+1, k1, 1-b, b
    val k1p1 = (Bm25K1 + 1.0).toString
    val oneMinusB = (1.0 - Bm25B).toString
    s"""WITH q(query_id, term) AS (VALUES $qvals),
         w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         toks AS (SELECT doc_id, len(ws) AS dl, u.term
                  FROM w, UNNEST(ws) AS u(term)),
         tf AS (SELECT doc_id, term, dl, count(*) AS tf
                FROM toks WHERE term IN (SELECT term FROM q)
                GROUP BY doc_id, term, dl),
         dfreq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
         tot AS (SELECT count(*) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
                 FROM documents),
         sc AS (
           SELECT query_id, doc_id,
             round(sum(
               ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5)) *
               ((tf * $k1p1) / (tf + $Bm25K1 * ($oneMinusB +
                 $Bm25B * dl * (CAST(n_docs AS DOUBLE) / n_tokens))))), 6)
               AS score
           FROM tf JOIN q USING (term) JOIN dfreq USING (term), tot
           GROUP BY query_id, doc_id),
         r AS (
           SELECT query_id, doc_id, score,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
           FROM sc)
       SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
       FROM r WHERE rank <= 5
       ORDER BY query_id, rank"""
  }

  /** SQL replay of [[graft.pipeline.Similarity.fitPqCodebooks]] +
    * [[graft.pipeline.Similarity.pqAdcTopK]]: one prefixed
    * [[EntryUtil.kmeansCtes]] fit per subspace over the sliced
    * embeddings, nearest-sub-centroid codes, per-query distance tables,
    * ADC sum (m = 2: two-term IEEE addition is order-exact) rounded
    * before the rank. */
  private def pqFitCtes(dim: Int, m: Int, ksub: Int, iters: Int): String = {
    val d = dim / m
    (0 until m).map { sub =>
      EntryUtil.kmeansCtes(s"s${sub}_",
        s"SELECT vec_id AS id, CAST(embedding AS DOUBLE[])[${sub * d + 1}:${(sub + 1) * d}] AS v FROM embeddings",
        ksub, iters)
    }.mkString(",\n ")
  }

  private def pqCodesUnion(m: Int, iters: Int): String =
    (0 until m).map { sub =>
      s"""SELECT id, $sub AS sub, cell FROM (
            ${EntryUtil.nearestCellsSql(s"s${sub}_e", s"s${sub}_c$iters", 1)})"""
    }.mkString(" UNION ALL ")

  private def pqQtUnion(m: Int, iters: Int): String =
    (0 until m).map { sub =>
      s"""SELECT e.id AS qid, $sub AS sub, c.cell,
            ${EntryUtil.sqlDist("e.v", "c.cv")} AS qd
          FROM s${sub}_e e CROSS JOIN s${sub}_c$iters c WHERE e.id < 10"""
    }.mkString(" UNION ALL ")

  private val pqRankTail =
    """r AS (
         SELECT qid, id, adist,
           row_number() OVER (PARTITION BY qid ORDER BY adist, id) AS rank
         FROM sc)"""

  private def pqOracle(dim: Int, m: Int, ksub: Int, iters: Int, k: Int): String =
    s"""WITH ${pqFitCtes(dim, m, ksub, iters)},
         cd AS (${pqCodesUnion(m, iters)}),
         qt AS (${pqQtUnion(m, iters)}),
         sc AS (
           SELECT qt.qid, cd.id, round(sum(qt.qd), 6) AS adist
           FROM cd JOIN qt ON cd.sub = qt.sub AND cd.cell = qt.cell
           WHERE cd.id <> qt.qid
           GROUP BY qt.qid, cd.id),
         $pqRankTail
       SELECT qid, id, CAST(rank AS INT) AS rank, adist
       FROM r WHERE rank <= $k ORDER BY qid, rank"""

  /** SQL replay of [[graft.pipeline.Similarity.knnIvfPq]]: the plain IVF
    * kmeans CTEs give coarse cells (corpus r = 1, queries r <= nprobe),
    * the per-subspace PQ fits give codes and query tables, and ADC runs
    * only over the cell-matched candidate pairs. */
  private def ivfPqOracle(dim: Int, m: Int, ksub: Int, nlist: Int,
      nprobe: Int, iters: Int, k: Int): String =
    s"""WITH ${EntryUtil.kmeansCtes("",
          "SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
          nlist, iters)},
         ${pqFitCtes(dim, m, ksub, iters)},
         cor AS (SELECT id, cell FROM (
            ${EntryUtil.nearestCellsSql("e", s"c$iters", 1)})),
         qry AS (SELECT id AS qid, cell FROM (
            ${EntryUtil.nearestCellsSql("e", s"c$iters", nprobe, " WHERE e.id < 10")})),
         cd AS (${pqCodesUnion(m, iters)}),
         qt AS (${pqQtUnion(m, iters)}),
         cand AS (
           SELECT DISTINCT qry.qid, cor.id
           FROM qry JOIN cor USING (cell)
           WHERE cor.id <> qry.qid),
         sc AS (
           SELECT ca.qid, ca.id, round(sum(qt.qd), 6) AS adist
           FROM cand ca JOIN cd ON cd.id = ca.id
             JOIN qt ON qt.qid = ca.qid AND qt.sub = cd.sub
               AND qt.cell = cd.cell
           GROUP BY ca.qid, ca.id),
         $pqRankTail
       SELECT qid, id, CAST(rank AS INT) AS rank, adist
       FROM r WHERE rank <= $k ORDER BY qid, rank"""

  /** SQL replay of [[graft.pipeline.TextOps.bpeVocab]] +
    * [[graft.pipeline.TextOps.bpeTokenCounts]]: one CTE pair per
    * unrolled merge round (overlapping pair counts → lexicographic-tie
    * argmax → leftmost non-overlapping replace on the sentinel-padded
    * states; chr(1) is the never-matching no-op once every word is one
    * symbol, mirroring the trainer's early stop), then the per-doc
    * count via the word → final-state join. No floating point anywhere. */
  private def bpeOracle(rounds: Int): String = {
    val roundCtes = (0 until rounds).map { r =>
      // pr: the round's winning pair split into (a, b, merged) — or the
      // chr(1) never-matching no-op when every word is one symbol (the
      // trainer's early stop). The merge is the same greedy left-to-right
      // fold the engine runs: append each symbol unless the accumulator
      // ends with " a" and the symbol is b, in which case the tail
      // becomes " ab" (a token produced by this round's merge no longer
      // equals a, so occurrences never overlap).
      s"""p$r AS (SELECT ss[i] || ' ' || ss[i+1] AS pair, sum(f) AS c
             FROM (SELECT f, string_split(st, ' ') AS ss FROM v$r),
               UNNEST(generate_series(1, len(ss) - 1)) AS t(i)
             GROUP BY pair),
           b$r AS (
             SELECT string_split(pr, ' ')[1] AS a, string_split(pr, ' ')[2] AS b,
               replace(pr, ' ', '') AS m
             FROM (SELECT coalesce(
               (SELECT pair FROM p$r ORDER BY c DESC, pair LIMIT 1),
               chr(1) || ' ' || chr(1)) AS pr)),
           v${r + 1} AS (
             SELECT word, f, ltrim(list_reduce(
               list_concat([' ' || ss[1]], ss[2:]),
               (acc, x) -> CASE
                 WHEN ends_with(acc, ' ' || b$r.a) AND x = b$r.b
                 THEN substring(acc, 1, length(acc) - length(b$r.a) - 1)
                   || ' ' || b$r.m
                 ELSE acc || ' ' || x END)) AS st
             FROM (SELECT word, f, string_split(st, ' ') AS ss FROM v$r), b$r)"""
    }.mkString(",\n ")
    val roundsSql = if (roundCtes.isEmpty) "" else roundCtes + ",\n "
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         words AS (SELECT u.w AS word, count(*) AS f
                   FROM w, UNNEST(ws) AS u(w) WHERE len(u.w) > 0
                   GROUP BY u.w),
         v0 AS (SELECT word, f,
                  array_to_string(string_split(word, ''), ' ') AS st
                FROM words),
         $roundsSql
         dtok AS (SELECT doc_id, u.w AS word FROM w, UNNEST(ws) AS u(w)
                  WHERE len(u.w) > 0),
         res AS (SELECT doc_id, count(*) AS n_words,
                   CAST(sum(len(string_split(v.st, ' '))) AS BIGINT)
                     AS n_bpe_tokens
                 FROM dtok JOIN v$rounds v USING (word) GROUP BY doc_id)
       SELECT d.doc_id AS id, coalesce(n_words, 0) AS n_words,
         coalesce(n_bpe_tokens, 0) AS n_bpe_tokens
       FROM documents d LEFT JOIN res ON res.doc_id = d.doc_id
       ORDER BY id"""
  }

  val oracle: Map[String, String] = Map(
    "docs_incremental_dedup" -> incrementalDedupSql,

    "docs_bpe_tokens" -> bpeOracle(rounds = 6),

    // docs_jaccard_pairs' CTE chain with ordered pairs and the |A∩B|/|A|
    // denominator (identical shingling, cap and rounding)
    "docs_containment_pairs" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           sh AS (SELECT DISTINCT doc_id, ${spanExpr(3)} AS g
                  FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)),
           sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           freq AS (SELECT g, count(*) AS df FROM sh GROUP BY g),
           shp AS (SELECT sh.doc_id, sh.g FROM sh JOIN freq USING (g)
                   WHERE df <= 20),
           inter AS (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
             FROM shp a JOIN shp b USING (g) WHERE a.doc_id <> b.doc_id
             GROUP BY 1, 2)
         SELECT id_a, id_b, round(c * 1.0 / sa.n, 6) AS containment
         FROM inter JOIN sz sa ON sa.doc_id = id_a
         WHERE c * 1.0 / sa.n >= 0.8
         ORDER BY id_a, id_b""",

    "docs_pii_redact" -> {
      val counts = TextOps.PiiPatterns
        .map { case (_, re) => s"len(regexp_extract_all(text, '$re'))" }
        .mkString(" + ")
      val redacted = TextOps.PiiPatterns.foldLeft("text") {
        case (expr, (name, re)) =>
          s"regexp_replace($expr, '$re', '[${name.toUpperCase}]', 'g')"
      }
      s"""SELECT doc_id AS id, $counts AS n_redacted,
            md5($redacted) AS redacted_hash
          FROM (${EntryUtil.piiFixtureSql})
          ORDER BY id"""
    },

    // same fixed-point idiom as docs_dsir_weights: per-bucket micro-nat
    // log-probs as BIGINTs, integer doc sums, integer selection compare
    "docs_ngram_ppl" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           gb AS (SELECT doc_id,
               ${h60("ws[i] || ' ' || ws[i+1]")} % 64 AS b
             FROM w, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)),
           m AS (SELECT b, count(*) AS c FROM gb GROUP BY b),
           tt AS (SELECT CAST(sum(c) AS DOUBLE) AS tc FROM m),
           nll AS (
             SELECT bb.b,
               CAST(round(-ln((coalesce(c, 0) + 1.0) / (tc + 64.0))
                    * 1000000.0) AS BIGINT) AS nll
             FROM range(64) bb(b) LEFT JOIN m ON bb.b = m.b CROSS JOIN tt),
           f AS (SELECT doc_id, b, count(*) AS f FROM gb GROUP BY doc_id, b),
           sc AS (SELECT doc_id, CAST(sum(f) AS BIGINT) AS n_grams,
                    CAST(sum(f * nll) AS BIGINT) AS nll_micro
                  FROM f JOIN nll USING (b) GROUP BY doc_id)
         SELECT d.doc_id AS id,
           coalesce(n_grams, 0) AS n_grams,
           coalesce(nll_micro, 0) AS nll_micro,
           CASE WHEN coalesce(n_grams, 0) > 0
                THEN CAST(round(nll_micro / CAST(n_grams AS DOUBLE)) AS BIGINT)
                     / 1000000.0
           END AS avg_nll,
           coalesce(n_grams, 0) > 0 AND
             coalesce(nll_micro, 0) <= 4130000 * coalesce(n_grams, 0) AS selected
         FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
         ORDER BY id""",

    "emb_pq_adc" -> pqOracle(dim = 64, m = 2, ksub = 8, iters = 2, k = 3),

    "emb_knn_ivfpq" -> ivfPqOracle(dim = 64, m = 2, ksub = 8, nlist = 8,
      nprobe = 2, iters = 2, k = 3),

    "docs_substring_spans" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           sp AS (SELECT doc_id, ${h60(spanExpr(8))} AS h
                  FROM w, UNNEST(generate_series(1, len(ws) - 7)) AS t(i)),
           pc AS (SELECT doc_id, h, count(*) AS c FROM sp GROUP BY doc_id, h),
           gc AS (SELECT h, CAST(sum(c) AS BIGINT) AS n_occ FROM pc GROUP BY h)
         SELECT doc_id AS id, CAST(sum(c) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN n_occ >= 2 THEN c ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           round(sum(CASE WHEN n_occ >= 2 THEN c ELSE 0 END) * 1.0 / sum(c), 6)
             AS dup_fraction
         FROM pc JOIN gc USING (h)
         GROUP BY doc_id ORDER BY id""",

    "docs_bm25_topk" -> bm25Sql,

    // new-to-corpus batch docs, first arrival kept: the anti-join replays
    // the corpus probe (NOT EXISTS, not NOT IN — one NULL corpus text
    // would make NOT IN veto every row where the engine's null-unsafe
    // left_anti keeps them), min(doc_id) per hash the ts-ordered
    // in-stream dedup (the feed's event time is monotone in doc_id)
    "stream_incremental_dedup" ->
      s"""WITH b AS (SELECT doc_id, source, md5(text) AS th
                     FROM documents WHERE doc_id % $BatchMod = 0),
           c AS (SELECT DISTINCT md5(text) AS th
                 FROM documents WHERE doc_id % $BatchMod <> 0),
           nb AS (SELECT doc_id, source, th FROM b
                  WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.th = b.th)),
           k AS (SELECT min(doc_id) AS id FROM nb GROUP BY th)
         SELECT doc_id AS id, source FROM nb
         WHERE doc_id IN (SELECT id FROM k)
         ORDER BY id""")
}
