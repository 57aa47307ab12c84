package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.CorpusStore

/** Round 13 — the corpus-index LIFECYCLE entries: the dedup index
  * maintained through accepts and takedowns ([[graft.pipeline
  * .CorpusStore]]) must serve EXACTLY what a full recompute over the
  * resulting corpus serves. All three probes share
  * [[Round6Entries.incrementalDedupSql]]'s oracle: the final corpus is
  * `doc_id % 5 != 0` in every scenario, reached through a different
  * lifecycle path each time — live recompute (docs_incremental_dedup),
  * curation-time index (docs_incremental_dedup_indexed), accept-grown
  * index (docs_corpus_accept), takedown-shrunk index
  * (docs_corpus_takedown). Divergence between any pair is a lifecycle
  * bug by definition.
  */
object Round13Entries {
  import EntryUtil.QueryFn

  private def docs(s: SparkSession, dir: String): DataFrame =
    EntryUtil.repartitioned(s, dir, "documents")

  private val acceptStores = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** ONE grown-store construction for the accept and compaction
    * entries (a drifted copy would let the two probe different corpora
    * under the same oracle): created over a curation-time subset
    * (`doc_id % 5 != 0 AND % 7 != 3`), then the held-out corpus docs
    * (`% 7 == 3`) arrive as an accepted batch — staged, healed,
    * index-appended through the lifecycle. The resulting corpus is
    * exactly `doc_id % 5 != 0`, the standing oracle's. */
  private def buildGrownStore(s: SparkSession, dir: String,
      prefix: String): String = {
    val path = EntryUtil.scratchDir(prefix)
    val d = docs(s, dir)
    CorpusStore.create(s, path,
      d.where(col("doc_id") % Round6Entries.BatchMod =!= 0 &&
        col("doc_id") % 7 =!= 3),
      "doc_id", "text", k = 3, numPerm = 32, bands = 8)
    CorpusStore.acceptBatch(s, path,
      d.where(col("doc_id") % Round6Entries.BatchMod =!= 0 &&
        col("doc_id") % 7 === 3))
    path
  }

  /** Memoized ACCEPT-grown store ([[buildGrownStore]]). */
  private def acceptStoreFor(s: SparkSession, dir: String): String =
    acceptStores.getOrElseUpdate((s, dir),
      buildGrownStore(s, dir, "graft_corpus_accept"))

  private val streamStores = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** Memoized STREAM-grown store: the same grown corpus as
    * [[buildGrownStore]], but the accepted docs arrive through a real
    * Structured Streaming query ([[graft.streaming.TsdbStream
    * .corpusStoreIngest]] — file source, one file per trigger, so the
    * store takes several genuine micro-batches through the staged
    * lifecycle). */
  private def streamStoreFor(s: SparkSession, dir: String): String =
    streamStores.getOrElseUpdate((s, dir), {
      val path = EntryUtil.scratchDir("graft_corpus_stream")
      val d = docs(s, dir)
      CorpusStore.create(s, path,
        d.where(col("doc_id") % Round6Entries.BatchMod =!= 0 &&
          col("doc_id") % 7 =!= 3),
        "doc_id", "text", k = 3, numPerm = 32, bands = 8)
      val accepted = d
        .where(col("doc_id") % Round6Entries.BatchMod =!= 0 &&
          col("doc_id") % 7 === 3)
        .select("doc_id", "text")
      val feed = EntryUtil.scratchDir("graft_corpus_stream_in") + "/in"
      accepted.repartition(3).write.parquet(feed)
      val in = s.readStream.schema(accepted.schema)
        .option("maxFilesPerTrigger", 1).parquet(feed)
      val q = graft.streaming.TsdbStream.corpusStoreIngest(
        in, path, s"$path/_ckpt", streamTag = "feed1")
      try q.processAllAvailable() finally q.stop()
      path
    })

  private val takedownStores = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** Memoized TAKEDOWN-shrunk store: created over the corpus PLUS a
    * contaminating extra set (`doc_id % 35 == 0` — batch docs that
    * would exact-match themselves on every probe), then the extras are
    * removed through the staged-takedown path. A failed takedown is
    * glaring: every `% 35 == 0` probe doc would read `exact` instead
    * of the oracle's answer. */
  private def takedownStoreFor(s: SparkSession, dir: String): String =
    takedownStores.getOrElseUpdate((s, dir), {
      val path = EntryUtil.scratchDir("graft_corpus_takedown")
      val d = docs(s, dir)
      CorpusStore.create(s, path,
        d.where(col("doc_id") % Round6Entries.BatchMod =!= 0 ||
          col("doc_id") % 35 === 0),
        "doc_id", "text", k = 3, numPerm = 32, bands = 8)
      val extras = d.where(col("doc_id") % 35 === 0)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      CorpusStore.removeDocuments(s, path, extras)
      path
    })

  /** The drift-refit fixture: the codebook was fitted when the corpus
    * was `vec_id % 4 != 0`; since then a NEW MODE arrived — the
    * `% 4 == 0` embeddings pulled 30% toward the positive orthant
    * (`0.3·|x| + 0.7·x` per component). The mode is CORRELATED (a real
    * new data mode) but individually spread, so under the STALE
    * codebook its members scatter across cells the queries don't probe
    * (measured stale recall ~0.4 at nprobe 2) while the refit gives
    * the mode its own centroids (recall ~1.0) — the recovery the
    * remedy must demonstrate. Queries probe inside the new mode, where
    * the drift landed. */
  private def driftFixture(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val emb = EntryUtil.repartitioned(s, dir, "embeddings")
    val old = emb.where(col("vec_id") % 4 =!= 0)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("embedding"))
    val newMode = emb.where(col("vec_id") % 4 === 0)
      .select(col("vec_id").as("id"),
        transform(col("embedding").cast("array<double>"),
          x => lit(0.3) * abs(x) + lit(0.7) * x).as("embedding"))
    (old, old.unionByName(newMode),
      newMode.where(col("id") < 40).select(col("id").as("qid"),
        col("embedding")))
  }

  private val staleDriftCodebooks = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[(Int, Seq[Double])]]

  /** The drift fixture's STALE codebook fit (deterministic Lloyd over
    * the pre-drift corpus) — memoized per (session, sf) like
    * [[EntryUtil.ivfCodebookFor]]: an index-build cost, not per-query
    * work. The per-run piece is the WRITE (the refit overwrites it). */
  private def staleDriftCodebookFor(s: SparkSession,
      dir: String): Seq[(Int, Seq[Double])] =
    staleDriftCodebooks.getOrElseUpdate((s, dir),
      graft.pipeline.Similarity.fitCodebook(
        driftFixture(s, dir)._1, nlist = 8, iters = 2))

  private val pipelineEngines = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.engine.Engine]

  /** Memoized engine whose context registers the PIPELINE tables too —
    * documents (id, text), embeddings (id, embedding) and the memoized
    * IVF codebook — so the knn/dedup statements run through the same
    * JSON front end as every TSDB statement. */
  private def pipelineEngineFor(s: SparkSession,
      dir: String): graft.engine.Engine =
    pipelineEngines.getOrElseUpdate((s, dir), {
      val ctx = graft.model.TsdbContext.fromTestdata(s, dir)
      new graft.engine.Engine(ctx.copy(
        documents = Some(docs(s, dir)
          .select(col("doc_id").as("id"), col("text"))),
        embeddings = Some(EntryUtil.repartitioned(s, dir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding"))),
        ivfCodebook = Some(EntryUtil.ivfCodebookFor(s, dir))))
    })

  private val compactStores = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** Memoized COMPACTED store: the SAME grown corpus as the accept
    * store ([[buildGrownStore]] — one construction, so the two entries
    * can never probe different corpora under the shared oracle), then
    * every per-accept `__batch` partition merged into one consolidated
    * batch through the staged-compaction path — the LSM answer to
    * small-partition accumulation. */
  private def compactStoreFor(s: SparkSession, dir: String): String =
    compactStores.getOrElseUpdate((s, dir), {
      val path = buildGrownStore(s, dir, "graft_corpus_compact")
      require(CorpusStore.stageCompaction(s, path).nonEmpty)
      CorpusStore.heal(s, path)
      path
    })

  val queries: Map[String, QueryFn] = Map(
    // the LSM half of the lifecycle: after compaction merges the
    // per-accept partitions into one consolidated batch, the probe
    // still serves exactly the full-recompute answer (same oracle as
    // the accept path — compaction is content-preserving by contract)
    "docs_corpus_compact_probe" -> ((s, dir) =>
      CorpusStore.probeBatch(s, compactStoreFor(s, dir),
          docs(s, dir).where(col("doc_id") % Round6Entries.BatchMod === 0),
          threshold = 0.8)
        .orderBy("id")),

    // the STREAMING accept path: a real Structured Streaming query
    // lands each micro-batch through the store's staged lifecycle
    // (micro-batch-id partition identity = exactly-once at the store),
    // and the probe over the stream-grown store serves exactly the
    // full-recompute answer — the same oracle as every other path to
    // this corpus
    "stream_corpus_store" -> ((s, dir) =>
      CorpusStore.probeBatch(s, streamStoreFor(s, dir),
          docs(s, dir).where(col("doc_id") % Round6Entries.BatchMod === 0),
          threshold = 0.8)
        .orderBy("id")),

    // the pipeline half behind the ONE query surface: {"dedup": ...}
    // through QueryParser/Engine — same parser dispatch as every TSDB
    // kind (reference queryparser.cc:887-918) — must serve exactly
    // what the Scala-API incremental dedup serves (shared oracle)
    "docs_dedup_stmt" -> ((s, dir) =>
      pipelineEngineFor(s, dir).execute(
          """{"dedup": {"batch": "id % 5 = 0", "threshold": 0.8,
               "k": 3, "num-perm": 32, "bands": 8}}""")
        .orderBy("id")),

    // {"knn": ...} serving from the REGISTERED codebook (nlist matches
    // → no per-statement fit), sharing emb_knn_ivf's oracle verbatim
    "emb_knn_stmt" -> ((s, dir) =>
      pipelineEngineFor(s, dir).execute(
          """{"knn": {"queries": "id < 10", "k": 3, "index": "ivf",
               "nlist": 8, "nprobe": 2}}""")
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("qid", "rank")),

    // the remedy behind emb_cell_drift: refit over the drifted corpus,
    // measure stale-vs-refit IVF recall against ONE brute exact frame,
    // re-register only when the refit found at least as many true
    // neighbors (integer gate — replays exactly). The fixture
    // re-registers the STALE codebook fresh each run, so repeated
    // executions (bench best-of-2) see the identical starting state
    "emb_drift_refit" -> ((s, dir) => {
      val (_, corpus, queries) = driftFixture(s, dir)
      val path = EntryUtil.scratchDir("graft_refit") + "/codebook"
      // the stale codebook's FIT is a deterministic index build —
      // memoized like EntryUtil.ivfCodebookFor; only the registration
      // WRITE is per-run (a passing refit overwrites it, and best-of-2
      // must see the identical starting state each run)
      graft.pipeline.Similarity.writeCodebook(s,
        staleDriftCodebookFor(s, dir), path)
      graft.pipeline.Similarity.refitCodebook(s, path, corpus, queries,
          k = 3, nlist = 8, nprobe = 2, iters = 2)
        .orderBy("qid")
    }),
    // the index lifecycle's ACCEPT half: a batch accepted into the
    // corpus is probe-visible immediately after the heal — the
    // accept-grown index serves exactly what a full recompute over
    // the grown corpus serves (the reference registers on first
    // write, standalone_database_session.cc:39-87; a curation
    // deployment whose dedup index missed accepted docs would
    // under-match from the first batch onward)
    "docs_corpus_accept" -> ((s, dir) =>
      CorpusStore.probeBatch(s, acceptStoreFor(s, dir),
          docs(s, dir).where(col("doc_id") % Round6Entries.BatchMod === 0),
          threshold = 0.8)
        .orderBy("id")),

    // the TAKEDOWN half: removed documents match NOTHING afterwards —
    // docs, hashes and bands all healed through the same staged
    // record, with only the __batch partitions holding the removed
    // ids rewritten (spec-pinned partition scope)
    "docs_corpus_takedown" -> ((s, dir) =>
      CorpusStore.probeBatch(s, takedownStoreFor(s, dir),
          docs(s, dir).where(col("doc_id") % Round6Entries.BatchMod === 0),
          threshold = 0.8)
        .orderBy("id")),

    // the standing alerts around the lifecycle, as a phase table:
    // staging raises corpus_pending, healing clears it; an
    // out-of-band docs write (bypassing the staging discipline)
    // raises corpus_unbanded from the LISTING diff alone, healing
    // re-derives the batch and clears it. Fresh store per run —
    // the phases mutate it
    "docs_corpus_health" -> ((s, dir) => {
      val path = EntryUtil.scratchDir("graft_corpus_health")
      val d = docs(s, dir)
      CorpusStore.create(s, path,
        d.where(col("doc_id") % Round6Entries.BatchMod =!= 0 &&
          col("doc_id") % 7 =!= 3),
        "doc_id", "text")
      def phase(name: String): Seq[(String, String, Long)] =
        CorpusStore.health(s, path).map { case (c, n) => (name, c, n) }
      val created = phase("created")
      CorpusStore.stageBatch(s, path,
        d.where(col("doc_id") % Round6Entries.BatchMod =!= 0 &&
          col("doc_id") % 7 === 3))
      val staged = phase("staged")
      CorpusStore.heal(s, path)
      val healed = phase("healed")
      // out-of-band write: a docs batch partition the index never saw.
      // coalesce(1): the BYPASS is the fixture's point, the 32-way
      // partition fan was incidental (a KB-sized batch at every sf) —
      // the heal's re-derivation then reads one file, not 32
      d.where(col("doc_id") % Round6Entries.BatchMod === 0)
        .coalesce(1)
        .withColumn(CorpusStore.BatchCol, lit("b_oob"))
        .write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(CorpusStore.BatchCol).mode("overwrite")
        .parquet(s"$path/${CorpusStore.DocsSub}")
      val oob = phase("oob")
      CorpusStore.heal(s, path)
      val reHealed = phase("re_healed")
      import s.implicits._
      (created ++ staged ++ healed ++ oob ++ reHealed)
        .toDF("phase", "component", "n")
        .orderBy("phase", "component")
    }))

  /** SQL mirror of [[graft.pipeline.Similarity.refitCodebook]] over the
    * drift fixture: two independent kmeans replays (stale fit over the
    * old corpus, refit over the drifted one — [[EntryUtil.kmeansCtes]]
    * prefixes "s"/"r"), one brute exact frame, two IVF probe pipelines
    * through the shared assignment CTE, recallAtK's per-query join,
    * and the integer sum(n_hit) gate. */
  private def driftRefitSql: String = {
    def ivfNn(prefix: String): String =
      s"""SELECT qid, id FROM (
            SELECT sq.id AS qid, sc.id AS id,
              row_number() OVER (PARTITION BY sq.id
                ORDER BY list_cosine_similarity(sq.v, sc.v) DESC, sc.id)
                AS rank
            FROM ${prefix}qry sq JOIN ${prefix}cor sc
              ON sq.cell = sc.cell AND sc.id != sq.id)
          WHERE rank <= 3"""
    def recallCte(prefix: String, suffix: String): String =
      s"""SELECT b.qid,
            CAST(sum(CASE WHEN s.id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
              AS n_hit_$suffix,
            round(sum(CASE WHEN s.id IS NULL THEN 0 ELSE 1 END)
              / count(*), 6) AS recall_$suffix
          FROM bn b LEFT JOIN (SELECT DISTINCT qid, id FROM ${prefix}nn) s
            ON b.qid = s.qid AND b.id = s.id
          GROUP BY b.qid"""
    s"""WITH oldv AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id % 4 <> 0),
         nm AS (SELECT vec_id AS id,
                  list_transform(CAST(embedding AS DOUBLE[]),
                    x -> 0.3 * abs(x) + 0.7 * x) AS v
                FROM embeddings WHERE vec_id % 4 = 0),
         cur AS (SELECT * FROM oldv UNION ALL SELECT * FROM nm),
         ${EntryUtil.kmeansCtes("s", "SELECT id, v FROM oldv", 8, 2)},
         ${EntryUtil.kmeansCtes("r", "SELECT id, v FROM cur", 8, 2)},
         q2 AS (SELECT id, v FROM nm WHERE id < 40),
         bn AS (SELECT qid, id FROM (
             SELECT q.id AS qid, c.id AS id,
               row_number() OVER (PARTITION BY q.id
                 ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.id)
                 AS rank
             FROM q2 q JOIN cur c ON c.id != q.id) WHERE rank <= 3),
         scor AS (${EntryUtil.nearestCellsSql("cur", "sc2", 1)}),
         sqry AS (${EntryUtil.nearestCellsSql("q2", "sc2", 2)}),
         snn AS (${ivfNn("s")}),
         rcor AS (${EntryUtil.nearestCellsSql("cur", "rc2", 1)}),
         rqry AS (${EntryUtil.nearestCellsSql("q2", "rc2", 2)}),
         rnn AS (${ivfNn("r")}),
         rs AS (${recallCte("s", "stale")}),
         rr AS (${recallCte("r", "refit")}),
         gate AS (SELECT CASE WHEN (SELECT sum(n_hit_refit) FROM rr) >=
                    (SELECT sum(n_hit_stale) FROM rs)
                  THEN 1 ELSE 0 END AS healed)
       SELECT rs.qid, n_hit_stale, recall_stale, n_hit_refit,
         recall_refit, healed
       FROM rs JOIN rr ON rs.qid = rr.qid CROSS JOIN gate
       ORDER BY rs.qid"""
  }

  val oracle: Map[String, String] = Map(
    "emb_drift_refit" -> driftRefitSql,

    // ONE oracle per capability across surfaces: the JSON statements
    // must serve exactly what the Scala-API forms serve
    "docs_dedup_stmt" -> Round6Entries.incrementalDedupSql,
    "emb_knn_stmt" -> PipelineEntries.oracle("emb_knn_ivf"),
    "docs_corpus_compact_probe" -> Round6Entries.incrementalDedupSql,
    "stream_corpus_store" -> Round6Entries.incrementalDedupSql,
    // one oracle for every lifecycle path to the same corpus — the
    // accept-grown index must serve the live-recompute answer
    "docs_corpus_accept" -> Round6Entries.incrementalDedupSql,
    "docs_corpus_takedown" -> Round6Entries.incrementalDedupSql,

    // the alert readings are construction-determined literals: one
    // staged record, zero→one→zero unbanded batch
    "docs_corpus_health" ->
      """SELECT * FROM (VALUES
           ('created',   'corpus_pending',  CAST(0 AS BIGINT)),
           ('created',   'corpus_unbanded', CAST(0 AS BIGINT)),
           ('staged',    'corpus_pending',  CAST(1 AS BIGINT)),
           ('staged',    'corpus_unbanded', CAST(0 AS BIGINT)),
           ('healed',    'corpus_pending',  CAST(0 AS BIGINT)),
           ('healed',    'corpus_unbanded', CAST(0 AS BIGINT)),
           ('oob',       'corpus_pending',  CAST(0 AS BIGINT)),
           ('oob',       'corpus_unbanded', CAST(1 AS BIGINT)),
           ('re_healed', 'corpus_pending',  CAST(0 AS BIGINT)),
           ('re_healed', 'corpus_unbanded', CAST(0 AS BIGINT)))
         AS t(phase, component, n)
         ORDER BY phase, component""")
}
