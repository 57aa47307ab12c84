package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{CorpusStore, EmbeddingStore}

/** Round 14 — the persisted, cell-partitioned EMBEDDING index
  * ([[graft.pipeline.EmbeddingStore]]) and the statement surface over
  * both lifecycle stores:
  *
  *   - `emb_knn_store` / `emb_knn_stmt_store`: index-served kNN (the
  *     library call and the `{"knn"}` statement) sharing
  *     `emb_knn_ivf`'s oracle verbatim — the persisted index must
  *     serve EXACTLY what the per-statement recompute serves, while
  *     reading only the probed cell partitions (PlanShapeSpec pins
  *     the scan set).
  *   - `emb_knn_ivfpq_stmt`: the production ANN layout behind the
  *     statement surface (`index: "ivfpq"`), served from the store's
  *     persisted PQ codes, sharing `emb_knn_ivfpq`'s oracle.
  *   - `emb_knn_store_grown`: the lifecycle — accepts and takedowns
  *     move the index, queries stay pinned to the create-time
  *     codebook's cells (the registered-index contract), and the
  *     oracle replays fit-on-initial + assign-final.
  *   - `emb_drift_tick`: the maintenance loop — a drifted batch lands
  *     through the staged lifecycle, healthCheck's `emb_drift` alert
  *     fires, and maintenanceTick's recall-gated refit heals it
  *     (epoch flip), clearing the alert.
  *   - `docs_dedup_stmt_store`: `{"dedup"}` routed through the
  *     registered corpus store ([[CorpusStore.probeBatch]], recipe
  *     from the manifest) — sharing the standing incremental-dedup
  *     oracle with every other lifecycle path to this corpus.
  *   - `docs_corpus_export`: exportDatabase carries the corpus store
  *     (tombstone log included); the exported store probes
  *     identically.
  *   - `stream_corpus_compact`: a tiered compaction staged WHILE a
  *     real stream keeps accepting — interleaved heals apply both in
  *     staging order and the probe still serves the full-recompute
  *     answer.
  *   - `stream_emb_store`: the embedding index fed by a real
  *     Structured Streaming query ([[graft.streaming.TsdbStream
  *     .embeddingStoreIngest]]) — exactly-once micro-batch identity,
  *     tombstone-filtered accepts, kNN over the stream-grown
  *     partitions on the fit-on-initial + assign-final oracle.
  */
object Round14Entries {
  import EntryUtil.QueryFn

  private def docs(s: SparkSession, dir: String): DataFrame =
    EntryUtil.repartitioned(s, dir, "documents")

  private def emb(s: SparkSession, dir: String): DataFrame =
    EntryUtil.repartitioned(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))

  // ------------------------------------------------ memoized fixtures

  private val embStores = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** ONE persisted embedding store over the full testdata embeddings,
    * with the `emb_knn_ivf` recipe (nlist 8, 2 Lloyd rounds — the
    * deterministic fit equals [[EntryUtil.ivfCodebookFor]]) and the
    * `emb_knn_ivfpq` PQ recipe (m 2, ksub 8) — built once like every
    * index ([[EntryUtil.ivfCodebookFor]]'s rationale), served by
    * three entries. */
  private def embStoreFor(s: SparkSession, dir: String): String =
    embStores.getOrElseUpdate((s, dir), {
      val path = EntryUtil.scratchDir("graft_emb_store")
      EmbeddingStore.create(s, path, emb(s, dir), nlist = 8, iters = 2,
        pq = Some((2, 8)))
      path
    })

  private val grownEmbStores = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** The LIFECYCLE-grown embedding store: created (codebook fitted)
    * over `vec_id % 4 != 0`, the `% 4 == 0` vectors ACCEPTED through
    * the staged lifecycle, the `% 10 == 7` ids taken DOWN — the final
    * index holds `% 10 != 7` assigned under the CREATE-time codebook
    * (accepts never refit; that is [[EmbeddingStore.refit]]'s job,
    * gated — `emb_drift_tick`). */
  private def grownEmbStoreFor(s: SparkSession, dir: String): String =
    grownEmbStores.getOrElseUpdate((s, dir), {
      val path = EntryUtil.scratchDir("graft_emb_grown")
      val e = emb(s, dir)
      EmbeddingStore.create(s, path, e.where(col("id") % 4 =!= 0),
        nlist = 8, iters = 2)
      EmbeddingStore.acceptBatch(s, path, e.where(col("id") % 4 === 0))
      val takedown = e.where(col("id") % 10 === 7)
        .select("id").collect().map(_.getLong(0)).toSeq.sorted
      EmbeddingStore.removeVectors(s, path, takedown)
      path
    })

  private val corpusStores = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** The statement-registered corpus store: the standing oracle's
    * corpus (`doc_id % 5 != 0`) behind one created index. */
  private def corpusStoreFor(s: SparkSession, dir: String): String =
    corpusStores.getOrElseUpdate((s, dir), {
      val path = EntryUtil.scratchDir("graft_dedup_store")
      CorpusStore.create(s, path,
        docs(s, dir).where(col("doc_id") % Round6Entries.BatchMod =!= 0),
        "doc_id", "text", k = 3, numPerm = 32, bands = 8)
      path
    })

  private val storeEngines = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), graft.engine.Engine]

  /** The STORE-REGISTERED engine: same pipeline tables as
    * [[Round13Entries]]' engine, plus the corpus and embedding store
    * registrations — `{"dedup"}` probes the persisted dedup index and
    * `{"knn"}` ivf/ivfpq serve from the persisted cell partitions.
    * The self-contained engine stays gated by the round-13 entries,
    * so BOTH serving paths hold the one oracle per capability. */
  private def storeEngineFor(s: SparkSession,
      dir: String): graft.engine.Engine =
    storeEngines.getOrElseUpdate((s, dir), {
      val ctx = graft.model.TsdbContext.fromTestdata(s, dir)
      new graft.engine.Engine(ctx.copy(
        documents = Some(docs(s, dir)
          .select(col("doc_id").as("id"), col("text"))),
        embeddings = Some(emb(s, dir)),
        corpusStore = Some(corpusStoreFor(s, dir)),
        embeddingStore = Some(embStoreFor(s, dir))))
    })

  private val exportDbs = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** A database directory carrying a corpus store WITH takedown
    * history, exported: created over `% 5 != 0 OR % 35 == 0`, the
    * `% 35 == 0` extras removed through the staged-takedown path (so
    * the tombstone log is non-empty and must survive the move), then
    * [[graft.model.TsdbLayout.exportDatabase]] to a fresh root. The
    * TSDB half is one pruned day of the testdata samples — the
    * export's subject here is the store. Returns the EXPORTED
    * database path. */
  private def exportedDbFor(s: SparkSession, dir: String): String =
    exportDbs.getOrElseUpdate((s, dir), {
      val src = EntryUtil.scratchDir("graft_exp_src")
      val dst = EntryUtil.scratchDir("graft_exp_dst") + "/db"
      val ctx = graft.model.TsdbContext.fromTestdata(s, dir)
      val dayNs = 86400L * 1000000000L
      graft.model.TsdbLayout.writeDatabase(
        ctx.copy(samples = ctx.samples
          .where(col("ts") >= EntryUtil.FromNs &&
            col("ts") < EntryUtil.FromNs + dayNs),
          events = ctx.events.limit(0)), src)
      val d = docs(s, dir)
      CorpusStore.create(s, s"$src/${graft.model.TsdbLayout.CorpusSub}",
        d.where(col("doc_id") % Round6Entries.BatchMod =!= 0 ||
          col("doc_id") % 35 === 0),
        "doc_id", "text", k = 3, numPerm = 32, bands = 8)
      val extras = d.where(col("doc_id") % 35 === 0)
        .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
      CorpusStore.removeDocuments(s,
        s"$src/${graft.model.TsdbLayout.CorpusSub}", extras)
      graft.model.TsdbLayout.exportDatabase(s, src, dst)
      dst
    })

  private val compactStreamStores = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** Compaction INTERLEAVED with stream accepts: create over
    * `% 5 != 0 AND % 7 ∉ {3, 4}`, stream-accept the `% 7 == 3` docs
    * (several real micro-batches), stage a full compaction of the
    * accumulated batches, then KEEP STREAMING (`% 7 == 4`) while the
    * staged record is live — the first post-staging trigger's heal
    * applies the compaction (staging order) and the later accepts
    * land as fresh batches the record does not name. Final corpus:
    * exactly `% 5 != 0`, the standing oracle's. */
  private def compactStreamStoreFor(s: SparkSession, dir: String): String =
    compactStreamStores.getOrElseUpdate((s, dir), {
      val path = EntryUtil.scratchDir("graft_corpus_cstream")
      val d = docs(s, dir)
      val base = col("doc_id") % Round6Entries.BatchMod =!= 0
      CorpusStore.create(s, path,
        d.where(base && col("doc_id") % 7 =!= 3 && col("doc_id") % 7 =!= 4),
        "doc_id", "text", k = 3, numPerm = 32, bands = 8)
      def streamIn(pred: org.apache.spark.sql.Column, tag: String): Unit = {
        val accepted = d.where(base && pred).select("doc_id", "text")
        val feed = EntryUtil.scratchDir(s"graft_cstream_in_$tag") + "/in"
        accepted.repartition(3).write.parquet(feed)
        val in = s.readStream.schema(accepted.schema)
          .option("maxFilesPerTrigger", 1).parquet(feed)
        val q = graft.streaming.TsdbStream.corpusStoreIngest(
          in, path, s"$path/_ckpt_$tag", streamTag = tag)
        try q.processAllAvailable() finally q.stop()
      }
      streamIn(col("doc_id") % 7 === 3, "feedA")
      // stage the compaction of everything accumulated so far...
      require(CorpusStore.stageCompaction(s, path).nonEmpty,
        "compaction fixture must have batches to merge")
      // ...and keep accepting WHILE it is staged: the next trigger's
      // heal applies the compaction first (staging order), then the
      // arriving accepts land as fresh batches it does not name
      streamIn(col("doc_id") % 7 === 4, "feedB")
      CorpusStore.heal(s, path)
      path
    })

  /** Pre-build the memoized store fixtures — write-once INDEX builds
    * (kmeans fits, assignments, exports), not query throughput; the
    * bench warms them untimed exactly like [[EntryUtil
    * .ivfCodebookFor]] and the layout writes. `emb_drift_tick` stays
    * fully timed: its fixture is fresh per run by design (the phases
    * mutate it) and is an index-build-class cost either way. */
  def warm(s: SparkSession, dir: String): Unit = {
    driftTemplateFor(s, dir)
    streamEmbStoreFor(s, dir)
    embStoreFor(s, dir)
    grownEmbStoreFor(s, dir)
    corpusStoreFor(s, dir)
    storeEngineFor(s, dir)
    exportedDbFor(s, dir)
    compactStreamStoreFor(s, dir)
  }

  private val streamEmbStores = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** Memoized STREAM-grown embedding store: created over
    * `vec_id % 4 != 0`, the `% 4 == 0` vectors arriving through a real
    * Structured Streaming query ([[graft.streaming.TsdbStream
    * .embeddingStoreIngest]] — file source, one file per trigger, so
    * the index takes several genuine micro-batches through the staged
    * lifecycle with (streamTag, micro-batch) partition identity). */
  private def streamEmbStoreFor(s: SparkSession, dir: String): String =
    streamEmbStores.getOrElseUpdate((s, dir), {
      val path = EntryUtil.scratchDir("graft_emb_stream")
      val e = emb(s, dir)
      EmbeddingStore.create(s, path, e.where(col("id") % 4 =!= 0),
        nlist = 8, iters = 2)
      val accepted = e.where(col("id") % 4 === 0)
      val feed = EntryUtil.scratchDir("graft_emb_stream_in") + "/in"
      accepted.repartition(3).write.parquet(feed)
      val in = s.readStream.schema(accepted.schema)
        .option("maxFilesPerTrigger", 1).parquet(feed)
      val q = graft.streaming.TsdbStream.embeddingStoreIngest(
        in, path, s"$path/_ckpt", streamTag = "vecfeed")
      try q.processAllAvailable() finally q.stop()
      path
    })

  private val driftTemplates = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** The drift-tick fixture TEMPLATE, built once: a database whose
    * embedding store was created over the `% 4 != 0` vectors and has
    * one STAGED drifted batch pending. `emb_drift_tick` copies it per
    * run (the phases mutate their copy), so the entry times the
    * maintenance LOOP, not the fixture construction.
    *
    * The staged mode lands at the MIDPOINT of the stale codebook's
    * three mutually-closest centroids (tight per-id jitter): its
    * members split across those cells — the share-drift alert fires
    * AND each query's nprobe-2 probe misses the neighbors that landed
    * in the third cell, so the stale codebook demonstrably
    * under-serves and the recall-gated refit WINS (the mode gets its
    * own cell). Measured at sf0.001/0.01/0.1: drift > 0, refit
    * healed, alert clears. The triple comes from the STORE'S own
    * codebook (create fits it) — no second fit; ONE Lloyd round per
    * fit (the fixture is job-count-bound, and the geometry needs only
    * roughly-settled centroids). */
  private[graft] def driftTemplateFor(s: SparkSession, dir: String): String =
    driftTemplates.getOrElseUpdate((s, dir), {
      val db = EntryUtil.scratchDir("graft_drift_tpl") + "/db"
      val ctx = graft.model.TsdbContext.fromTestdata(s, dir)
      val dayNs = 86400L * 1000000000L
      graft.model.TsdbLayout.writeDatabase(
        ctx.copy(samples = ctx.samples
          .where(col("ts") >= EntryUtil.FromNs &&
            col("ts") < EntryUtil.FromNs + dayNs),
          events = ctx.events.limit(0)), db)
      val embDir = s"$db/${graft.model.TsdbLayout.EmbSub}"
      val e = emb(s, dir)
      val old = e.where(col("id") % 4 =!= 0)
        .select(col("id"),
          col("embedding").cast("array<double>").as("embedding"))
      EmbeddingStore.create(s, embDir, old, nlist = 8, iters = 1)
      val centers = EmbeddingStore.readCenters(s, embDir)
      def sq(a: Seq[Double], b: Seq[Double]): Double =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val triple = centers.combinations(3).minBy { t =>
        sq(t(0)._2, t(1)._2) + sq(t(0)._2, t(2)._2) + sq(t(1)._2, t(2)._2) }
      val mid = triple.map(_._2).transpose.map(_.sum / 3.0)
      val newMode = e.where(col("id") % 4 === 0)
        .select(col("id"), zip_with(typedLit(mid), col("embedding")
          .cast("array<double>"), (m, x) => m + lit(0.05) * x)
          .as("embedding"))
      EmbeddingStore.stageBatch(s, embDir, newMode)
      db
    })

  /** Directory copy for the per-run fixture (local paths) — parallel
    * per-file NIO copies instead of Hadoop FileUtil's sequential walk:
    * the template db is many small parquet leaves and the copy is pure
    * harness transport (each bench run needs a fresh MUTABLE store),
    * so it should cost I/O, not a single-threaded file loop. */
  private def copyDir(src: String, dst: String): Unit = {
    import scala.jdk.CollectionConverters._
    import scala.collection.parallel.CollectionConverters._
    require(!src.contains("://") && !dst.contains("://"),
      s"copyDir is a LOCAL-filesystem fixture copy (got $src -> $dst)")
    val sp = java.nio.file.Paths.get(src)
    val dp = java.nio.file.Paths.get(dst)
    val walk = java.nio.file.Files.walk(sp)
    val all = try walk.iterator().asScala.toSeq finally walk.close()
    all.filter(java.nio.file.Files.isDirectory(_)).foreach { d =>
      java.nio.file.Files.createDirectories(dp.resolve(sp.relativize(d)))
    }
    val files = all.filterNot(java.nio.file.Files.isDirectory(_))
    files.par.foreach { f =>
      java.nio.file.Files.copy(f, dp.resolve(sp.relativize(f)),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  // ---------------------------------------------------------- queries

  val queries: Map[String, QueryFn] = Map(
    // index-served kNN from the persisted cell-partitioned store —
    // the R-tree's index-answers-kNN contract (rtree.h:631): the
    // probe reads ONLY the nprobe probed cell partitions, and serves
    // exactly what the per-statement recompute serves (one oracle)
    "emb_knn_store" -> ((s, dir) =>
      EmbeddingStore.knn(s, embStoreFor(s, dir),
          emb(s, dir).where(col("id") < 10)
            .select(col("id").as("qid"), col("embedding")),
          k = 3, nprobe = 2)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("qid", "rank")),

    // the same contract through the ONE JSON surface: {"knn"} with a
    // registered embedding store validates the statement's nlist
    // against the manifest recipe and serves from the partitions
    "emb_knn_stmt_store" -> ((s, dir) =>
      storeEngineFor(s, dir).execute(
          """{"knn": {"queries": "id < 10", "k": 3, "index": "ivf",
               "nlist": 8, "nprobe": 2}}""")
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("qid", "rank")),

    // the production ANN layout behind the statement: IVF cells prune,
    // the STORE'S persisted PQ codes score by ADC — the serving path
    // never reads a float corpus vector (plan-pinned)
    "emb_knn_ivfpq_stmt" -> ((s, dir) =>
      storeEngineFor(s, dir).execute(
          """{"knn": {"queries": "id < 10", "k": 3, "index": "ivfpq",
               "nlist": 8, "nprobe": 2, "m": 2, "ksub": 8}}""")
        .orderBy("qid", "rank")),

    // the lifecycle: accepts and takedowns moved the index; queries
    // serve from the create-time codebook's partitions over the
    // CURRENT vectors (fit-on-initial + assign-final, replayed by the
    // oracle)
    "emb_knn_store_grown" -> ((s, dir) =>
      EmbeddingStore.knn(s, grownEmbStoreFor(s, dir),
          emb(s, dir).where(col("id") < 10 && col("id") % 10 =!= 7)
            .select(col("id").as("qid"), col("embedding")),
          k = 3, nprobe = 2)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("qid", "rank")),

    // the maintenance loop as a phase table: a drifted batch lands
    // through the staged lifecycle, the standing emb_drift alert
    // fires, maintenanceTick's recall-gated refit (queries sampled
    // from the drifted cells) heals it and the alert clears. Fresh
    // store per run (the phases mutate it) — COPIED from a memoized
    // template, so each run pays the LOOP under test, not the
    // fixture's db+index construction. Alert magnitudes are
    // booleanized (cell counts vary with sf); the refit decision is
    // the integer recall gate, construction-determined by the fixture
    "emb_drift_tick" -> ((s, dir) => {
      val db = EntryUtil.scratchDir("graft_drift_db") + "/db"
      copyDir(driftTemplateFor(s, dir), db)
      val embDir = s"$db/${graft.model.TsdbLayout.EmbSub}"
      def phase(name: String): Seq[(String, String, Long)] =
        EmbeddingStore.health(s, embDir).map { case (c, n) =>
          (name, c, if (n > 0) 1L else 0L) }
      val staged = phase("p1_staged")
      val tick = graft.model.TsdbLayout
        .maintenanceTick(s, db, 0L, healIndexes = true)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val ticked = Seq(
        ("p2_ticked", "emb_healed", tick("emb_healed")),
        ("p2_ticked", "emb_drift_seen",
          if (tick("emb_drift_seen") > 0) 1L else 0L),
        ("p2_ticked", "emb_refit_healed", tick("emb_refit_healed")))
      val healedRows = phase("p3_healed") :+
        (("p3_healed", "epoch_flipped",
          if (EmbeddingStore.recipe(embDir).epoch == "cells_e1") 1L else 0L))
      import s.implicits._
      (staged ++ ticked ++ healedRows).toDF("phase", "component", "n")
        .orderBy("phase", "component")
    }),

    // {"dedup"} routed through the REGISTERED corpus store: the
    // statement's parameters validate against the manifest recipe and
    // the probe reads only the persisted index — same oracle as the
    // self-contained statement (docs_dedup_stmt) and every other
    // lifecycle path to this corpus
    "docs_dedup_stmt_store" -> ((s, dir) =>
      storeEngineFor(s, dir).execute(
          """{"dedup": {"batch": "id % 5 = 0", "threshold": 0.8,
               "k": 3, "num-perm": 32, "bands": 8}}""")
        .orderBy("id")),

    // exportDatabase carried the corpus store — docs, index, manifest
    // AND the takedown tombstone log — and the exported store probes
    // exactly like the source (one oracle); staged intents would have
    // refused the export (spec-pinned)
    "docs_corpus_export" -> ((s, dir) =>
      CorpusStore.probeBatch(s,
          s"${exportedDbFor(s, dir)}/${graft.model.TsdbLayout.CorpusSub}",
          docs(s, dir).where(col("doc_id") % Round6Entries.BatchMod === 0),
          threshold = 0.8)
        .orderBy("id")),

    // the STREAMING accept path for the embedding index: a real
    // Structured Streaming query lands each micro-batch through the
    // staged lifecycle ((streamTag, micro-batch) partition identity =
    // exactly-once at the index), and kNN over the stream-grown store
    // serves the fit-on-initial + assign-final answer — the kNN
    // partitions cover every streamed vector the moment its trigger
    // completes
    "stream_emb_store" -> ((s, dir) =>
      EmbeddingStore.knn(s, streamEmbStoreFor(s, dir),
          emb(s, dir).where(col("id") < 10)
            .select(col("id").as("qid"), col("embedding")),
          k = 3, nprobe = 2)
        .withColumn("cos", round(col("cos"), 6))
        .orderBy("qid", "rank")),

    // tiered compaction staged WHILE a stream keeps accepting:
    // interleaved heals apply compaction and accepts in staging
    // order, no accept is lost, and the probe serves the
    // full-recompute answer
    "stream_corpus_compact" -> ((s, dir) =>
      CorpusStore.probeBatch(s, compactStreamStoreFor(s, dir),
          docs(s, dir).where(col("doc_id") % Round6Entries.BatchMod === 0),
          threshold = 0.8)
        .orderBy("id")))

  // ---------------------------------------------------------- oracles

  /** SQL replay of a lifecycle-grown store's serving state: codebook
    * fitted over the INITIAL corpus (`% 4 != 0` — accepts never
    * refit; that is the gated refit's job), the CURRENT vectors
    * (`finPred`) assigned to its cells, nprobe-2 probe, cosine top-3. */
  private def fitInitialAssignFinalSql(finPred: String): String =
    s"""WITH ${EntryUtil.kmeansCtes("s",
          """SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings WHERE vec_id % 4 <> 0""", 8, 2)},
         fin AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings WHERE $finPred),
         fq AS (SELECT id, v FROM fin WHERE id < 10),
         cor AS (${EntryUtil.nearestCellsSql("fin", "sc2", 1)}),
         qry AS (SELECT id AS qid, v AS qv, cell FROM (
            ${EntryUtil.nearestCellsSql("fq", "sc2", 2)}))
       SELECT * FROM (
         SELECT qid, cor.id AS id,
           row_number() OVER (PARTITION BY qid
             ORDER BY list_cosine_similarity(qv, cor.v) DESC, cor.id) AS rank,
           round(list_cosine_similarity(qv, cor.v), 6) AS cos
         FROM qry JOIN cor ON qry.cell = cor.cell AND cor.id != qid)
       WHERE rank <= 3 ORDER BY qid, rank"""

  val oracle: Map[String, String] = Map(
    // ONE oracle per capability: the persisted index (library and
    // statement forms) serves exactly what the recompute serves
    "emb_knn_store" -> PipelineEntries.oracle("emb_knn_ivf"),
    "emb_knn_stmt_store" -> PipelineEntries.oracle("emb_knn_ivf"),
    "emb_knn_ivfpq_stmt" -> Round6Entries.oracle("emb_knn_ivfpq"),
    // fit-on-initial + assign-final across both lifecycle paths to a
    // grown index: operator accepts+takedowns, and the real stream
    "emb_knn_store_grown" -> fitInitialAssignFinalSql("vec_id % 10 <> 7"),
    "stream_emb_store" -> fitInitialAssignFinalSql("TRUE"),
    "docs_dedup_stmt_store" -> Round6Entries.incrementalDedupSql,
    "docs_corpus_export" -> Round6Entries.incrementalDedupSql,
    "stream_corpus_compact" -> Round6Entries.incrementalDedupSql,

    // the maintenance loop's phase table is construction-determined:
    // one staged intent; the drift alert fires after it lands and the
    // recall-gated refit (emb_drift_refit's fixture) flips the epoch
    "emb_drift_tick" ->
      """SELECT * FROM (VALUES
           ('p1_staged', 'emb_drift',        CAST(0 AS BIGINT)),
           ('p1_staged', 'emb_pending',      CAST(1 AS BIGINT)),
           ('p2_ticked', 'emb_drift_seen',   CAST(1 AS BIGINT)),
           ('p2_ticked', 'emb_healed',       CAST(1 AS BIGINT)),
           ('p2_ticked', 'emb_refit_healed', CAST(1 AS BIGINT)),
           ('p3_healed', 'emb_drift',        CAST(0 AS BIGINT)),
           ('p3_healed', 'emb_pending',      CAST(0 AS BIGINT)),
           ('p3_healed', 'epoch_flipped',    CAST(1 AS BIGINT)))
         AS t(phase, component, n)
         ORDER BY phase, component""")
}
