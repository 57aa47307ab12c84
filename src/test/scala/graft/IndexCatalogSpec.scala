package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Engine, Rollup}
import graft.model.{GapIndexDef, IndexCatalog, KmvIndexDef, MadIndexDef, TsdbContext}

/** The persisted index catalog: save → load round-trips every
  * registered index family bit-for-bit, the loaded registration serves
  * statements exactly like the hand-wired one, and every way a
  * manifest can be wrong fails LOUDLY at load (or at engine
  * construction, for data-half poisoning the manifest can't see) —
  * the reference's restartable metastorage contract
  * (meta_storage.h:44+) re-expressed as parquet + one manifest. */
class IndexCatalogSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val hourNs = 3600000000000L
  private val dayNs = 86400000000000L
  private val FromNs = graft.entries.EntryUtil.FromNs
  private val ToNs = graft.entries.EntryUtil.ToNs

  private lazy val ctx = TsdbContext.fromTestdata(spark, dir)

  /** Catalog cached, as every deployment's is — keeps the series
    * derivation's events.parquet scan out of served-plan assertions. */
  private lazy val cachedCtx = ctx.copy(series = ctx.series.cache())

  private lazy val namedRanged = ctx.samples
    .where(col("ts") >= FromNs && col("ts") < ToNs)
    .join(ctx.series.select(col("series_id"), col("name")), "series_id")

  /** One registered index of EVERY family over the testdata. */
  private lazy val fullCtx = ctx.copy(
    rollups = Seq(hourNs -> Rollup.build(ctx.samples, hourNs)),
    histograms = Seq(hourNs -> graft.ops.HistQuantiles.histogram(
      ctx.samples.withColumn("win",
        col("ts") - pmod(col("ts"), lit(hourNs))),
      Seq("series_id", "win"))),
    bucketSums = Seq(hourNs ->
      graft.ops.Stats.bucketSums(ctx.samples, hourNs, keyCol = "series_id")),
    kmvIndexes = Seq(KmvIndexDef("user", dayNs, 64,
      graft.ops.Sketches.kmvIndex(
        ctx.samples.join(ctx.series.select(col("series_id"), col("metric"),
            col("tags").getItem("user").as("__tv")), "series_id")
          .where(col("__tv").isNotNull)
          .select(col("metric"),
            (col("ts") - pmod(col("ts"), lit(dayNs))).as("win"), col("__tv")),
        "metric", "win", "__tv", k = 64))),
    madIndexes = Seq(MadIndexDef(FromNs, ToNs,
      graft.ops.Monitoring.madIndex(
        namedRanged.select(col("name"), col("value")), "name"))),
    gapIndexes = Seq(GapIndexDef(FromNs, ToNs, 3.0,
      graft.ops.Monitoring.gapThresholdIndex(
        namedRanged.select(col("name"), col("ts")),
        factor = 3.0, keyCol = "name"))))

  private def tmp(): String =
    Files.createTempDirectory("graft_catalog_spec").toString

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def manifestLines(root: String): Seq[String] =
    Files.readAllLines(Paths.get(root, IndexCatalog.ManifestName),
      StandardCharsets.UTF_8).asScala.toSeq

  private def rewrite(root: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(root, IndexCatalog.ManifestName),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))

  test("rebuild reproduces every owned family row-for-row on an unchanged database") {
    // the canonical-recipe proof: rebuilding from the manifest params
    // alone yields the exact frames save recorded — so the recipes are
    // the constructions the engine serves from, and a rebuild after an
    // upsert is trustworthy (the staleness remedy, LayoutSpec)
    val db = tmp()
    graft.model.TsdbLayout.writeDatabase(fullCtx, db)
    val root = java.nio.file.Paths.get(db, "indexes")
    val entries = IndexCatalog.describe(root.toString)
    assert(entries.size === 6 && entries.forall(_.owned))
    val before = entries.map(e =>
      e.pos -> rowsOf(spark.read.parquet(root.resolve(e.path).toString))).toMap
    assert(IndexCatalog.rebuild(spark, db) === 6)
    entries.foreach { e =>
      assert(rowsOf(spark.read.parquet(root.resolve(e.path).toString))
          === before(e.pos),
        s"rebuilt ${e.kind} must equal the saved frame row-for-row")
    }
  }

  test("rebuild recovers a crash-destroyed frame and never touches adopted storage") {
    // crash window: mode(overwrite) deleted an index parquet and died
    // before the rewrite committed — openDatabase throws on the
    // destroyed frame, so rebuild must reach facts WITHOUT it
    // (TsdbLayout.openFacts) and the re-run IS the recovery. And an
    // ADOPTED entry's storage belongs to its maintainer: rebuild must
    // neither rewrite it nor count it.
    val db = tmp()
    val hour = hourNs
    graft.model.TsdbLayout.writeDatabase(ctx.copy(
      rollups = Seq(hour -> Rollup.build(ctx.samples, hour))), db)
    val root = java.nio.file.Paths.get(db, "indexes")
    // an adopted maintainer's sink outside the catalog dir
    val sink = tmp() + "/rollup_sink"
    Rollup.build(ctx.samples, hour).write.parquet(sink)
    IndexCatalog.adopt(root.toString, "rollup", sink, windowNs = Some(hour))
    val sinkRowsBefore = rowsOf(spark.read.parquet(sink))

    // destroy the OWNED frame (idx_0_rollup), as a mid-overwrite crash would
    val ownedPath = root.resolve(IndexCatalog.describe(root.toString)
      .find(_.owned).get.path).toString
    def rmRec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmRec)); f.delete(); ()
    }
    rmRec(new java.io.File(ownedPath))
    intercept[Exception] {
      graft.model.TsdbLayout.openDatabase(spark, db).rollups.head._2.count()
    }
    // the re-run recovers: only the owned frame rebuilds, the adopted
    // sink is byte-identical, and the database opens again
    assert(IndexCatalog.rebuild(spark, db) === 1)
    assert(rowsOf(spark.read.parquet(sink)) === sinkRowsBefore,
      "rebuild must never rewrite a maintainer's storage")
    val reopened = graft.model.TsdbLayout.openDatabase(spark, db)
    assert(reopened.rollups.size === 2)
    assert(rowsOf(reopened.rollups.head._2) ===
      rowsOf(Rollup.build(ctx.samples, hour)),
      "the recovered owned frame equals the canonical build")
  }

  test("save → load round-trips all six index families exactly") {
    val root = tmp()
    IndexCatalog.save(fullCtx, root)
    val loaded = IndexCatalog.load(spark, root, ctx)

    assert(loaded.rollups.map(_._1) === Seq(hourNs))
    assert(loaded.histograms.map(_._1) === Seq(hourNs))
    assert(loaded.bucketSums.map(_._1) === Seq(hourNs))
    assert(loaded.kmvIndexes.map(d => (d.tag, d.windowNs, d.k)) ===
      Seq(("user", dayNs, 64)))
    assert(loaded.madIndexes.map(d => (d.fromNs, d.toNs)) ===
      Seq((FromNs, ToNs)))
    // factor must survive the JSON hop BIT-exactly: gap serving matches
    // the statement factor with Double == (Engine's abstain-never-wrong
    // rule), so a lossy round-trip would silently de-register the index
    assert(loaded.gapIndexes.map(d => (d.fromNs, d.toNs, d.factor)) ===
      Seq((FromNs, ToNs, 3.0)))

    assert(rowsOf(loaded.rollups.head._2) === rowsOf(fullCtx.rollups.head._2))
    assert(rowsOf(loaded.histograms.head._2) ===
      rowsOf(fullCtx.histograms.head._2))
    assert(rowsOf(loaded.bucketSums.head._2) ===
      rowsOf(fullCtx.bucketSums.head._2))
    assert(rowsOf(loaded.kmvIndexes.head.index) ===
      rowsOf(fullCtx.kmvIndexes.head.index))
    assert(rowsOf(loaded.madIndexes.head.index) ===
      rowsOf(fullCtx.madIndexes.head.index))
    assert(rowsOf(loaded.gapIndexes.head.index) ===
      rowsOf(fullCtx.gapIndexes.head.index))
  }

  test("a LOADED registration serves statements bit-equal to the hand-wired one") {
    val root = tmp()
    IndexCatalog.save(fullCtx, root)
    val handWired = new Engine(fullCtx.copy(series = cachedCtx.series))
    // Engine construction over the loaded context re-runs the shape
    // guards on every loaded frame — this not throwing IS an assertion
    val loadedEng = new Engine(IndexCatalog.load(spark, root, cachedCtx))

    // fully-aligned group-aggregate (rollup-served, rollup-only read),
    // exact-range anomaly (mad-served), exact-(range,factor) gaps
    // (gap-served): three families exercised through serving paths
    val ga = """{"group-aggregate": {"metric": "purchase", "step": "1d",
                                     "func": ["min", "max", "cnt"]},
                 "range": {"from": "20240101T000000", "to": "20240401T000000"}}"""
    val an = """{"anomaly": {"metric": "purchase", "c": 3.0},
                 "range": {"from": "20240101T000000", "to": "20240401T000000"}}"""
    val gp = """{"gaps": {"metric": "purchase", "factor": 3.0},
                 "range": {"from": "20240101T000000", "to": "20240401T000000"}}"""
    for (q <- Seq(ga, an, gp))
      assert(rowsOf(loadedEng.execute(q)) === rowsOf(handWired.execute(q)),
        s"loaded catalog must answer exactly like hand-wired wiring for $q")

    // and the loaded indexes actually SERVE: the plans read the catalog
    // directory's parquet, and the rollup-served aggregate never touches
    // the fact table
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanPaths(df: DataFrame): Seq[String] =
      df.queryExecution.sparkPlan
        .collect { case f: FileSourceScanExec => f.metadata("Location") }
    val gaPaths = scanPaths(loadedEng.execute(ga))
    assert(gaPaths.exists(_.contains("idx_0_rollup")),
      s"aligned group-aggregate must read the loaded rollup, saw: $gaPaths")
    assert(!gaPaths.exists(_.contains("events.parquet")),
      s"rollup-served aggregate must not scan facts, saw: $gaPaths")
    assert(scanPaths(loadedEng.execute(an)).exists(_.contains("_mad")),
      "exact-range anomaly must read the loaded mad index")
    assert(scanPaths(loadedEng.execute(gp)).exists(_.contains("_gap")),
      "exact-(range,factor) gaps must read the loaded gap index")
  }

  /** Save a minimal one-rollup catalog and return its directory. */
  private def savedSmall(): String = {
    val root = tmp()
    IndexCatalog.save(ctx.copy(
      rollups = Seq(hourNs -> Rollup.build(ctx.samples, hourNs))), root)
    root
  }

  test("poisoned manifests fail loudly at load") {
    val root = savedSmall()
    val lines = manifestLines(root)

    // unknown kind
    rewrite(root, lines.map(_.replace("\"kind\":\"rollup\"", "\"kind\":\"bogus\"")))
    val e1 = intercept[IllegalArgumentException](
      IndexCatalog.load(spark, root, ctx))
    assert(e1.getMessage.contains("unknown kind"))

    // version skew
    rewrite(root, lines.map(_.replace("\"catalog_version\":1", "\"catalog_version\":7")))
    val e2 = intercept[IllegalArgumentException](
      IndexCatalog.load(spark, root, ctx))
    assert(e2.getMessage.contains("version mismatch"))

    // truncation (header declares more entries than the file holds)
    rewrite(root, lines.init)
    val e3 = intercept[IllegalArgumentException](
      IndexCatalog.load(spark, root, ctx))
    assert(e3.getMessage.contains("truncated"))

    // a line that is not JSON at all
    rewrite(root, lines.init :+ "{this is not json")
    val e4 = intercept[IllegalArgumentException](
      IndexCatalog.load(spark, root, ctx))
    assert(e4.getMessage.contains("not valid JSON"))

    // a missing required parameter
    rewrite(root, lines.map(_.replace("\"windowNs\":" + hourNs, "\"note\":1")))
    val e5 = intercept[IllegalArgumentException](
      IndexCatalog.load(spark, root, ctx))
    assert(e5.getMessage.contains("windowNs"))

    // a non-boolean 'owned' (hand-edited): lenient parsing here could
    // read "false" as owned and let retire delete a live sink
    rewrite(root, lines.map(_.replace("\"path\":\"idx_0_rollup\"",
      "\"path\":\"idx_0_rollup\",\"owned\":\"nope\"")))
    val eOwned = intercept[IllegalArgumentException](
      IndexCatalog.load(spark, root, ctx))
    assert(eOwned.getMessage.contains("non-boolean 'owned'"))

    // duplicate pos values (a hand-edited or merge-mangled manifest):
    // retire-by-pos would de-register both while reclaiming one parquet
    rewrite(root, lines.head.replace("\"entries\":1", "\"entries\":2")
      +: Seq(lines(1), lines(1)))
    val e6 = intercept[IllegalArgumentException](
      IndexCatalog.load(spark, root, ctx))
    assert(e6.getMessage.contains("duplicate pos"))

    // no manifest at all
    val e7 = intercept[IllegalArgumentException](
      IndexCatalog.load(spark, tmp(), ctx))
    assert(e7.getMessage.contains("manifest not found"))
  }

  test("describe / append / retire: the operator cycle without a redeploy") {
    val root = savedSmall()
    // describe: the ls — manifest only, no Spark
    val d0 = IndexCatalog.describe(root)
    assert(d0.map(e => (e.pos, e.kind, e.windowNs)) ===
      Seq((0, "rollup", Some(hourNs))))

    // append: a mad index joins the live catalog at the next position
    val carrier = ctx.copy(rollups = Nil, madIndexes = Seq(MadIndexDef(
      FromNs, ToNs, graft.ops.Monitoring.madIndex(
        namedRanged.select(col("name"), col("value")), "name"))))
    IndexCatalog.append(carrier, root)
    val d1 = IndexCatalog.describe(root)
    assert(d1.map(e => (e.pos, e.kind)) ===
      Seq((0, "rollup"), (1, "mad")))
    val loaded1 = IndexCatalog.load(spark, root, ctx)
    assert(loaded1.rollups.size === 1 && loaded1.madIndexes.size === 1)
    assert(loaded1.madIndexes.head.fromNs === FromNs)

    // retire: de-register the rollup; its parquet is reclaimed, the
    // mad index keeps its position (pos is identity, not list index)
    IndexCatalog.retire(root, 0)
    assert(IndexCatalog.describe(root).map(e => (e.pos, e.kind)) ===
      Seq((1, "mad")))
    assert(!Files.exists(Paths.get(root, "idx_0_rollup")),
      "a retired index's storage must be reclaimed")
    val loaded2 = IndexCatalog.load(spark, root, ctx)
    assert(loaded2.rollups.isEmpty && loaded2.madIndexes.size === 1)
    new Engine(loaded2) // guards still pass over the survivor

    // positions are IDENTITIES, never reissued: appending after the
    // retire must issue pos 2, not recycle the retired 0 — otherwise a
    // runbook's earlier retire-by-pos could silently address the new
    // index
    IndexCatalog.append(ctx.copy(rollups =
      Seq(hourNs -> Rollup.build(ctx.samples, hourNs))), root)
    assert(IndexCatalog.describe(root).map(e => (e.pos, e.kind)) ===
      Seq((1, "mad"), (2, "rollup")),
      "a retired pos must never be reissued")

    // retiring a position that does not exist fails loudly
    val e = intercept[IllegalArgumentException](IndexCatalog.retire(root, 7))
    assert(e.getMessage.contains("no entry at pos 7"))
    // appending nothing is a mistake, not a no-op
    intercept[IllegalArgumentException](
      IndexCatalog.append(ctx.copy(rollups = Nil), root))
  }

  test("adopt: externally-owned index storage registers by pointer, not copy") {
    // the stream-maintainer case: the rollup parquet lives where its
    // maintainer writes it; adopt records the ABSOLUTE path, load
    // serves from it directly, and retire de-registers WITHOUT
    // deleting storage the catalog does not own
    val data = tmp() + "/live_rollup"
    Rollup.write(ctx.samples, data, hourNs)
    val root = tmp()
    IndexCatalog.save(ctx, root) // empty catalog (no indexes) — valid
    val pos = IndexCatalog.adopt(root, "rollup", data,
      windowNs = Some(hourNs))
    val d = IndexCatalog.describe(root)
    assert(d.map(e => (e.pos, e.kind, e.windowNs, e.owned)) ===
      Seq((pos, "rollup", Some(hourNs), false)))
    val ls = Files.list(Paths.get(root))
    try assert(!ls.iterator().asScala
      .exists(_.getFileName.toString.startsWith("idx_")),
      "adopt must not copy the data into the catalog directory")
    finally ls.close()
    // serves exactly like owned registration
    val loaded = new Engine(IndexCatalog.load(spark, root, cachedCtx))
    val handWired = new Engine(cachedCtx.copy(
      rollups = Seq(hourNs -> spark.read.parquet(data))))
    val ga = """{"group-aggregate": {"metric": "purchase", "step": "1d",
                                     "func": ["min", "max", "cnt"]},
                 "range": {"from": "20240101T000000", "to": "20240401T000000"}}"""
    assert(rowsOf(loaded.execute(ga)) === rowsOf(handWired.execute(ga)))
    // retire de-registers but the maintainer's storage survives
    IndexCatalog.retire(root, pos)
    assert(IndexCatalog.describe(root).isEmpty)
    assert(Files.isDirectory(Paths.get(data)),
      "retiring an adopted entry must not delete externally-owned data")
    // parameter validation is per kind, loud
    val e = intercept[IllegalArgumentException](
      IndexCatalog.adopt(root, "gap", data, fromNs = Some(0L)))
    assert(e.getMessage.contains("toNs") && e.getMessage.contains("factor"))
    intercept[IllegalArgumentException](
      IndexCatalog.adopt(root, "rollup", tmp() + "/absent",
        windowNs = Some(hourNs)))
  }

  test("adopted entries relocate with the catalog when their storage lives under it; outside-root paths stay loud after a move") {
    // the backup/restore story this module exists for: a catalog
    // directory must move/copy as a unit. An adopted sink UNDER the
    // catalog dir records a RELATIVE path — the moved catalog still
    // serves, no stale resolution of the old location possible
    val root = tmp()
    IndexCatalog.save(ctx, root) // empty catalog
    Rollup.write(ctx.samples, s"$root/live_rollup", hourNs)
    IndexCatalog.adopt(root, "rollup", s"$root/live_rollup",
      windowNs = Some(hourNs))
    assert(IndexCatalog.describe(root).head.path === "live_rollup",
      "an in-root adopted path must be recorded relative")
    val moved = tmp() + "/relocated"
    Files.move(Paths.get(root), Paths.get(moved))
    val loaded = IndexCatalog.load(spark, moved, cachedCtx)
    assert(loaded.rollups.map(_._1) === Seq(hourNs))
    assert(rowsOf(loaded.rollups.head._2.select("series_id", "bin")) ===
      rowsOf(Rollup.build(ctx.samples, hourNs).select("series_id", "bin")),
      "the moved catalog must serve the adopted index from its new home")

    // outside-root storage cannot move with the catalog; after a move
    // (original gone) the load must FAIL on the missing path — never
    // silently resolve something stale
    val ext = tmp() + "/external_sink"
    Rollup.write(ctx.samples, ext, hourNs)
    val root2 = tmp()
    IndexCatalog.save(ctx, root2)
    IndexCatalog.adopt(root2, "rollup", ext, windowNs = Some(hourNs))
    assert(Paths.get(IndexCatalog.describe(root2).head.path).isAbsolute)
    val moved2 = tmp() + "/relocated2"
    Files.move(Paths.get(root2), Paths.get(moved2))
    // while the external sink exists, the moved catalog still serves it
    // (the sink did not move — that IS the live directory)
    assert(IndexCatalog.load(spark, moved2, cachedCtx).rollups.nonEmpty)
    val walk = Files.walk(Paths.get(ext))
    try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
      .foreach(f => Files.deleteIfExists(f))
    finally walk.close()
    intercept[Exception](IndexCatalog.load(spark, moved2, cachedCtx))
  }

  test("ownership survives a save round-trip: re-saving a loaded context re-emits adopted pointers, never frozen copies") {
    // the silent-detach hazard: load a catalog holding an adopted
    // (stream-maintained) entry, then re-persist the context. The
    // re-save must keep POINTING at the live sink — copying it would
    // freeze the index at its current content while the maintainer
    // keeps appending to a now-unreferenced directory
    val sink = tmp() + "/maintained_rollup"
    val firstHalf = ctx.samples.where(col("ts") <
      (FromNs + (ToNs - FromNs) / 2))
    Rollup.write(firstHalf, sink, hourNs)
    val rootA = tmp()
    IndexCatalog.save(ctx, rootA)
    IndexCatalog.adopt(rootA, "rollup", sink, windowNs = Some(hourNs))
    val loaded = IndexCatalog.load(spark, rootA, cachedCtx)

    // re-save the LOADED context into a fresh catalog (the
    // writeDatabase path funnels here too)
    val rootB = tmp()
    IndexCatalog.save(loaded, rootB)
    val e = IndexCatalog.describe(rootB).head
    assert(!e.owned, "re-save must preserve adopted (owned=false) status")
    assert(Paths.get(e.path).isAbsolute &&
      Paths.get(e.path).toString == Paths.get(sink).toAbsolutePath.toString,
      s"re-save must point at the live sink, got ${e.path}")
    val ls = Files.list(Paths.get(rootB))
    try assert(!ls.iterator().asScala
      .exists(_.getFileName.toString.startsWith("idx_")),
      "re-save must not copy the adopted data")
    finally ls.close()

    // the maintainer keeps appending — the RE-SAVED catalog sees it
    Rollup.build(ctx.samples.where(col("ts") >=
        (FromNs + (ToNs - FromNs) / 2)), hourNs)
      .write.mode("append").parquet(sink)
    val viaB = IndexCatalog.load(spark, rootB, cachedCtx)
    assert(viaB.rollups.head._2.count() ===
      spark.read.parquet(sink).count(),
      "the re-saved catalog must serve the sink's LIVE content")

    // a DERIVED frame is not the sink: transforming the adopted frame
    // before saving stages an owned copy (correct — the derivation is
    // new data the maintainer does not own)
    val rootC = tmp()
    IndexCatalog.save(loaded.copy(rollups = loaded.rollups.map {
      case (w, f) => (w, f.where(col("cnt") > 0)) }), rootC)
    assert(IndexCatalog.describe(rootC).head.owned,
      "a transformed frame must save as an owned copy")
  }

  test("freshness: the last committed time key per entry — the stalled-maintainer alert") {
    // an adopted stream sink serves whatever it last committed;
    // describe shows kind/path/params but not how fresh the data is.
    // freshness reads one max() per entry so an operator can alert
    // when an adopted index stops advancing
    val sink = tmp() + "/fresh_rollup"
    // mid-JANUARY: the testdata's events span Jan 1-30 only, so a
    // later split would leave the maintainer's second commit empty
    val mid = FromNs + 14L * dayNs
    Rollup.write(ctx.samples.where(col("ts") < mid), sink, hourNs)
    val root = tmp()
    // one owned snapshot family (mad: freshness = build-range end) and
    // one adopted maintained family (rollup: freshness = max bin)
    IndexCatalog.save(ctx.copy(madIndexes = Seq(MadIndexDef(FromNs, ToNs,
      graft.ops.Monitoring.madIndex(
        namedRanged.select(col("name"), col("value")), "name")))), root)
    IndexCatalog.adopt(root, "rollup", sink, windowNs = Some(hourNs))
    def byKind = IndexCatalog.freshness(spark, root)
      .map(f => f.kind -> f).toMap
    val f0 = byKind
    assert(f0("mad").lastNs === Some(ToNs),
      "snapshot kinds report their registered build-range end")
    val lastBin0 = f0("rollup").lastNs.get
    assert(lastBin0 < mid && lastBin0 >= FromNs,
      "the adopted rollup's freshness is its max committed bin")
    // the maintainer commits more — freshness advances
    Rollup.build(ctx.samples.where(col("ts") >= mid), hourNs)
      .write.mode("append").parquet(sink)
    assert(byKind("rollup").lastNs.get > lastBin0,
      "freshness must advance with the sink")
    assert(!f0("rollup").owned && f0("mad").owned)
  }

  test("writeDatabase / openDatabase: the full restart unit round-trips") {
    // one directory = catalog + events + partitioned/sorted samples
    // layout + index catalog; openDatabase reconstructs the whole
    // context from storage and the engine serves identically to the
    // hand-wired in-memory wiring — pruned scans AND index serving,
    // nothing re-derived from code
    val dbDir = tmp()
    val withRollup = ctx.copy(
      rollups = Seq(hourNs -> Rollup.build(ctx.samples, hourNs)))
    graft.model.TsdbLayout.writeDatabase(withRollup, dbDir)
    val opened = graft.model.TsdbLayout.openDatabase(spark, dbDir)
    assert(opened.rollups.map(_._1) === Seq(hourNs))
    // the one-call restart path is the same thing
    val openedEng = Engine.open(spark, dbDir)
    val handWired = new Engine(withRollup)
    val stmts = Seq(
      // fully-aligned group-aggregate: rollup-served
      """{"group-aggregate": {"metric": "purchase", "step": "1d",
                              "func": ["min", "max", "cnt"]},
          "range": {"from": "20240101T000000", "to": "20240401T000000"}}""",
      // plain select: the layout's pruned fact scan must read the same
      // rows the derived in-memory samples frame holds
      """{"select": "click",
          "range": {"from": "20240110T000000", "to": "20240112T000000"}}""")
    for (q <- stmts)
      assert(rowsOf(openedEng.execute(q)) === rowsOf(handWired.execute(q)),
        s"opened database must answer exactly like hand-wired wiring for $q")
    // RE-SAVE: a context read back from a database (facts already
    // carrying the layout keys) writes a second database without
    // ambiguous-column failures and serves identically — the
    // rotation/copy path
    val dbDir2 = tmp()
    graft.model.TsdbLayout.writeDatabase(opened, dbDir2)
    assert(rowsOf(Engine.open(spark, dbDir2).execute(stmts.head)) ===
      rowsOf(handWired.execute(stmts.head)),
      "a re-saved database must serve exactly like the original")

    // the ranged select's scan is partition-pruned: the metric and
    // ts_day predicates must reach PartitionFilters on the layout scan
    // (the layout's own pruning law — LayoutSpec proves the day-window
    // arithmetic; here we pin that an OPENED database keeps it)
    val plan = openedEng.execute(stmts(1)).queryExecution.executedPlan.toString
    // assert on the bracket CONTENT: "PartitionFilters: []" plus ts_day
    // appearing elsewhere (ReadSchema, data filters) must not pass
    assert("PartitionFilters: \\[[^\\]]*ts_day".r.findFirstIn(plan).isDefined,
      s"the opened layout scan must carry a ts_day partition filter:\n$plan")
  }

  test("missing index data and wrong-schema index data fail loudly") {
    // manifest intact but the parquet directory is gone → Spark's own
    // loud path error at load, never a silently smaller registration
    val root = savedSmall()
    def rm(p: Path): Unit = {
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
    rm(Paths.get(root, "idx_0_rollup"))
    intercept[Exception](IndexCatalog.load(spark, root, ctx))

    // data-half poisoning the manifest can't see: the recorded parquet
    // holds the WRONG frame (a mad index registered as a rollup). Load
    // succeeds — the manifest is structurally fine — and the Engine
    // constructor's existing shape guards catch it
    val root2 = tmp()
    IndexCatalog.save(ctx.copy(rollups = Seq(hourNs ->
      graft.ops.Monitoring.madIndex(
        namedRanged.select(col("name"), col("value")), "name"))), root2)
    val loaded = IndexCatalog.load(spark, root2, ctx)
    val e = intercept[IllegalArgumentException](new Engine(loaded))
    assert(e.getMessage.contains("lacks column"))
  }

  // --------------------------------------------------- scoped rebuild

  /** The canonical correction batch: purchase users 2/4 in the upsert
    * window, value + 1000 (EntryUtil's fixture) — touches exactly two
    * (purchase, ts_day) partitions. */
  private def lateBatch: DataFrame = ctx.samples
    .join(ctx.series.where(col("metric") === "purchase" &&
        element_at(col("tags"), "user").isin("2", "4"))
      .select("series_id"), "series_id")
    .where(col("ts") >= graft.entries.EntryUtil.UpsertLoNs &&
      col("ts") < graft.entries.EntryUtil.UpsertHiNs)
    .select(col("series_id"), col("ts"), (col("value") + 1000.0).as("value"))

  private val upsertDays = Seq(
    Math.floorDiv(graft.entries.EntryUtil.UpsertLoNs, dayNs),
    Math.floorDiv(graft.entries.EntryUtil.UpsertLoNs, dayNs) + 1)

  test("rebuildScoped == full rebuild bit-for-bit; only touched day partitions rewrite") {
    // twin databases with every family registered, the same correction
    // upserted into both: the scoped form (driven by the upsert-touched
    // record) must yield byte-identical index content to the full
    // re-derivation — the merge-by-addition law the ladders pin, here
    // applied as kept-bins ∪ recomputed-bins — while leaving every
    // UNTOUCHED __day partition's files physically untouched (the
    // dynamic-overwrite pin; at 100 TB this is the difference between
    // a day-sized correction and six full-history scans)
    val dbScoped = tmp(); val dbFull = tmp()
    for (db <- Seq(dbScoped, dbFull)) {
      graft.model.TsdbLayout.writeDatabase(fullCtx, db)
      assert(graft.model.TsdbLayout.upsertSamples(spark, s"$db/samples",
        lateBatch, ctx.series) === 2)
    }
    // the upsert RECORDED its touched partitions beside the layout
    assert(graft.model.TsdbLayout.indexDirtyPairs(spark, dbScoped).toSet
      === upsertDays.map(("purchase", _)).toSet)
    // snapshot the rollup's untouched partition files (day of FromNs is
    // nine days before the upsert window)
    val rollDir = Paths.get(dbScoped, "indexes", "idx_0_rollup")
    val untouchedPart = rollDir.resolve(s"__day=${Math.floorDiv(FromNs, dayNs)}")
    def partFiles(p: Path): Set[(String, Long)] = {
      val walk = Files.walk(p)
      try walk.iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => (f.toString, Files.size(f))).toSet
      finally walk.close()
    }
    assert(Files.isDirectory(untouchedPart),
      "owned binned storage must be __day-partitioned")
    val before = partFiles(untouchedPart)
    // scoped (record-driven) on one twin, full on the other
    assert(IndexCatalog.rebuildScoped(spark, dbScoped) === 6)
    assert(graft.model.TsdbLayout.indexDirtyPairs(spark, dbScoped).isEmpty,
      "a successful scoped rebuild clears the pairs it served")
    assert(IndexCatalog.rebuild(spark, dbFull) === 6)
    val root = Paths.get(dbScoped, "indexes")
    IndexCatalog.describe(root.toString).foreach { e =>
      assert(rowsOf(spark.read.parquet(root.resolve(e.path).toString))
          === rowsOf(spark.read.parquet(
            Paths.get(dbFull, "indexes").resolve(e.path).toString)),
        s"scoped ${e.kind} must equal the full rebuild bit-for-bit")
    }
    assert(partFiles(untouchedPart) === before,
      "untouched day partitions must not be rewritten by the scoped form")
    // and the scoped result serves: the reopened database's rollup
    // equals the canonical build over the corrected facts
    val reopened = graft.model.TsdbLayout.openDatabase(spark, dbScoped)
    assert(rowsOf(reopened.rollups.head._2) ===
      rowsOf(Rollup.build(reopened.samples.select("series_id", "ts", "value"),
        hourNs)))
  }

  test("non-canonical owned entries refuse rebuilds by default, skip on request") {
    val db = tmp()
    graft.model.TsdbLayout.writeDatabase(ctx.copy(
      rollups = Seq(hourNs -> Rollup.build(ctx.samples, hourNs)),
      histograms = Seq(hourNs -> graft.ops.HistQuantiles.histogram(
        ctx.samples.withColumn("win",
          col("ts") - pmod(col("ts"), lit(hourNs))),
        Seq("series_id", "win")))), db)
    val root = Paths.get(db, "indexes").toString
    // an operator declares the ROLLUP was built over filtered facts
    IndexCatalog.markNoncanonical(root, 0)
    assert(IndexCatalog.describe(root).map(e => e.pos -> e.canonical).toMap
      === Map(0 -> false, 1 -> true))
    // the flag survives the manifest round-trip strictly (boolean only)
    val marked = rowsOf(spark.read.parquet(
      Paths.get(root).resolve("idx_0_rollup").toString))
    val err = intercept[IllegalArgumentException](
      IndexCatalog.rebuild(spark, db))
    assert(err.getMessage.contains("non-canonical"))
    intercept[IllegalArgumentException](IndexCatalog.rebuildScoped(
      spark, db, Some(upsertDays.map(("purchase", _)))))
    // skipNoncanonical rebuilds the others, leaves the marked frame be
    assert(IndexCatalog.rebuild(spark, db, skipNoncanonical = true) === 1)
    assert(rowsOf(spark.read.parquet(
        Paths.get(root).resolve("idx_0_rollup").toString)) === marked,
      "a skipped non-canonical frame must stay byte-identical")
    // unknown pos fails loudly, like retire
    intercept[IllegalArgumentException](IndexCatalog.markNoncanonical(root, 9))
  }

  test("rebuildScoped upgrades a flat legacy owned index in one pass") {
    // a catalog written before day-partitioned owned storage holds a
    // FLAT rollup parquet: the scoped rebuild must still serve the
    // correction (falling back to one index-sized rewrite with the
    // day-pruned fact read) and leave the storage partitioned for the
    // next correction
    val db = tmp()
    graft.model.TsdbLayout.writeDatabase(ctx.copy(
      rollups = Seq(hourNs -> Rollup.build(ctx.samples, hourNs))), db)
    val p = Paths.get(db, "indexes", "idx_0_rollup").toString
    val flat = spark.read.parquet(p).drop("__day").localCheckpoint()
    flat.write.mode("overwrite").parquet(p)
    assert(!Files.list(Paths.get(p)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("__day=")))
    assert(graft.model.TsdbLayout.upsertSamples(spark, s"$db/samples",
      lateBatch, ctx.series) === 2)
    assert(IndexCatalog.rebuildScoped(spark, db) === 1)
    assert(Files.list(Paths.get(p)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("__day=")),
      "the flat legacy storage must come out day-partitioned")
    val reopened = graft.model.TsdbLayout.openDatabase(spark, db)
    assert(rowsOf(reopened.rollups.head._2) ===
      rowsOf(Rollup.build(reopened.samples.select("series_id", "ts", "value"),
        hourNs)))
  }

  test("snapshot families (mad/gap) scoped-rebuild whole iff touched") {
    // no additive law for a median: a touched day inside the build
    // range re-derives the whole frame; a touch entirely outside it is
    // a SKIP — storage byte-identical, not counted
    val db = tmp()
    graft.model.TsdbLayout.writeDatabase(ctx.copy(
      madIndexes = fullCtx.madIndexes, gapIndexes = fullCtx.gapIndexes), db)
    val root = Paths.get(db, "indexes")
    def allFiles(): Set[(String, Long)] = {
      val walk = Files.walk(root)
      try walk.iterator().asScala.filter(Files.isRegularFile(_))
        .filterNot(_.getFileName.toString == IndexCatalog.ManifestName)
        .map(f => (f.toString, Files.size(f))).toSet
      finally walk.close()
    }
    val before = allFiles()
    val outsideDay = Math.floorDiv(FromNs, dayNs) - 30
    assert(IndexCatalog.rebuildScoped(spark, db,
      Some(Seq(("purchase", outsideDay)))) === 0)
    assert(allFiles() === before,
      "a touch outside the snapshot ranges must rewrite nothing")
    assert(IndexCatalog.rebuildScoped(spark, db,
      Some(upsertDays.map(("purchase", _)))) === 2,
      "a touch inside the build range re-derives both snapshot frames")
  }

  test("catalog IO is filesystem-generic: a scheme-qualified (file:) catalog round-trips whole") {
    // all catalog IO goes through the path's Hadoop FileSystem (the
    // round-11 tier-metadata rule extended to the index half): save /
    // describe / adopt / markNoncanonical / retire / load / rebuild
    // against an explicit file: URI must behave exactly like a plain
    // local path — the proof a database on HDFS/S3A keeps its index
    // registration instead of silently losing it to java.nio
    val local = tmp()
    val root = s"file:$local/indexes"
    val db = s"file:$local"
    graft.model.TsdbLayout.writeDatabase(ctx.copy(
      rollups = Seq(hourNs -> Rollup.build(ctx.samples, hourNs))), db)
    assert(IndexCatalog.describe(root).map(_.kind) === Seq("rollup"))
    // adopt by qualified URI: the pointer records RELATIVE (under the
    // catalog dir) and resolves back
    Rollup.build(ctx.samples, dayNs).write.parquet(s"$root/day_sink")
    val pos = IndexCatalog.adopt(root, "rollup", s"$root/day_sink",
      windowNs = Some(dayNs))
    val adopted = IndexCatalog.describe(root).find(_.pos == pos).get
    assert(!adopted.owned && adopted.path === "day_sink",
      s"an under-root qualified sink records relative: ${adopted.path}")
    // the full lifecycle over the URI: mark, refuse, unmark via
    // re-registration order is not needed — rebuild skips the adopted
    // entry and re-derives the owned one
    assert(IndexCatalog.rebuild(spark, db) === 1)
    val loaded = graft.model.TsdbLayout.openDatabase(spark, db)
    assert(loaded.rollups.map(_._1).sorted === Seq(hourNs, dayNs))
    assert(rowsOf(loaded.rollups.find(_._1 == hourNs).get._2) ===
      rowsOf(Rollup.build(loaded.samples.select("series_id", "ts", "value"),
        hourNs)))
    // retire the owned entry through the URI: storage reclaimed
    IndexCatalog.retire(root, 0)
    assert(IndexCatalog.describe(root).map(_.pos) === Seq(pos))
    assert(!Files.exists(Paths.get(local, "indexes", "idx_0_rollup")),
      "retire must reclaim owned storage through the qualified path")
  }

  test("a touched pair matching no index rows is a no-op, never a wipe") {
    // a bogus (metric, day) — unknown metric, or a day with no data —
    // must leave partitioned owned storage byte-identical: the empty
    // scoped slice may not degrade into a whole-index overwrite
    val db = tmp()
    graft.model.TsdbLayout.writeDatabase(ctx.copy(
      rollups = Seq(hourNs -> Rollup.build(ctx.samples, hourNs))), db)
    val idx = Paths.get(db, "indexes", "idx_0_rollup")
    def files(): Set[(String, Long)] = {
      val walk = Files.walk(idx)
      try walk.iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => (f.toString, Files.size(f))).toSet
      finally walk.close()
    }
    val before = files()
    assert(IndexCatalog.rebuildScoped(spark, db,
      Some(Seq(("no_such_metric", Math.floorDiv(FromNs, dayNs))))) === 0)
    assert(IndexCatalog.rebuildScoped(spark, db,
      Some(Seq(("purchase", Math.floorDiv(FromNs, dayNs) - 400)))) === 0)
    assert(files() === before,
      "empty scoped slices must rewrite nothing")
    assert(graft.model.TsdbLayout.openDatabase(spark, db)
      .rollups.head._2.count() > 0)
  }
}
