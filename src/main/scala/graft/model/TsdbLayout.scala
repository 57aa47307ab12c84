package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout of the samples fact table at scale.
  *
  * The reference's NB+tree gives it (a) per-series clustering, (b) time-
  * ordered blocks, (c) per-block min/max stats for pruning
  * (stdb/storage/nbtree_def.h:47-84). The Parquet equivalent written here:
  *
  *   - directory partitioning by `metric` and a coarse time bucket
  *     (`ts_day`) → Catalyst partition pruning eliminates whole
  *     directories for metric + range predicates before any I/O;
  *   - files sorted by (series_id, ts) within each partition → parquet
  *     row-group min/max stats on both columns make row-group pruning
  *     effective for narrow `where` clauses, and per-series windows read
  *     nearly-clustered data.
  *
  * At 100 TB this is the difference between scanning everything and
  * touching only the (metric, day) directories a query ranges over — the
  * same two-level pruning the reference does with its inverted index +
  * SubtreeRef stats.
  */
object TsdbLayout {

  private val NsPerDay = graft.time.TimeUtil.NsPerDay

  /** Write `ctx.samples` (joined to its catalog for the metric key) as a
    * partitioned, sorted Parquet dataset under `path`. A frame that
    * already carries the layout keys (one read back from a layout —
    * the re-save/rotation case) skips the derivation instead of
    * producing ambiguous columns. Rows whose series_id is not in the
    * catalog are dropped: the catalog is the registration authority
    * (registration-on-write derives it FROM the data, so uncataloged
    * facts cannot arise in the supported flow) — register before
    * persisting. */
  def writeSamples(ctx: TsdbContext, path: String,
      filesPerPartition: Int = 1): Unit =
    sortedPartitionWrite(keyed(ctx.samples, ctx.series), path,
      replaceOnlyWritten = false)

  /** Join facts to the broadcast catalog for the metric key and derive
    * the exact-floor ts_day — or pass a frame through untouched when it
    * already carries both layout keys. */
  private def keyed(facts: DataFrame, series: DataFrame): DataFrame =
    if (facts.columns.contains("metric") && facts.columns.contains("ts_day"))
      facts
    else facts
      .join(broadcast(series.select(col("series_id"), col("metric"))),
        "series_id")
      // exact Long FLOOR division: `/` on Long columns is double division
      // (misassigns samples within ~128 ns of midnight past 2^53), and
      // truncating division numbers pre-epoch days differently from the
      // Math.floorDiv bounds in Engine.tsDayPruned — either desync makes
      // pruning wrongly skip a directory at a range boundary
      .withColumn("ts_day",
        graft.functions.VectorExpressions.longFloorDiv(col("ts"), NsPerDay))

  /** Read a layout written by [[writeSamples]]: (series_id, ts, value,
    * metric, ts_day) with metric/ts_day as partition columns — predicates
    * on them prune directories, never touching file contents. */
  def readSamples(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Merge late or corrected samples into a written layout, rewriting
    * ONLY the (metric, ts_day) partition directories the late data
    * touches — the TSDB's answer to out-of-order arrival after the
    * initial load (the reference replays its WAL into the tree; the
    * Parquet counterpart is a partition-scoped rewrite, never a table
    * rewrite). Rule: one row per (series_id, ts), latest upsert wins
    * over what's on disk.
    *
    * Mechanics, in 100 TB terms:
    *   1. the affected (metric, day) set comes off the late batch — a
    *      metadata-sized driver list (late batches touch hours-to-days,
    *      not history);
    *   2. the existing read is partition-pruned to exactly that set, so
    *      the rewrite's input is the affected slice, not the table;
    *   3. the merged slice materializes via localCheckpoint before the
    *      write — bounded by the slice, and it severs the file-source
    *      lineage so Spark permits (and the commit can't corrupt) the
    *      overwrite of directories that were just read;
    *   4. dynamic partition overwrite replaces only directories the
    *      merged frame actually writes — untouched partitions' files are
    *      never opened, rewritten, or dropped (spec-pinned by file
    *      listing).
    *
    * `late` carries (series_id, ts, value); metric resolves from the
    * broadcast catalog exactly as in [[writeSamples]], and files stay
    * (series_id, ts)-sorted within partitions. Only keys the late batch
    * NAMES are replaced — pre-existing duplicate-ts rows on other keys
    * survive the rewrite untouched (a whole-slice dedup would silently
    * collapse them). Duplicate keys inside one late batch resolve by max
    * value (deterministic; pre-aggregate the batch for another policy).
    *
    * @return number of partition directories rewritten. */
  def upsertSamples(spark: SparkSession, path: String, late: DataFrame,
      series: DataFrame): Int = {
    val lateKeyed = late
      .join(broadcast(series.select(col("series_id"), col("metric"))),
        "series_id")
      .withColumn("ts_day",
        graft.functions.VectorExpressions.longFloorDiv(col("ts"), NsPerDay))
      .select(SampleCols.map(col): _*)
    val affected = lateKeyed.select("metric", "ts_day").distinct()
      .collect().map(r => (r.getString(0), r.getAs[Number](1).longValue))
    if (affected.isEmpty) return 0
    // two-tier boundary: in a database with a live ingest tier, a day
    // at or above the compaction watermark is L0-OWNED — an upsert
    // into it would double-read immediately (the reader unions both
    // tiers for that day) and brick the next compactL0's exclusivity
    // check. Correct such days after compaction claims them. Before
    // the FIRST compaction no watermark exists and ">= Long.MinValue"
    // would refuse every day, including purely batch-owned history L0
    // will never hold — so in that window the guard checks the days
    // the L0 tier ACTUALLY shows rows for (all of L0 is
    // reader-visible then, so those and only those would double-read).
    val parent = new java.io.File(path).getParentFile
    if (parent != null && new java.io.File(parent, "samples_l0").exists()) {
      val db = parent.toString
      val hasWm = java.nio.file.Files.isRegularFile(
        java.nio.file.Paths.get(db, "l0_watermark"))
      val owned: Seq[(String, Long)] =
        if (hasWm) {
          val wm = l0Watermark(db)
          affected.filter(_._2 >= wm).toSeq
        } else readL0(spark, db) match {
          case Some(l0) => l0.where(dayPred(affected))
            .select("metric", "ts_day").distinct().collect()
            .map(r => (r.getString(0), r.getAs[Number](1).longValue)).toSeq
          case None => Nil
        }
      require(owned.isEmpty,
        s"upsertSamples: day(s) ${owned.map(_._2).distinct.mkString(", ")} " +
          s"are still owned by the live ingest tier — correct them " +
          s"after compactL0 claims the day")
    }
    val existing = readSamples(spark, path).where(dayPred(affected))
      .select(SampleCols.map(col): _*)
    // replace ONLY keys the late batch names: an anti-join (late keys
    // broadcast — the batch is small by definition) keeps every other
    // on-disk row byte-for-byte, INCLUDING pre-existing duplicate-ts
    // rows a whole-slice dedup would silently collapse. Duplicates
    // inside the late batch itself resolve by max value.
    val lateDedup = lateKeyed
      .groupBy("series_id", "ts", "metric", "ts_day")
      .agg(max(col("value")).as("value"))
      .select(SampleCols.map(col): _*)
    val merged = existing
      .join(broadcast(lateDedup.select("series_id", "ts").distinct()),
        Seq("series_id", "ts"), "left_anti")
      .unionByName(lateDedup)
      .localCheckpoint()
    sortedPartitionWrite(merged, path, replaceOnlyWritten = true)
    affected.length
  }

  /** Write `ctx.events` (joined to its catalog for the metric key) the
    * same way [[writeSamples]] lays out the metric facts: partitioned
    * by (metric, ts_day), (series_id, ts)-sorted within files. Event
    * streams are the LOG half of the model — at 100 TB usually the
    * bulkier half — and get the identical two-level pruning: a
    * select-events over one event metric and a few days touches only
    * those directories ([[graft.engine.Engine.selectEvents]] pushes
    * both predicates when the columns are present). Same already-keyed
    * pass-through and uncataloged-rows contract as [[writeSamples]]. */
  def writeEvents(ctx: TsdbContext, path: String): Unit =
    sortedPartitionWrite(keyed(ctx.events, ctx.series), path,
      replaceOnlyWritten = false)

  /** The canonical laid-out samples column set. */
  private val SampleCols = Seq("series_id", "ts", "value", "metric", "ts_day")

  /** (metric, ts_day) membership predicate over a collected day list —
    * the partition-pruning shape every slice-scoped rewrite/read here
    * shares. */
  private def dayPred(affected: Seq[(String, Long)]): Column =
    affected
      .map { case (m, d) => col("metric") === m && col("ts_day") === d }
      .reduce(_ || _)

  /** The layout's ONE partitioned-write protocol: repartition to one
    * task per (metric, day), restore the within-file (series_id, ts)
    * sort, overwrite. `replaceOnlyWritten = true` scopes the overwrite
    * to the directories the frame writes (the [[upsertSamples]]/
    * [[compactL0]] slice rewrites); false replaces the whole dataset
    * (the full [[writeSamples]]/[[writeEvents]] loads). One helper so
    * the sort key and overwrite mode can never drift between callers. */
  private def sortedPartitionWrite(df: DataFrame, path: String,
      replaceOnlyWritten: Boolean): Unit = {
    def write(): Unit = df
      .repartition(col("metric"), col("ts_day"))
      .sortWithinPartitions(col("metric"), col("ts_day"), col("series_id"), col("ts"))
      .write.partitionBy("metric", "ts_day").mode("overwrite").parquet(path)
    if (!replaceOnlyWritten) write()
    else {
      val spark = df.sparkSession
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.get(key, "static")
      spark.conf.set(key, "dynamic")
      try write() finally spark.conf.set(key, prev)
    }
  }

  /** Time-based retention: drop every `ts_day` partition directory older
    * than `cutoffNs`. Deleting whole directories is the point of the
    * layout — expiry is a metadata operation (no file is opened, no data
    * rewritten), the Parquet counterpart of the reference dropping aged
    * volumes. Returns the number of partition directories removed.
    * (Local-filesystem walk; an object-store deployment performs the same
    * directory drop through its own FileSystem API.) */
  def expire(path: String, cutoffNs: Long): Int = {
    val cutoffDay = Math.floorDiv(cutoffNs, NsPerDay)
    val root = new java.io.File(path)
    val metricDirs = Option(root.listFiles())
      .getOrElse(Array.empty).filter(f => f.isDirectory && f.getName.startsWith("metric="))
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete()
    }
    metricDirs.flatMap { md =>
      Option(md.listFiles()).getOrElse(Array.empty).filter { d =>
        d.isDirectory && d.getName.startsWith("ts_day=") &&
          d.getName.stripPrefix("ts_day=").toLongOption.exists(_ < cutoffDay)
      }
    }.map { d => deleteRec(d); 1 }.sum
  }

  /** Write a DataFrame as a bucketed + sorted table on `series_id`: joins
    * and aggregations keyed on series then read co-located buckets and
    * plan with NO exchange — the Spark analog of the reference keeping
    * all of one series' data in one tree. Registered in the session
    * catalog (external, at `path`); both sides of a join must share the
    * bucket count for the shuffle to vanish. */
  def writeBucketedBySeries(df: DataFrame, table: String, path: String,
      buckets: Int = 32): Unit =
    df.write
      .option("path", path)
      .bucketBy(buckets, "series_id")
      .sortBy("series_id", "ts")
      .mode("overwrite")
      .saveAsTable(table)

  /** Write the fact table pre-joined with its alignment key (`tagkey` =
    * the canonical sorted tag suffix) and bucketed on it. Join-kind
    * queries align metrics by `groupBy(tagkey, ts)` — the engine's one
    * unavoidable shuffle on a plain layout; over this table the grouping
    * reads co-located buckets and plans with NO hash exchange, moving
    * that shuffle to write time (paid once, amortized over every join
    * query). The engine uses the table's own `tagkey` column whenever
    * `ctx.samples` carries one. */
  def writeBucketedByTagkey(ctx: TsdbContext, table: String, path: String,
      buckets: Int = 32): Unit = {
    val tagkey = array_join(
      transform(array_sort(map_entries(col("tags"))),
        e => concat_ws("=", e.getField("key"), e.getField("value"))),
      " ")
    val keyed = ctx.samples.join(
      broadcast(ctx.series.select(col("series_id"), col("metric"),
        tagkey.as("tagkey"))),
      "series_id")
    keyed.select("series_id", "ts", "value", "metric", "tagkey")
      .write
      .option("path", path)
      .bucketBy(buckets, "tagkey")
      .sortBy("tagkey", "ts")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** A TsdbContext whose fact scan goes through the partitioned layout.
    * The `metric` partition column stays on the samples DF: Engine scans
    * join on series_id only, and Catalyst prunes partitions when the
    * resolved id set narrows to specific metrics. */
  def contextOver(spark: SparkSession, path: String, series: DataFrame,
      events: DataFrame): TsdbContext =
    TsdbContext(spark, series,
      readSamples(spark, path).select("series_id", "ts", "value", "metric", "ts_day"),
      events)

  /** Persist a context as a complete, self-describing DATABASE
    * directory: the series catalog and events as parquet, the samples
    * through the partitioned + sorted layout ([[writeSamples]]), and
    * every registered index through the persisted catalog
    * ([[IndexCatalog.save]]) — the reference's full restart unit
    * (volumes + sqlite metastorage, meta_storage.h:44+) as one
    * directory tree. [[openDatabase]] round-trips it: a restarted
    * deployment serves pruned scans AND index-served statements with
    * ZERO re-derivation from code. */
  def writeDatabase(ctx: TsdbContext, dir: String): Unit = {
    ctx.series.write.mode("overwrite").parquet(s"$dir/series")
    // events get the partitioned layout too (the log half is usually
    // the bulkier one); an EMPTY events frame writes flat — a
    // zero-row partitionBy write produces no readable footer at all
    if (ctx.events.isEmpty)
      ctx.events.write.mode("overwrite").parquet(s"$dir/events")
    else writeEvents(ctx, s"$dir/events")
    writeSamples(ctx, s"$dir/samples")
    IndexCatalog.save(ctx, s"$dir/indexes")
  }

  /** Open a [[writeDatabase]] directory: catalog + events from their
    * parquet, samples through the layout reader (metric/ts_day pruning
    * live), indexes re-registered from the persisted manifest. Build
    * an Engine over the result to re-run the registration shape
    * guards. All frames are lazy — opening is a driver-side metadata
    * operation at any volume.
    *
    * If the database has a live ingest tier (`samples_l0`, fed by
    * [[graft.streaming.TsdbStream.layoutIngest]]), the fact frame is
    * the UNION of the compacted batch layout and the L0 days the
    * compaction watermark has not claimed yet ([[compactL0]]) — both
    * sides keep their own partition pruning, so a range query reads
    * each day from exactly one tier. */
  def openDatabase(spark: SparkSession, dir: String): TsdbContext = {
    val series = spark.read.parquet(s"$dir/series")
    val events = spark.read.parquet(s"$dir/events")
    val cols = Seq("series_id", "ts", "value", "metric", "ts_day")
    val batch = readSamples(spark, s"$dir/samples")
      .select(cols.map(col): _*)
    val samples = readL0(spark, dir) match {
      case Some(l0) => batch.unionByName(
        l0.select(cols.map(col): _*)
          .where(col("ts_day") >= l0Watermark(dir)))
      case None => batch
    }
    IndexCatalog.load(spark, s"$dir/indexes",
      TsdbContext(spark, series, samples, events))
  }

  /** The L0 ingest tier's frame, or None when the tier is absent or
    * has no COMMITTED data yet — a freshly-started [[graft.streaming
    * .TsdbStream.layoutIngest]] creates the sink's `_spark_metadata`
    * log before the first batch commits, and a reader opening the
    * database in that window must see the batch tier, not an
    * "unable to infer schema" failure. Only the empty-sink condition
    * is swallowed; any other read problem stays loud. */
  private def readL0(spark: SparkSession, dir: String): Option[DataFrame] = {
    val path = s"$dir/samples_l0"
    if (!new java.io.File(path).exists()) return None
    try Some(readSamples(spark, path))
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("Unable to infer schema") => None
    }
  }

  /** Below-watermark L0 content the batch tier does NOT hold —
    * (metric, ts_day, n), one row per affected partition. Compacted
    * days leave their files in the L0 root (the sink log pins them),
    * so "below the watermark" alone is residue, not a problem; a
    * PROBLEM row is one whose (series_id, ts, value) never reached the
    * batch tier: a late arrival routed through the stream instead of
    * [[upsertSamples]] (which [[openDatabase]] deliberately excludes —
    * its day is batch-owned), or an L0 copy a later correction
    * superseded. This is the alert a deployment polls; routing a
    * reported row through [[upsertSamples]] clears it. Exact-duplicate
    * multiplicities are not distinguished (an alert, not an audit).
    *
    * Scale shape: the below-watermark day set is collected first
    * (driver-sized — bounded by this sink root's compacted span,
    * which rotation keeps epoch-sized) and the batch read is pruned
    * to exactly those days before the anti-join; never a full-history
    * scan. Empty frame when the tier is absent or nothing straggles. */
  def l0Stragglers(spark: SparkSession, dir: String): DataFrame = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("metric",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("ts_day",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))))
    readL0(spark, dir) match {
      case Some(l0) =>
        val below = l0.select(SampleCols.map(col): _*)
          .where(col("ts_day") < l0Watermark(dir))
        val days = below.select("metric", "ts_day").distinct()
          .collect().map(r => (r.getString(0), r.getAs[Number](1).longValue))
        if (days.isEmpty) return empty
        below.join(
            readSamples(spark, s"$dir/samples").where(dayPred(days))
              .select(SampleCols.map(col): _*),
            Seq("series_id", "ts", "value", "metric"), "left_anti")
          // partition-inferred ts_day reads as Int; pin the Long the
          // empty branch declares so pollers can append/union frames
          // across calls without a schema-merge surprise
          .groupBy(col("metric"), col("ts_day").cast("long").as("ts_day"))
          .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"))
      case None => empty
    }
  }

  /** First ts_day still owned by the L0 ingest tier (everything below
    * it has been [[compactL0]]-moved into the batch layout);
    * Long.MinValue when no compaction has run. */
  def l0Watermark(dir: String): Long = {
    val f = java.nio.file.Paths.get(dir, "l0_watermark")
    if (java.nio.file.Files.isRegularFile(f))
      new String(java.nio.file.Files.readAllBytes(f)).trim.toLong
    else Long.MinValue
  }

  private def writeL0Watermark(dir: String, day: Long): Unit = {
    val tmp = java.nio.file.Paths.get(dir, "l0_watermark.tmp")
    java.nio.file.Files.write(tmp, day.toString.getBytes)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, "l0_watermark"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** L0 → batch compaction: MOVE every settled ingest day (ts_day in
    * [watermark, cutoff)) from the stream-sink tier into the batch
    * layout, rewritten (series_id, ts)-sorted one file per partition —
    * restoring the row-group-stat tightness [[graft.streaming
    * .TsdbStream.layoutIngest]]'s unsorted micro-batch appends give up
    * (the LSM L0→L1 rule). Readers flip tiers through the watermark:
    * [[openDatabase]] serves compacted days from the batch layout and
    * newer days from L0, so answers never change — compaction reorders
    * bytes, never rows' visibility.
    *
    * Day exclusivity is REQUIRED and checked: the batch layout must
    * hold no rows in the days being claimed (normal operation — the
    * batch load ends before ingest begins), with ONE tolerated
    * exception: when the claimed days' batch content already EQUALS
    * the settled L0 slice (verified multiset-exactly, pruned to those
    * days), the run recognizes a prior overwrite that committed
    * without its watermark — the crash window — and recovers by
    * advancing the watermark alone. Anything else fails loudly rather
    * than double-writing a day. A crash between overwrite-commit and
    * watermark-advance therefore double-reads the slice only until
    * compactL0 re-runs; the re-run IS the recovery.
    *
    * Physical reclamation of compacted L0 files rides the sink's own
    * lifecycle: the file-sink transaction log pins them, so a
    * deployment rotates ingest roots (new sink dir + checkpoint per
    * epoch) and drops fully-compacted old roots whole — the watermark
    * already guarantees readers never look at them.
    *
    * LATE DATA below the watermark must go through [[upsertSamples]],
    * not the ingest stream: a stream row landing in a claimed day is
    * excluded by the reader (its day is batch-owned). Poll
    * [[l0Stragglers]] to catch and re-route any that slipped through
    * (spec-pinned end to end in StreamingSpec).
    *
    * @return number of (metric, day) partitions moved. */
  def compactL0(spark: SparkSession, dir: String, cutoffNs: Long): Int = {
    val cutoffDay = Math.floorDiv(cutoffNs, NsPerDay)
    val wm = l0Watermark(dir)
    if (cutoffDay <= wm) return 0
    val l0 = readL0(spark, dir) match {
      case Some(f) => f
      case None => writeL0Watermark(dir, cutoffDay); return 0
    }
    val settled = l0
      .select(SampleCols.map(col): _*)
      .where(col("ts_day") >= wm && col("ts_day") < cutoffDay)
    // ts_day is a directory-inferred partition column (IntegerType on
    // read, LongType when carried through a write) — accept either
    val affected = settled.select("metric", "ts_day").distinct()
      .collect().map(r => (r.getString(0), r.getAs[Number](1).longValue))
    if (affected.isEmpty) { writeL0Watermark(dir, cutoffDay); return 0 }
    val alreadyThere = readSamples(spark, s"$dir/samples")
      .where(dayPred(affected)).select(SampleCols.map(col): _*)
    // PER-DAY split so recovery composes with a LATER cutoff (cutoffs
    // track wall clock; a re-run after a crash rarely replays the
    // crashed run's exact cutoff): days the batch already holds must
    // multiset-equal their settled slice — the recognized crash state,
    // nothing to rewrite — while days absent from the batch are the
    // new work. Any content mismatch on an occupied day stays loud.
    // One action decides equality (both exceptAll sides pruned to the
    // occupied days).
    val occupiedDays = alreadyThere.select("metric", "ts_day").distinct()
      .collect().map(r => (r.getString(0), r.getAs[Number](1).longValue))
      .toSet
    if (occupiedDays.nonEmpty) {
      val settledOccupied = settled.where(dayPred(occupiedDays.toSeq))
      val equal = alreadyThere.exceptAll(settledOccupied)
        .union(settledOccupied.exceptAll(alreadyThere)).isEmpty
      require(equal,
        s"compactL0: batch layout already holds rows in claimed day(s) " +
          s"(${occupiedDays.take(5).mkString(", ")}…) that do not " +
          s"match the settled L0 slice — day ownership must be " +
          s"exclusive between tiers")
    }
    val toWrite = affected.filterNot(occupiedDays)
    if (toWrite.nonEmpty)
      sortedPartitionWrite(settled.where(dayPred(toWrite)),
        s"$dir/samples", replaceOnlyWritten = true)
    writeL0Watermark(dir, cutoffDay)
    affected.length
  }
}
