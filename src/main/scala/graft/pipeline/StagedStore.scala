package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE staged record-before-mutate protocol both lifecycle stores
  * share ([[CorpusStore]], [[EmbeddingStore]]) — extracted so a fix to
  * the publish or ordering rules can never apply to one store and
  * silently miss the other (the round-13 staging-order bug had to be
  * reasoned about per store; this is the structural remedy):
  *
  *   - [[stage]] publishes a record by parquet-writing INTO a temp
  *     name and then ONE atomic-enough directory rename — a heal never
  *     sees a half-staged record, and [[sweepTmp]] reclaims the crash
  *     leftovers (a `.tmp_` directory was never visible, so deleting
  *     it loses nothing: the caller's stage() failed and they retry);
  *   - records carry a monotonic STAGING SEQUENCE in their name
  *     ([[nextSeq]]) and [[healStaged]] applies them in that order —
  *     the parsed number, never the directory name (names sort `p_*`
  *     before `t_*` regardless of sequence);
  *   - an apply callback may REFUSE a record (return false): it stays
  *     staged as a standing pending alert and LATER intents still
  *     apply — never a mid-heal throw that blocks everything behind it
  *     (the round-13 would-empty crash-loop).
  */
private[pipeline] object StagedStore {

  val PendingSub = "pending"

  /** Target bytes per output file of a store write —
    * `spark.graft.write.targetFileBytes`, default 128 MB (guide §6's
    * output-file band). A deployment writing 100 TB epochs raises it
    * toward 1 GB; the local default keeps bench writes one file. */
  private def targetFileBytes(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.write.targetFileBytes")
      .flatMap(_.toLongOption).filter(_ > 0).getOrElse(128L << 20)

  /** Right-size a batch/index-sized frame for a parquet write: coalesce
    * to ceil(estimated bytes / target), so a KB-sized index/stats write
    * lands as ONE file instead of fanning one near-empty file per input
    * partition (the local[32] small-file storm: every store mutation
    * paid listing+footer overhead on ~32 files per partition
    * directory). Scale-adaptive, never a constant: the estimate is the
    * optimizer's plan statistic, the target is configured, and an
    * unknown/huge estimate (e.g. a checkpoint-backed plan with default
    * stats — pass `sizeFrom` with the pre-checkpoint plan instead)
    * leaves the frame untouched rather than forcing a corpus-sized
    * write through few tasks. `coalesce` only narrows the final stage:
    * upstream exchanges keep their parallelism. */
  def sizedForWrite(df: DataFrame, sizeFrom: Option[DataFrame] = None)
      : DataFrame = {
    val target = targetFileBytes(df.sparkSession)
    val est = sizeFrom.getOrElse(df)
      .queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= 0 || est >= BigInt(Long.MaxValue) / 4) df
    else df.coalesce((((est + target - 1) / target) min 4096 max 1).toInt)
  }

  def hfs(spark: SparkSession, p: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(spark.sparkContext.hadoopConfiguration), hp)
  }

  def listDirs(spark: SparkSession, root: String,
      prefix: String): Seq[org.apache.hadoop.fs.Path] = {
    val (f, hp) = hfs(spark, root)
    if (!f.exists(hp)) Nil
    else f.listStatus(hp).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(_.getPath)
  }

  /** Next staged sequence number — heal applies staged intents in
    * staging order; single-maintenance-writer discipline. */
  def nextSeq(spark: SparkSession, dir: String): Int =
    listDirs(spark, s"$dir/$PendingSub", "")
      .flatMap(_.getName.split("_").lift(1)).flatMap(_.toIntOption)
      .maxOption.getOrElse(-1) + 1

  /** Publish a staged record under an exact name (the streaming accept
    * passes a name carrying its micro-batch identity). */
  def publish(spark: SparkSession, dir: String, name: String,
      payload: DataFrame): String = {
    val tmp = s"$dir/$PendingSub/.tmp_$name"
    sizedForWrite(payload).write.mode("overwrite").parquet(tmp)
    val (f, _) = hfs(spark, tmp)
    require(f.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$dir/$PendingSub/$name")),
      s"stage: rename failed for $name")
    name
  }

  /** Stage one record: `<prefix>_<seq>_<uuid8>`. */
  def stage(spark: SparkSession, dir: String, prefix: String,
      payload: DataFrame): String =
    publish(spark, dir,
      f"${prefix}_${nextSeq(spark, dir)}%05d_" +
        java.util.UUID.randomUUID().toString.take(8),
      payload)

  /** Sweep `.tmp_` stage-crash leftovers. */
  def sweepTmp(spark: SparkSession, dir: String): Unit =
    listDirs(spark, s"$dir/$PendingSub", ".tmp_").foreach { p =>
      val (f, _) = hfs(spark, p.toString)
      f.delete(p, true)
    }

  /** The staged records pending no heal has applied (the standing
    * `*_pending` alert's count). */
  def pendingCount(spark: SparkSession, dir: String): Long =
    listDirs(spark, s"$dir/$PendingSub", "")
      .count(p => !p.getName.startsWith(".")).toLong

  // ------------------------------------------------------- tombstones

  /** The permanent takedown record both stores keep — an APPEND-ONLY
    * `(idCol, seq, op)` log, never rewritten in place: takedowns
    * append `add` rows BEFORE their rewrites (record-before-mutate),
    * deliberate operator accepts append `clear` rows for ids they
    * re-admit, `seq` is the LOG's own monotonic counter (deliberately
    * NOT the staging sequence, which resets when pending drains), and
    * the effective set is "ids whose latest op is add". STREAM accepts
    * filter against it so an at-least-once redelivery cannot
    * resurrect an id removed while the stream was down — under the
    * stores' single-maintenance-writer discipline (heals are
    * serialized; the log's read-max-then-append is not a concurrent
    * structure). Takedown-history-sized: legal/ops events, orders of
    * magnitude rarer than accepts. */
  def tombstonesPath(dir: String): String = s"$dir/takedowns"

  def appendTombstoneOps(spark: SparkSession, dir: String,
      idCol: String, ids: Seq[Long], op: String): Unit = {
    import spark.implicits._
    val (f, hp) = hfs(spark, tombstonesPath(dir))
    val seq =
      if (!f.exists(hp)) 0L
      else {
        val row = spark.read.parquet(tombstonesPath(dir))
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.col("seq"))).head()
        if (row.isNullAt(0)) 0L else row.getLong(0) + 1L
      }
    ids.map(i => (i, seq, op)).toDF(idCol, "seq", "op")
      .coalesce(1).write.mode("append").parquet(tombstonesPath(dir))
  }

  /** The currently-tombstoned ids (latest op per id is `add`), or None
    * when no takedown ever ran. */
  def effectiveTombstones(spark: SparkSession, dir: String,
      idCol: String): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, max_by}
    val (f, hp) = hfs(spark, tombstonesPath(dir))
    if (!f.exists(hp)) None
    else Some(spark.read.parquet(tombstonesPath(dir))
      .groupBy(col(idCol))
      .agg(max_by(col("op"), col("seq")).as("__latest"))
      .where(col("__latest") === "add")
      .select(col(idCol)))
  }

  /** A staged accept's LANDED batch identity: stream records
    * (`..._sb_<tag>_<microBatchId>`) strip their (fresh,
    * ordering-only) staging sequence so a redelivered micro-batch
    * lands on the SAME partitions; operator records keep the whole
    * record name (each staging is a distinct batch). */
  def acceptBatchId(recordName: String): String = {
    val i = recordName.indexOf("_sb_")
    if (i >= 0) recordName.substring(i + 1) else recordName
  }

  /** Publish a STREAM accept record: fresh staging sequence (heal's
    * ordering holds against interleaved operator records) + the
    * (streamTag, microBatchId) landed identity in the name. */
  def publishStreamAccept(spark: SparkSession, dir: String,
      batch: DataFrame, microBatchId: Long, streamTag: String): String = {
    require(microBatchId >= 0, s"negative micro-batch id $microBatchId")
    require(streamTag.nonEmpty && streamTag.forall(c =>
        c.isLetterOrDigit || c == '-'),
      s"streamTag must be non-empty alphanumeric/dash (got '$streamTag')")
    publish(spark, dir,
      f"p_${nextSeq(spark, dir)}%05d_sb_${streamTag}_$microBatchId", batch)
    s"sb_${streamTag}_$microBatchId"
  }

  /** Apply every staged intent in STAGING order: `apply(name, rows)`
    * returns true to consume the record (deleted), false to refuse it
    * (kept staged — the standing alert; later intents still apply).
    * Returns the number of records consumed. */
  def healStaged(spark: SparkSession, dir: String,
      apply: (String, DataFrame) => Boolean): Int = {
    sweepTmp(spark, dir)
    var n = 0
    val staged = listDirs(spark, s"$dir/$PendingSub", "")
      .filterNot(_.getName.startsWith("."))
      .map { p =>
        val seq = p.getName.split("_").lift(1).flatMap(_.toIntOption)
          .getOrElse(throw new IllegalArgumentException(
            s"heal: unparseable staged record name ${p.getName} under " +
              s"$dir/$PendingSub"))
        (seq, p)
      }.sortBy(_._1)
    staged.foreach { case (_, p) =>
      if (apply(p.getName, spark.read.parquet(p.toString))) {
        val (f, _) = hfs(spark, p.toString)
        f.delete(p, true)
        n += 1
      }
    }
    n
  }
}
