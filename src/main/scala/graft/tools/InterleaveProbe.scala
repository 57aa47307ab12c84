package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.CorpusStore

/** Measure tiered compaction UNDER interleaved stream accepts (round-13
  * verdict item 5): a long accept stream accumulates one `__batch`
  * partition per trigger; a cron staging [[CorpusStore.stageCompaction]]
  * (tiered, maxBytes) every C accepts must keep the store's batch count
  * BOUNDED (~C + consolidated tiers) while the accepts keep landing —
  * vs the no-compaction run where batches grow linearly and the probe
  * pays the accumulated listing/footer cost. Probe answers are
  * identical by contract (spec-pinned); this measures the counts and
  * the probe wall time.
  *
  * Per scenario: N accepts of `batchRows` docs each through
  * [[CorpusStore.acceptStreamBatch]] (the real stream trigger body);
  * the compacted run stages a tiered compaction every C accepts (the
  * next trigger's heal applies it — exactly the entry's interleaving).
  * Emits one PROBE line per scenario.
  *
  * Usage: runMain graft.tools.InterleaveProbe <sfDir> <N> <C>
  * (dev tool; /tmp scratch, read-only source untouched)
  */
object InterleaveProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(40)
    val every = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.model.TsdbContext.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val base = docs.count()

    def batch(i: Int): DataFrame = docs.limit(200)
      .select((col("doc_id") + lit(900000L + i * 10000L)).as("doc_id"),
        concat(col("text"), lit(s" accept_$i")).as("text"))

    def batchCount(dir: String): Int = {
      val p = java.nio.file.Paths.get(dir, CorpusStore.DocsSub)
      val ls = java.nio.file.Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        // partition dirs only — the root also holds _SUCCESS
        ls.iterator().asScala.count(
          _.getFileName.toString.startsWith(s"${CorpusStore.BatchCol}="))
      } finally ls.close()
    }

    def wall[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def run(compact: Boolean): (Int, Double, Double) = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_iprobe_$compact").toString
      CorpusStore.create(spark, dir, docs, "doc_id", "text")
      val (_, tAccepts) = wall {
        (0 until n).foreach { i =>
          if (compact && i > 0 && i % every == 0)
            // the cron: tiered — only small (per-accept-sized) batches
            // merge; prior consolidations settle and are never rewritten
            CorpusStore.stageCompaction(spark, dir,
              maxBytes = Some(64L * 1024 * 1024))
          // the stream trigger body: stage + heal (applies any staged
          // compaction first — the interleaving under test)
          CorpusStore.acceptStreamBatch(spark, dir, batch(i), i.toLong,
            "probe")
        }
      }
      val probeBatch = docs.limit(200)
        .select((col("doc_id") + lit(990000000L)).as("doc_id"),
          concat(col("text"), lit(" probe")).as("text"))
      val (_, tProbe) = wall {
        CorpusStore.probeBatch(spark, dir, probeBatch).count()
      }
      (batchCount(dir), tAccepts, tProbe)
    }

    val (bPlain, taPlain, tpPlain) = run(compact = false)
    val (bComp, taComp, tpComp) = run(compact = true)
    println(f"PROBE n=$n%d every=$every%d base_rows=$base%d | " +
      f"no-compaction: batches=$bPlain%d accepts=$taPlain%.1fs " +
      f"probe=$tpPlain%.2fs | interleaved-tiered: batches=$bComp%d " +
      f"accepts=$taComp%.1fs probe=$tpComp%.2fs")
    spark.stop()
  }
}
