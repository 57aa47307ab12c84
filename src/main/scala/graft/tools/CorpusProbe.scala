package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.CorpusStore

/** Measure the corpus-index lifecycle's scale contract directly
  * ([[graft.pipeline.CorpusStore]]): accepting a batch must cost the
  * BATCH (its two in-row index projections), never the corpus — so as
  * the corpus grows by factor G with the accepted batch held fixed,
  * accept wall time should stay ~flat while a full index rewrite
  * ([[graft.pipeline.Dedup.writeCorpusIndex]]) grows ~linearly — and
  * the probe ([[CorpusStore.probeBatch]]) should cost the same against
  * an N-times-appended store as against a freshly-rewritten one (the
  * index read is the same parquet rows either way).
  *
  * Corpus replicas follow the [[ScaleReplica]] scheme: the sf
  * documents table replicated with id offsets (text salted per replica
  * so replicas are not exact dups of each other). Per growth factor G:
  * build a store over G replicas, wall `acceptBatch` of one fixed
  * batch, wall `probeBatch` of another, and wall the full
  * `writeCorpusIndex` over the same G-replica corpus for the contrast
  * line. Emits one PROBE line per G.
  *
  * Usage: runMain graft.tools.CorpusProbe <sfDir> <G> [<G> ...]
  * (dev tool; /tmp scratch, read-only source untouched)
  */
object CorpusProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factors = args.drop(1).map(_.toInt).toSeq
    require(factors.nonEmpty, "give at least one growth factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.model.TsdbContext.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()

    def replicas(g: Int): DataFrame =
      (0 until g).map { r =>
        docs.select((col("doc_id") + lit(r * n * 10L)).as("doc_id"),
          // salt per replica: replicas must not be exact dups of each
          // other or the probe's candidate sets grow artificially
          concat(col("text"), lit(s" replica_salt_$r")).as("text"))
      }.reduce(_ unionByName _)

    // the FIXED batch: fresh ids far outside every replica's range
    def freshBatch(tag: String): DataFrame = docs.limit(200)
      .select((col("doc_id") + lit(900000000L)).as("doc_id"),
        concat(col("text"), lit(s" $tag")).as("text"))

    def wall[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    factors.foreach { g =>
      val corpus = replicas(g).localCheckpoint()
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_cprobe_$g").toString
      val (_, tCreate) = wall {
        CorpusStore.create(spark, dir, corpus, "doc_id", "text")
      }
      val (_, tAccept) = wall {
        CorpusStore.acceptBatch(spark, dir, freshBatch("accept"))
      }
      val (_, tProbe) = wall {
        CorpusStore.probeBatch(spark, dir, freshBatch("probe")).count()
      }
      // contrast: what the lifecycle append SAVES — the full rewrite
      val full = java.nio.file.Files
        .createTempDirectory(s"graft_cprobe_full_$g").toString
      val (_, tRewrite) = wall {
        graft.pipeline.Dedup.writeCorpusIndex(
          corpus.unionByName(freshBatch("accept")), full, "doc_id", "text")
      }
      println(f"PROBE g=$g%d corpus_rows=${g * n}%d " +
        f"create=$tCreate%.2fs accept=$tAccept%.2fs " +
        f"probe=$tProbe%.2fs full_rewrite=$tRewrite%.2fs")
    }
    spark.stop()
  }
}
