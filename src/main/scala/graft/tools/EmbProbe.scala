package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{EmbeddingStore, Similarity}

/** Measure the persisted embedding index's scale contract directly
  * ([[graft.pipeline.EmbeddingStore]]): a kNN QUERY against the store
  * must cost the probed partitions (~nprobe/nlist of the index),
  * never the corpus — so as the corpus grows by factor G with the
  * query batch held fixed, [[EmbeddingStore.knn]] wall time should
  * stay ~flat (the probed slice grows, but only that slice is read
  * and only skinny columns of it), while the per-statement recompute
  * ([[Similarity.knnIvfWith]] — the round-13 serving path: full
  * corpus assignment + corpus-sized row_number shuffle PER QUERY)
  * grows ~linearly with G. Accepts stay batch-sized against any G.
  *
  * Corpus replicas follow the [[ScaleReplica]] scheme: the sf
  * embeddings table replicated with id offsets and a per-replica
  * component nudge (replicas must not be exact dups). Per growth
  * factor G: build a store over G replicas (the index-build cost, paid
  * once — reported for honesty, expected ~linear), then wall the
  * store-served query, the recompute query, and one accept. Emits one
  * PROBE line per G.
  *
  * Usage: runMain graft.tools.EmbProbe <sfDir> <G> [<G> ...]
  * (dev tool; /tmp scratch, read-only source untouched)
  */
object EmbProbe {

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

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val n = emb.count()

    def replicas(g: Int): DataFrame =
      (0 until g).map { r =>
        emb.select((col("id") + lit(r * n * 10L)).as("id"),
          // nudge one component per replica so replicas are not exact
          // duplicates of each other
          transform(col("embedding"),
            x => x + lit(r.toFloat * 0.001f)).as("embedding"))
      }.reduce(_ unionByName _)

    val queries = emb.where(col("id") < 32)
      .select(col("id").as("qid"), col("embedding")).localCheckpoint()

    def freshBatch(tag: Long): DataFrame = emb.limit(500)
      .select((col("id") + lit(800000000L + tag)).as("id"), col("embedding"))

    def wall[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    factors.foreach { g =>
      val corpus = replicas(g).localCheckpoint()
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_eprobe_$g").toString
      val (_, tCreate) = wall {
        EmbeddingStore.create(spark, dir, corpus, nlist = 16, iters = 2)
      }
      // warm both query paths' codebook reads out of the measurement
      val centers = EmbeddingStore.readCenters(spark, dir)
      val (_, tServe) = wall {
        EmbeddingStore.knn(spark, dir, queries, k = 10, nprobe = 2).count()
      }
      // contrast: the per-statement recompute the store replaces —
      // full-corpus cell assignment + corpus-sized window shuffle
      val (_, tRecompute) = wall {
        Similarity.knnIvfWith(centers, corpus, queries, k = 10,
          nprobe = 2).count()
      }
      val (_, tAccept) = wall {
        EmbeddingStore.acceptBatch(spark, dir, freshBatch(g))
      }
      // r15: the kernel-assigned Lloyd fit alone (per-round cost =
      // one in-row assignment map + one (cell, pos) mean — nothing
      // codebook-shaped shuffles a vector), and the full recall-gated
      // refit (fit + the r15 FUSED gate: one shared corpus pass for
      // stale/refit/exact) — the drift remedy's scale slope
      val (_, tFit) = wall {
        Similarity.fitCodebook(corpus, nlist = 16, iters = 2)
      }
      val (_, tGate) = wall {
        Similarity.refitCodebook(spark, s"$dir/cells_e0/codebook",
          corpus, queries, k = 10, nlist = 16, nprobe = 2, iters = 2,
          writeTo = Some(s"$dir/refit_probe")).count()
      }
      graft.pipeline.Dedup.releaseCaches()
      println(f"PROBE g=$g%d corpus_rows=${g * n}%d " +
        f"create=$tCreate%.2fs serve_knn=$tServe%.2fs " +
        f"recompute_knn=$tRecompute%.2fs accept=$tAccept%.2fs " +
        f"fit=$tFit%.2fs refit_gate=$tGate%.2fs")
    }
    spark.stop()
  }
}
