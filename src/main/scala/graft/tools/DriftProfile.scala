package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose `emb_drift_tick`'s cost (the QServeProfile pattern): time
  * the fixture copy, each health phase, and the maintenanceTick — then,
  * on a fresh copy, the tick's own components one by one (heal, drift
  * reading, drift queries, refit, TSDB steps). Usage:
  *   runMain graft.tools.DriftProfile <sfDir> [reps]
  * (dev tool; the driver contract uses graft.Bench). */
object DriftProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.model.TsdbContext.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"DRIFTPROF $what%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // entry-shaped pass: copy + p1 + tick + p3
    (1 to reps).foreach { rep =>
      println(s"DRIFTPROF -- entry-shaped pass $rep")
      val n = t("entry-total") {
        graft.SparkEntry.queries("emb_drift_tick")(spark, sfDir).count()
      }
      println(s"DRIFTPROF entry rows = $n")
    }
    // component pass over a fresh copy
    println("DRIFTPROF -- component pass")
    val db = t("copy") {
      val dbDir = graft.entries.EntryUtil.scratchDir("graft_driftprof") + "/db"
      val src = graft.entries.Round14Entries.driftTemplateFor(spark, sfDir)
      val conf = spark.sparkContext.hadoopConfiguration
      val sp = new org.apache.hadoop.fs.Path(src)
      val dp = new org.apache.hadoop.fs.Path(dbDir)
      org.apache.hadoop.fs.FileUtil.copy(sp.getFileSystem(conf), sp,
        dp.getFileSystem(conf), dp, false, conf)
      dbDir
    }
    val embDir = s"$db/${graft.model.TsdbLayout.EmbSub}"
    t("p1-health")(graft.pipeline.EmbeddingStore.health(spark, embDir))
    t("tick-compact+fold") {
      // the TSDB steps the tick runs besides the embedding maintain
      graft.model.TsdbLayout.maintenanceTick(spark, db, 0L,
        healIndexes = false).collect()
    }
    t("emb-heal")(graft.pipeline.EmbeddingStore.heal(spark, embDir))
    t("drift-read")(graft.pipeline.EmbeddingStore.driftedCells(spark, embDir))
    val q = t("drift-queries") {
      graft.pipeline.EmbeddingStore.driftQueries(spark, embDir, 32)
        .localCheckpoint()
    }
    t("refit")(graft.pipeline.EmbeddingStore.refit(spark, embDir, q, 10, 2)
      .agg(max(col("healed"))).head())
    t("p3-health")(graft.pipeline.EmbeddingStore.health(spark, embDir))
    spark.stop()
  }
}
