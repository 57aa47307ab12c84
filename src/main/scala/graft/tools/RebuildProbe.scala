package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the round-12 claim directly: a ONE-DAY correction's scoped
  * index rebuild ([[graft.model.IndexCatalog.rebuildScoped]]) costs
  * the touched day, while the full rebuild re-derives all of history —
  * so as the database's day span D grows with the correction held
  * fixed, scoped wall time should stay ~flat and full should grow
  * ~linearly (the gap IS the reason the scoped form exists; at 100 TB
  * it is the difference between a day-sized job and six full-history
  * scans).
  *
  * Per day count D: build a database holding D days (sf January
  * replicated with 30-day time shifts, rows/day constant — the
  * [[L0DayProbe]] extension scheme) with an owned hourly rollup, apply
  * a one-day canonical correction through
  * [[graft.model.TsdbLayout.upsertSamples]] (which records the touched
  * partitions), wall `rebuildScoped` (record-driven), re-dirty the
  * same day, then wall the FULL `rebuild`. Emits one PROBE line per D.
  *
  * Usage: runMain graft.tools.RebuildProbe <sfDir> <days> [<days> ...]
  * (dev tool; /tmp scratch, read-only source untouched)
  */
object RebuildProbe {

  private val DayNs = graft.time.TimeUtil.NsPerDay

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val dayCounts = args.drop(1).map(_.toInt).toSeq
    require(dayCounts.nonEmpty, "give at least one day count")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.model.TsdbContext.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ctx = graft.model.TsdbContext.fromTestdata(spark, sfDir)
    val hourNs = 3600000000000L
    // one January of keyed rows, rebased so day numbering starts at 0
    val base = ctx.samples
      .select(col("series_id"),
        (col("ts") - lit(graft.entries.EntryUtil.FromNs)).as("ts"),
        col("value"))
      .where(col("ts") >= 0 && col("ts") < 30 * DayNs)
      .cache()
    val perDay = base.count() / 30

    def wall[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for (days <- dayCounts) {
      val copies = (days + 29) / 30
      val extended = (0 until copies).map { k =>
        base.withColumn("ts", col("ts") + lit(k.toLong * 30 * DayNs))
      }.reduce(_ unionByName _)
        .where(col("ts") < days.toLong * DayNs)
        .localCheckpoint()
      val db = java.nio.file.Files
        .createTempDirectory(s"graft_rbprobe_$days").toString
      graft.model.TsdbLayout.writeDatabase(ctx.copy(
        samples = extended,
        rollups = Seq(hourNs ->
          graft.engine.Rollup.build(extended, hourNs))), db)
      // the fixed-size correction: one metric, one mid-span day, +1000
      val d0 = (days / 2).toLong * DayNs
      val late = extended
        .join(ctx.series.where(col("metric") === "purchase")
          .select("series_id"), "series_id")
        .where(col("ts") >= d0 && col("ts") < d0 + DayNs)
        .select(col("series_id"), col("ts"),
          (col("value") + 1000.0).as("value"))
      val (touched, tUpsert) = wall(graft.model.TsdbLayout.upsertSamples(
        spark, s"$db/samples", late, ctx.series))
      val (_, tScoped) = wall(
        graft.model.IndexCatalog.rebuildScoped(spark, db))
      // re-dirty the SAME day so the full form rebuilds the same state
      graft.model.TsdbLayout.upsertSamples(spark, s"$db/samples",
        late.withColumn("value", col("value") + 1.0), ctx.series)
      val (_, tFull) = wall(graft.model.IndexCatalog.rebuild(spark, db))
      println(f"PROBE days=$days%d rows/day=$perDay%d touched=$touched%d " +
        f"upsert=$tUpsert%.2f scoped_rebuild=$tScoped%.2f " +
        f"full_rebuild=$tFull%.2f full/scoped=${tFull / tScoped}%.1fx")
    }
    spark.stop()
  }
}
