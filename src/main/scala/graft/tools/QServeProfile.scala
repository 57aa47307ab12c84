package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adjudicate the stream_quantile_serve watch item (round-12 verdict):
  * break the entry's wall time into fixture prep (driver feed rows),
  * the real Structured-Streaming fixture (histBuild micro-batches —
  * counted via a listener), and the SERVED statement, across warm
  * repetitions. The question is whether the cost is the micro-batch
  * trigger cadence (3 chunks should be ~4 data batches, not a dozen
  * trigger rounds) or the served plan (which must stay an index merge
  * with no fact scan).
  *
  * Usage: runMain graft.tools.QServeProfile <sfDir> [reps]
  */
object QServeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.model.TsdbContext.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          batches.incrementAndGet()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })

    implicit val enc =
      org.apache.spark.sql.Encoders.product[(Long, Long, Double)]
    val hourNs = 3600000000000L
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val ctx = graft.model.TsdbContext.fromTestdata(spark, dir)
      val ids = ctx.series.where(col("metric") === "purchase")
        .select("series_id").collect().map(_.getLong(0))
      val rows = ctx.samples
        .where(col("series_id").isin(ids.toSeq: _*))
        .orderBy("ts", "series_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
      val t1 = System.nanoTime()
      val b0 = batches.get()
      val sink = graft.entries.EntryUtil.runStreamEntry(spark,
        "qprof_sink", rows, chunks = 3, cols = Seq("name", "ts", "value"),
        mkStream = graft.streaming.TsdbStream.histBuild(_, hourNs,
          "10 minutes"),
        sentinel = Some((ids.head,
          graft.entries.EntryUtil.ToNs + 86400000000000L, 0.0)))
      // the harness returns lazily; force the sink read like the
      // served statement would
      sink.count()
      val t2 = System.nanoTime()
      val nb = batches.get() - b0
      val served = new graft.engine.Engine(ctx.copy(histograms =
          Seq(hourNs -> sink.select(col("name").as("series_id"),
            col("win"), col("lo"), col("cnt")))))
        .execute(s"""{"quantile": {"metric": "purchase",
             "p": ["0.5", "0.99"]},
             "range": {"from": "${graft.entries.EntryUtil.FromIso}",
                       "to": "${graft.entries.EntryUtil.ToIso}"}}""")
      served.collect()
      val t3 = System.nanoTime()
      // serve again over the SAME engine/sink: separates one-time
      // plan/codegen cost from steady execution of the served plan
      new graft.engine.Engine(ctx.copy(histograms =
          Seq(hourNs -> sink.select(col("name").as("series_id"),
            col("win"), col("lo"), col("cnt")))))
        .execute(s"""{"quantile": {"metric": "purchase",
             "p": ["0.5", "0.99"]},
             "range": {"from": "${graft.entries.EntryUtil.FromIso}",
                       "to": "${graft.entries.EntryUtil.ToIso}"}}""")
        .collect()
      val t4 = System.nanoTime()
      println(f"PROFILE run=$i rows=${rows.size}%d " +
        f"prep=${(t1 - t0) / 1e9}%.2fs " +
        f"feed=${(t2 - t1) / 1e9}%.2fs (micro_batches=$nb%d) " +
        f"serve=${(t3 - t2) / 1e9}%.2fs serve2=${(t4 - t3) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
