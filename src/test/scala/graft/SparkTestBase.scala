package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.TsdbContext

object SparkTestBase {
  lazy val spark: SparkSession = TsdbContext.configure(
    SparkSession.builder().master("local[4]").appName("graft-test"), cpus = 4)
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.functions.GraftExtensions)
    .getOrCreate()
}

trait SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Reference column_store_test fixture (cc:116-131): series `test tag=T<i>`
    * for i in ids, one sample per integer tick in [begin, end),
    * value = 0.1 * ts. Timestamps are plain Longs (ns). */
  def rampContext(ids: Seq[Int], begin: Long, end: Long,
      value: Long => Double = ts => 0.1 * ts): TsdbContext = {
    val rows = for (i <- ids; ts <- begin until end)
      yield (s"T$i", ts, value(ts))
    import spark.implicits._
    val wide = rows.toDF("tag", "ts", "value")
      .withColumn("metric", org.apache.spark.sql.functions.lit("test"))
    TsdbContext.fromWide(spark, wide, "metric", Seq("tag"), "ts", "value")
  }

  def collectSeries(df: DataFrame): Seq[(String, Long, Double)] =
    df.collect().toSeq.map(r => (
      r.getString(r.fieldIndex("series")),
      r.getLong(r.fieldIndex("ts")),
      r.getDouble(r.fieldIndex("value"))))
}
