package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway: dump the physical plan of a select scan (removed at round end). */
object ExplainScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.model.TsdbContext.configure(
      SparkSession.builder().master("local[4]"), 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.entries.EntryUtil.engineFor(spark, sfDir)
    e.execute(
      s"""{"select": "purchase",
           "range": {"from": "20240101T000000", "to": "20240401T000000"},
           "filter": {"gt": 150}}""").explain("formatted")
    spark.stop()
  }
}
