package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import graft.engine.Engine
import graft.model.TsdbContext

/** Manual smoke driver: exercises the driver contract + hostile inputs. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = TsdbContext.configure(
      SparkSession.builder().master("local[4]"), 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("entry rows=" + SparkEntry.entry(spark).count())

    val e = new Engine(TsdbContext.fromTestdata(spark, "/root/testdata/sf0.001"))
    println("unknown metric rows=" + e.execute(
      """{"select": "nosuch", "range": {"from": 0, "to": 99999999999999999}}""").count())
    try e.execute("""{"bogus": 1}""")
    catch { case ex: Exception => println("bad query → " + ex.getMessage) }
    try e.execute("""not json at all""")
    catch { case ex: Exception => println("bad json → " + ex.getClass.getSimpleName) }
    // backward range through JSON, limit applies after ordering
    val bwd = e.execute(
      """{"select": "purchase", "range": {"from": "20240401T000000", "to": "20240101T000000"},
          "order-by": "time", "limit": 3}""")
    bwd.show(3, false)
    spark.stop()
  }
}
