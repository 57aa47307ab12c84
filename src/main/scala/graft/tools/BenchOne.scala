package graft.tools

import org.apache.spark.sql.SparkSession

/** Run a subset of SparkEntry queries by name and print per-query seconds.
  * Usage: runMain graft.tools.BenchOne <sfDir> <name> [<name> ...]
  * (dev tool; the driver contract uses graft.Bench). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.model.TsdbContext.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count()
        finally graft.pipeline.Dedup.releaseCaches()
      println(f"BENCHONE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
