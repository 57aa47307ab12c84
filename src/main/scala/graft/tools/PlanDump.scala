package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of named SparkEntry queries to files —
  * the before/after plan evidence the optimization rounds commit under
  * `plans/`. Usage:
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <name> [...]
  * writes `<outDir>/<name>_<suffix>.txt` per query (dev tool; the
  * driver contract uses graft.Bench). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> <name> [<name> ...]")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.model.TsdbContext.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      graft.pipeline.Dedup.releaseCaches()
      println(s"PLANDUMP wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
