package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Throwaway stage profiler for minhashPairs (removed before round end). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.model.TsdbContext.configure(
      SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = System.nanoTime()
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        println(f"JOB ${j.jobId}%3d ${(System.nanoTime() - starts(j.jobId)) / 1e9}%7.2f s")
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        println(f"  STG ${i.stageId}%3d ${i.name.takeWhile(_ != '\n').take(60)}%-60s tasks=${i.numTasks}%3d ${(i.completionTime.get - i.submissionTime.get) / 1e3}%7.2f s")
      }
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
    val t0 = System.nanoTime()
    val n = Dedup.minhashPairs(docs, "doc_id", "text", 3, 32, 8, 0.8).count()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
    spark.stop()
  }
}
