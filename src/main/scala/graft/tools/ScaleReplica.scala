package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generate an N× replica of a testdata documents table under a new
  * directory — the scale-slope probe's input (dev tool; never touches
  * the read-only source).
  *
  * Replica k shifts doc_ids by k·10⁹ and suffixes every TOKEN with a
  * replica marker, so the copies model "N× more data of the same
  * character": per-replica TOKEN structure (token counts, shingle
  * statistics, duplicate clusters) is identical to the source — though
  * character lengths inflate ~3 chars/token, a conservative bias for
  * character-level ops — while vocabularies
  * are disjoint ACROSS replicas — no cross-replica near-dup pairs, so a
  * pair-producing operator's true work scales ×N, not ×N² (ten literal
  * copies of one corpus would near-dup-match each other and measure a
  * workload no real 10× corpus has).
  *
  * Usage: runMain graft.tools.ScaleReplica <srcDir> <destDir> <copies>
  */
object ScaleReplica {
  def main(args: Array[String]): Unit = {
    val src = args(0); val dest = args(1); val copies = args(2).toInt
    require(copies >= 1, "need at least one copy")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.model.TsdbContext.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val reps = (0 until copies).map { k =>
      if (k == 0) docs
      else docs
        .select(
          (col("doc_id") + lit(k.toLong * 1000000000L)).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit(s"_r$k"))), " ").as("text"),
          col("lang"), col("source"))
        // the suffixes inflate character counts (~3 chars/token), so
        // n_chars must be recomputed from the NEW text — a stale copy
        // would disagree with length(text) for every replica row
        .withColumn("n_chars", length(col("text")))
    }
    reps.reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dest/documents.parquet")
    println(s"SCALEREPLICA wrote ${copies}x documents to $dest")
    spark.stop()
  }
}
