package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generate an N× replica of testdata tables under a new directory —
  * the scale-slope probe's input (dev tool; never touches the
  * read-only source).
  *
  * `documents`: replica k shifts doc_ids by k·10⁹ and suffixes every
  * TOKEN with a replica marker, so the copies model "N× more data of
  * the same character": per-replica TOKEN structure (token counts,
  * shingle statistics, duplicate clusters) is identical to the source
  * — though character lengths inflate ~3 chars/token, a conservative
  * bias for character-level ops — while vocabularies
  * are disjoint ACROSS replicas — no cross-replica near-dup pairs, so a
  * pair-producing operator's true work scales ×N, not ×N² (ten literal
  * copies of one corpus would near-dup-match each other and measure a
  * workload no real 10× corpus has).
  *
  * `events`: replica k shifts user_id (and event_id) by k·10⁹ and
  * keeps the TIME AXIS untouched, so the TSDB model sees N× the
  * SERIES over the same range — the direction a production fleet
  * actually grows (more emitters, not a longer history) and the one
  * that stresses the catalog joins, per-series windows and
  * group-aggregate shuffles. Values, timestamps and cadence per
  * series are identical to the source, so per-series answers at N×
  * equal the 1× answers and only VOLUME changes.
  *
  * Usage: runMain graft.tools.ScaleReplica <srcDir> <destDir> <copies>
  *          [documents|events|all]       (default documents)
  */
object ScaleReplica {
  def main(args: Array[String]): Unit = {
    val src = args(0); val dest = args(1); val copies = args(2).toInt
    val tables = if (args.length > 3) args(3) else "documents"
    require(copies >= 1, "need at least one copy")
    require(Set("documents", "events", "all")(tables),
      s"tables must be documents|events|all (got $tables)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.model.TsdbContext.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (tables == "documents" || tables == "all") {
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
    }

    if (tables == "events" || tables == "all") {
      val ev = spark.read.parquet(s"$src/events.parquet")
      val reps = (0 until copies).map { k =>
        if (k == 0) ev
        else ev
          .withColumn("event_id", col("event_id") + lit(k.toLong * 1000000000L))
          .withColumn("user_id", col("user_id") + lit(k.toLong * 1000000000L))
      }
      reps.reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$dest/events.parquet")
      println(s"SCALEREPLICA wrote ${copies}x events to $dest")
    }
    spark.stop()
  }
}
