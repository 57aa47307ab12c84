package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout of a curated document corpus — the write side of the
  * training-data pipeline (the corpus counterpart of [[TsdbLayout]]).
  *
  *   - directory partitioning by (split, source): a training reader opens
  *     only its split's directories (Catalyst partition pruning), and
  *     per-source mixture adjustments touch only that source's files;
  *   - files sorted by doc_id within partitions: a stable shard order, so
  *     downstream sequence packing ([[graft.pipeline.TextOps.packSequences]])
  *     is reproducible from the layout alone;
  *   - a manifest (per-partition doc/token counts) computed from the same
  *     frame, so the data recipe ships with the data.
  *
  * At 100 TB the partition columns bound every job's input: no job ever
  * lists, let alone reads, splits or sources it does not consume.
  */
object CorpusLayout {

  /** Write documents (must carry `split` and `source` columns — compose
    * with TextOps.assignSplits) as a partitioned, sorted corpus.
    *
    * `tasksPerPartition` salts the shuffle so one (split, source)
    * combination spreads over that many write tasks — repartitioning on
    * the directory columns alone would collapse each combination (at
    * corpus scale, terabytes) into a single task while the cluster
    * idles. Files stay doc_id-sorted within each task's output. */
  def writeDocuments(docs: DataFrame, path: String,
      tasksPerPartition: Int = 16): Unit = {
    require(tasksPerPartition > 0, "tasksPerPartition must be positive")
    docs
      .repartition(col("split"), col("source"),
        pmod(hash(col("doc_id")), lit(tasksPerPartition)))
      .sortWithinPartitions(col("split"), col("source"), col("doc_id"))
      .write.partitionBy("split", "source").mode("overwrite").parquet(path)
  }

  /** Open one split; the predicate prunes to its directories. */
  def readSplit(spark: SparkSession, path: String, split: String): DataFrame =
    spark.read.parquet(path).where(col("split") === split)

  /** Per-(split, source) doc and token counts — token definition shared
    * with the curation operators (TextOps.tokenCountWs), so the shipped
    * recipe numbers agree with what the pipeline reports. */
  def manifest(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.pipeline.TextOps.tokenCountWs(col(textCol))).as("n_tokens"))
}
