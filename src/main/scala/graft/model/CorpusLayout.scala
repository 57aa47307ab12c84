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
    * with TextOps.assignSplits) as a partitioned, sorted corpus. */
  def writeDocuments(docs: DataFrame, path: String): Unit =
    docs
      .repartition(col("split"), col("source"))
      .sortWithinPartitions(col("split"), col("source"), col("doc_id"))
      .write.partitionBy("split", "source").mode("overwrite").parquet(path)

  /** Open one split; the predicate prunes to its directories. */
  def readSplit(spark: SparkSession, path: String, split: String): DataFrame =
    spark.read.parquet(path).where(col("split") === split)

  /** Per-(split, source) doc and whitespace-token counts. */
  def manifest(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " "))).as("n_tokens"))
}
