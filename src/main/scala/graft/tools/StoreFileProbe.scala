package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Count the parquet data files a lifecycle-store construction leaves
  * behind — the small-file evidence for the r15 write-sizing change
  * (guide §6): build a CorpusStore (create + accept + takedown) and an
  * EmbeddingStore (create + accept) over the testdata, then print one
  * line per store sub-directory with its file count and byte size.
  * Usage: runMain graft.tools.StoreFileProbe <sfDir>
  * (dev tool; the driver contract uses graft.Bench). */
object StoreFileProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.model.TsdbContext.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_fileprobe")
      .toString
    val docs = graft.entries.EntryUtil.repartitioned(spark, dir, "documents")
    val cs = s"$root/corpus"
    graft.pipeline.CorpusStore.create(spark, cs,
      docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 =!= 3),
      "doc_id", "text", k = 3, numPerm = 32, bands = 8)
    graft.pipeline.CorpusStore.acceptBatch(spark, cs,
      docs.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 3))
    val extras = docs.where(col("doc_id") % 35 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    if (extras.nonEmpty)
      graft.pipeline.CorpusStore.removeDocuments(spark, cs, extras.take(20))

    val emb = graft.entries.EntryUtil.repartitioned(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val es = s"$root/emb"
    graft.pipeline.EmbeddingStore.create(spark, es,
      emb.where(col("id") % 4 =!= 0), nlist = 8, iters = 2)
    graft.pipeline.EmbeddingStore.acceptBatch(spark, es,
      emb.where(col("id") % 4 === 0))

    def report(sub: String): Unit = {
      val p = java.nio.file.Paths.get(root, sub)
      if (java.nio.file.Files.exists(p)) {
        val st = java.nio.file.Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          val files = st.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_)).toSeq
          val data = files.filter(_.getFileName.toString.startsWith("part-"))
          println(f"FILEPROBE $sub%-28s data_files=${data.size}%5d " +
            f"all_files=${files.size}%5d bytes=${data.map(
              java.nio.file.Files.size).sum}%9d")
        } finally st.close()
      }
    }
    Seq("corpus/docs", "corpus/indexes/hashes", "corpus/indexes/bands",
      "corpus/takedowns", "emb/cells_e0/data", "emb/cells_e0/stats")
      .foreach(report)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(root))
    spark.stop()
  }
}
