package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe of the driver testdata (removed before round end). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.show(5, false)
    println("ts range: ")
    ev.agg(min("ts"), max("ts")).show(false)
    ev.groupBy("event_type").count().show(false)
    ev.agg(min("user_id"), max("user_id"), countDistinct("user_id")).show(false)
    ev.select(col("props")).show(5, false)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.show(3, false)
    docs.groupBy("lang").count().show(false)
    docs.groupBy("source").count().show(false)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.select(col("vec_id"), col("label"), expr("size(embedding)").as("dim")).show(5, false)
    spark.stop()
  }
}
