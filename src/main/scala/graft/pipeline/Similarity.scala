package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exact baseline; the scale path buckets
  * vectors by sign-random-projection (SRP) so the candidate join touches
  * only same-bucket vectors. Everything is column expressions (whole-stage
  * codegen) — no UDFs, no driver-side math.
  *
  * Scale notes (100 TB): brute-force is a broadcast of the *query* set
  * (small) against a full scan of the corpus — one pass, no shuffle, then
  * a top-k per query (partial top-k map-side via the window over qid).
  * SRP-bucketed ANN turns that scan into a bucket-key equi-join; recall is
  * tuned by `bits` (fewer bits → bigger buckets → higher recall/cost). An
  * IVF variant would replace the bucket key with nearest-centroid ids from
  * a broadcast k-means codebook — same join shape.
  */
object Similarity {

  /** Elementwise dot product in double precision — a native codegen'd
    * Catalyst expression ([[graft.functions.VectorExpressions.VecDot]]);
    * sequential fold order, bit-identical to the oracle's list arithmetic. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass cosine (same IEEE op sequence as dot/(‖a‖‖b‖)). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vecCosine(a, b)

  /** Exact top-k cosine neighbors for each query vector.
    * @param corpus (id, embedding) — the searched set
    * @param queries (qid, embedding) — small; broadcast
    * @return (qid, id, rank, cos) with rank 1..k, self-matches excluded */
  def knnBrute(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "id", qidCol: String = "qid",
      embCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(embCol).as("ce"))
    val q = queries.select(col(qidCol).as("qid"), col(embCol).as("qe"))
    val scored = c.join(broadcast(q), col("id") =!= col("qid"))
      .select(col("qid"), col("id"), cosine(col("qe"), col("ce")).as("cos"))
    topK(scored, k)
  }

  /** Sign-random-projection bucket: bit i = sign(embedding[i]) for the
    * first `bits` dims (a fixed axis-aligned projection — deterministic
    * and oracle-reproducible; random hyperplanes would broadcast a
    * plane matrix and fold dot-product signs the same way). */
  def srpBucket(emb: Column, bits: Int): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L),
      (acc, i) => acc + when(element_at(emb, i + 1) > 0f,
        pow(lit(2.0), i).cast("long")).otherwise(lit(0L)))

  /** ANN top-k restricted to the query's SRP bucket. Same output shape as
    * [[knnBrute]]; vectors in other buckets are never scored (recall<1). */
  def knnBucketed(
      corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 6,
      idCol: String = "id", qidCol: String = "qid",
      embCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(embCol).as("ce"),
      srpBucket(col(embCol), bits).as("bucket"))
    val q = queries.select(col(qidCol).as("qid"), col(embCol).as("qe"),
      srpBucket(col(embCol), bits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), cosine(col("qe"), col("ce")).as("cos"))
    topK(scored, k)
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("id"), col("rank"), col("cos"))
  }
}
