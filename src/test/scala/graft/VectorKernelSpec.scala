package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The r14 in-row assignment kernel
  * ([[graft.functions.VectorExpressions.VecNearestCells]]) replaced the
  * crossJoin + per-key row_number window inside every IVF/PQ cell
  * assignment — this spec pins the kernel's semantics to the window
  * form it replaced, on exactly the cases where they could diverge:
  * the IEEE distance sequence, the (distance, cell) tie-break, n >
  * 1 probe ordering, n > #centers truncation, and float vs double
  * input arrays. */
class VectorKernelSpec extends AnyFunSuite with SparkTestBase {
  import graft.functions.VectorExpressions.vecNearestCells

  private def windowForm(centers: Seq[(Int, Seq[Double])],
      df: org.apache.spark.sql.DataFrame, n: Int)
      : Seq[(Long, Int, Double)] = {
    import org.apache.spark.sql.expressions.Window
    val centersDf = spark.createDataFrame(centers).toDF("cell", "center")
    val d = {
      val a = col("v").cast("array<double>"); val b = col("center")
      graft.pipeline.Similarity.dot(a, a) +
        graft.pipeline.Similarity.dot(b, b) -
        lit(2.0) * graft.pipeline.Similarity.dot(a, b)
    }
    val w = Window.partitionBy("id").orderBy(col("__d"), col("cell"))
    df.crossJoin(broadcast(centersDf)).withColumn("__d", d)
      .withColumn("__r", row_number().over(w)).where(col("__r") <= n)
      .select(col("id"), col("cell"), col("__d"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSeq.sortBy(x => (x._1, x._3, x._2))
  }

  private def kernelForm(centers: Seq[(Int, Seq[Double])],
      df: org.apache.spark.sql.DataFrame, n: Int)
      : Seq[(Long, Int, Double)] =
    df.withColumn("__p", explode(vecNearestCells(col("v"), centers, n)))
      .select(col("id"), col("__p.cell"), col("__p.__d"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSeq.sortBy(x => (x._1, x._3, x._2))

  // centers engineered so vector id 1 is EXACTLY equidistant from cells
  // 2 and 5 (the tie must break to cell 2), and a third center far away
  private val tieCenters = Seq(
    (5, Seq(2.0, 0.0)), (2, Seq(0.0, 2.0)), (9, Seq(100.0, 100.0)))

  test("kernel == window form: distances, tie-breaks, n=1") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 1.0)),   // tie between cells 2 and 5 -> cell 2
      (2L, Seq(2.1, 0.0)),
      (3L, Seq(99.0, 101.0)),
      (4L, Seq(-3.0, 0.5))).toDF("id", "v")
    assert(kernelForm(tieCenters, df, 1) === windowForm(tieCenters, df, 1))
    val tied = kernelForm(tieCenters, df, 1).find(_._1 == 1L).get
    assert(tied._2 === 2, "equal distances must break to the lower cell id")
  }

  test("kernel == window form: n=2 probes, and n past #centers truncates") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 1.0)), (2L, Seq(2.1, 0.0)),
      (3L, Seq(50.0, 50.0))).toDF("id", "v")
    assert(kernelForm(tieCenters, df, 2) === windowForm(tieCenters, df, 2))
    assert(kernelForm(tieCenters, df, 5) === windowForm(tieCenters, df, 5))
  }

  test("kernel == window form on float arrays (the testdata embedding type)") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 1.0f)), (2L, Seq(0.3f, -0.7f)),
      (3L, Seq(1e-7f, 2e7f))).toDF("id", "v")
    assert(kernelForm(tieCenters, df, 2) === windowForm(tieCenters, df, 2))
  }

  test("kernel orders probes (distance asc, cell asc) within one row") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 1.0))).toDF("id", "v")
    val picks = df.select(vecNearestCells(col("v"), tieCenters, 3).as("p"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getInt(1)))
    assert(picks === picks.sortBy(identity), s"unsorted probe list: $picks")
    assert(picks.map(_._2) === Seq(2, 5, 9))
  }

  // ---- the r14 MinHash kernels (shingleHash60s, MinhashSig) pinned to
  // the composable forms they replaced

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "a b"), // fewer than k words -> no shingles
    (4L, "x y z x y z x y z")) // repeated shingles -> in-doc dedup

  test("shingleHash60s == hash60 mapped over wordShingles, order included") {
    import spark.implicits._
    val df = docs.toDF("id", "text")
    val fused = df.select(col("id"), graft.functions.TextExpressions
        .shingleHash60s(col("text"), 3).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = df.select(col("id"),
        transform(graft.functions.TextExpressions.wordShingles(col("text"), 3),
          x => graft.pipeline.Dedup.hash60(x)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fused === composed)
    assert(fused(3L).isEmpty)
  }

  test("MinhashSig == the exploded groupBy min-aggregates, every perm") {
    import spark.implicits._
    val numPerm = 32
    val params = graft.pipeline.Dedup.permParams(numPerm)
    val prime = (1L << 31) - 1
    val df = docs.toDF("id", "text")
    val viaKernel = graft.pipeline.Dedup
      .minhashSignature(df, "id", "text", 3, numPerm)
      .collect().map(r =>
        r.getLong(0) -> (0 until numPerm).map(i => r.getLong(2 + i)))
      .toMap
    val viaAgg = df.select(col("id"),
        explode(graft.functions.TextExpressions
          .shingleHash60s(col("text"), 3)).as("h"))
      .withColumn("hb", pmod(col("h"), lit(prime)))
      .groupBy("id")
      .agg(params.map { case (a, b) =>
          min(pmod(col("hb") * a + b, lit(prime)))
        }.head, params.map { case (a, b) =>
          min(pmod(col("hb") * a + b, lit(prime)))
        }.tail: _*)
      .collect().map(r =>
        r.getLong(0) -> (0 until numPerm).map(i => r.getLong(1 + i)))
      .toMap
    assert(viaKernel === viaAgg)
    assert(!viaKernel.contains(3L), "shingle-less docs drop from signatures")
  }
}
