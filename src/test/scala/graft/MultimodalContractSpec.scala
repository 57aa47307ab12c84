package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.pipeline.Multimodal

/** The pluggable-featurizer CONTRACT ([[Multimodal.extractFeatures]]'s
  * "swap point" scaladoc): a real model replaces only the per-row
  * function and the per-partition setup; everything a caller can
  * observe — schema, laziness, partitioning-invariance — is pinned
  * here, so the drop-in cannot silently change the boundary. The
  * default byte-fold path is the declared environmental stand-in (no
  * model weights exist in this container); these tests are about the
  * BOUNDARY, not the math (the weight-path math is proven in
  * PipelineSpec against a hand-computed tanh(W·x)). */
class MultimodalContractSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def blobs(n: Int, parts: Int) =
    (1 to n).map(i => (i.toLong, Array.fill(8)((i % 251).toByte)))
      .toDF("id", "bytes").repartition(parts)

  test("contract: output schema is exactly (id long, features array<double>) on BOTH paths") {
    val expected = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false),
        nullable = true)))
    val stub = Multimodal.extractFeatures(blobs(4, 2), "id", "bytes", dim = 4)
    val real = Multimodal.extractFeatures(blobs(4, 2), "id", "bytes", dim = 4,
      weights = Some(Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))))
    assert(stub.schema === expected,
      "downstream (fitCodebook/knn*) consumes this schema positionally")
    assert(real.schema === expected,
      "a swapped-in model must emit the same schema — callers untouched")
  }

  test("contract: the kernel streams the partition iterator lazily — a limit pulls rows, never the partition") {
    // a real model streams a 100 TB partition through in batches; a
    // drop-in that materializes the iterator (toList/toArray before
    // mapping) would OOM there. Pin it: with everything in one
    // pipelined stage, limit(1) must consume a handful of input rows,
    // not all 10k
    val acc = spark.sparkContext.longAccumulator("consumed")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = true)))
    val rdd = spark.sparkContext.parallelize(1 to 10000, 1).map { i =>
      acc.add(1); Row(i.toLong, Array.fill(4)(i.toByte))
    }
    val df = spark.createDataFrame(rdd, schema)
    Multimodal.extractFeatures(df, "id", "bytes", dim = 4).limit(1).collect()
    assert(acc.value < 1000,
      s"limit(1) consumed ${acc.value} of 10000 input rows — the kernel " +
        "must map the iterator lazily, never materialize the partition")
  }

  test("contract: features are a pure function of (bytes, weights) — repartitioning cannot change the result") {
    val w = Some(Seq(Seq(0.5, -1.0, 2.0, 0.0, 1.0, 1.0, -0.5, 0.25)))
    def run(parts: Int): Set[(Long, Seq[Double])] =
      Multimodal.extractFeatures(blobs(64, parts), "id", "bytes",
          dim = 8, weights = w)
        .as[(Long, Seq[Double])].collect().toSet
    assert(run(1) === run(7),
      "per-element state leaking across rows (a stateful model misuse) " +
        "would make the result depend on partitioning")
  }

  test("contract: per-element code cannot touch the session — the kernel runs where executors run") {
    // the closure already runs through Spark's serializer; what this
    // pins is that the OUTPUT doesn't secretly depend on driver-side
    // state: a fresh equivalent input frame built through a different
    // lineage yields the identical feature rows
    val a = Multimodal.extractFeatures(blobs(16, 2), "id", "bytes", dim = 4)
      .as[(Long, Seq[Double])].collect().toSet
    val b = Multimodal.extractFeatures(
        (1 to 16).map(i => (i.toLong, Array.fill(8)((i % 251).toByte)))
          .toDF("id", "bytes"),
        "id", "bytes", dim = 4)
      .as[(Long, Seq[Double])].collect().toSet
    assert(a === b)
  }
}
