package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Salting utilities: results identical to unsalted plans, hot keys spread. */
class SkewSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private lazy val big = (
    (1 to 1000).map(i => ("hot", i.toLong)) ++ // one dominant key
    (1 to 10).map(i => ("cold", i.toLong))
  ).toDF("k", "v")
  private lazy val dim = Seq(("hot", 2.0), ("cold", 3.0)).toDF("k", "w")

  test("saltedJoin equals the plain join") {
    val plain = big.join(dim, Seq("k")).select(sum($"v" * $"w")).as[Double].head()
    val salted = Skew.saltedJoin(big, dim, Seq("k"), n = 8)
      .select(sum($"v" * $"w")).as[Double].head()
    assert(salted === plain)
    assert(Skew.saltedJoin(big, dim, Seq("k"), 8).count() === big.count())
  }

  test("saltedJoin left keeps unmatched big rows exactly once") {
    val dimMissing = Seq(("cold", 3.0)).toDF("k", "w")
    val out = Skew.saltedJoin(big, dimMissing, Seq("k"), n = 4, joinType = "left")
    assert(out.count() === big.count())
    assert(out.where($"k" === "hot").where($"w".isNotNull).count() === 0)
  }

  test("withSalt is deterministic and bounded") {
    val s1 = Skew.withSalt(big, 8, Seq("k", "v")).select("__salt").as[Int].collect()
    val s2 = Skew.withSalt(big, 8, Seq("k", "v")).select("__salt").as[Int].collect()
    assert(s1.toSeq === s2.toSeq)
    assert(s1.forall(s => s >= 0 && s < 8))
    assert(s1.distinct.length > 1) // actually spreads
  }

  test("asof join picks the latest right row at or before each left ts") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 20L, 200.0), (1L, 30L, 300.0))
      .toDF("k", "ts", "v")
    val out = graft.ops.TimeJoins.asof(left, right, Seq("k"), Seq("v"))
      .orderBy("k", "ts").select("k", "ts", "tag", "v")
      .as[(Long, Long, String, Option[Double])].collect().toSeq
    assert(out === Seq(
      (1L, 10L, "a", Some(100.0)), // latest right <= 10 is ts=5
      (1L, 25L, "b", Some(200.0)), // ts=20
      (2L, 5L, "c", None))) // no right rows for k=2
  }

  test("asof join with equal timestamps matches (<= semantics)") {
    val left = Seq((1L, 20L, "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, 20L, 7.0)).toDF("k", "ts", "v")
    val out = graft.ops.TimeJoins.asof(left, right, Seq("k"), Seq("v"))
      .select("v").as[Option[Double]].head()
    assert(out === Some(7.0))
  }

  test("asof join tolerance voids stale matches") {
    val left = Seq((1L, 100L, "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 7.0)).toDF("k", "ts", "v")
    val hit = graft.ops.TimeJoins.asof(left, right, Seq("k"), Seq("v"),
      toleranceNs = Some(95L)).select("v").as[Option[Double]].head()
    val miss = graft.ops.TimeJoins.asof(left, right, Seq("k"), Seq("v"),
      toleranceNs = Some(50L)).select("v").as[Option[Double]].head()
    assert(hit === Some(7.0))
    assert(miss === None)
  }

  test("range join pairs points with containing intervals exactly once") {
    val pts = Seq((1L, 5L, "p1"), (1L, 15L, "p2"), (1L, 25L, "p3"))
      .toDF("k", "ts", "tag")
    // overlapping intervals spanning bucket boundaries (bucket = 10)
    val ivs = Seq((1L, 0L, 20L, "w1"), (1L, 10L, 30L, "w2"))
      .toDF("k", "start", "end", "w")
    val out = graft.ops.TimeJoins.rangeJoin(pts, ivs, Seq("k"), bucketNs = 10L)
      .select("tag", "w").as[(String, String)].collect().toSet
    assert(out === Set(
      ("p1", "w1"), // 5 in [0,20) only
      ("p2", "w1"), ("p2", "w2"), // 15 in both
      ("p3", "w2"))) // 25 in [10,30) only
  }

  test("saltedAgg equals direct aggregation") {
    val direct = big.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .orderBy("k").as[(String, Long, Long)].collect()
    val salted = Skew.saltedAgg(big, Seq("k"), n = 8, Seq(
      ("s", sum("v"), (c: org.apache.spark.sql.Column) => sum(c)),
      ("c", count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c))))
      .orderBy("k").as[(String, Long, Long)].collect()
    assert(salted.toSeq === direct.toSeq)
  }
}
