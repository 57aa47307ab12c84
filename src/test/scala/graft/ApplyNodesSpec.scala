package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.ops.ApplyNodes
import graft.query.Ast.ApplySpec

/** Per-node unit tests of the apply pipeline — the Spark mirror of the
  * reference's per-node suites under stdb/query/query_processing (each
  * node fed hand-built samples, outputs asserted exactly). */
class ApplyNodesSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** One series, ts 1..n, given values. */
  private def scalarDf(values: Seq[Double], series: String = "s"): DataFrame =
    values.zipWithIndex.map { case (v, i) => (series, (i + 1).toLong, v) }
      .toDF("series", "ts", "value")

  private def run(df: DataFrame, spec: ApplySpec, cols: Seq[String] = Seq("value")) =
    ApplyNodes.node(df, spec, cols)._1

  private def values(df: DataFrame): Seq[Double] =
    df.orderBy("ts").select("value").as[Double].collect().toSeq

  test("abs (absolute_test.cc)") {
    val out = run(scalarDf(Seq(-1.0, 2.0, -3.5)), ApplySpec("abs", Map.empty))
    assert(values(out) === Seq(1.0, 2.0, 3.5))
  }

  test("scale multiplies per-slot weights (scale_test.cc)") {
    val out = run(scalarDf(Seq(1.0, 2.0)),
      ApplySpec("scale", Map("weights" -> Seq(2.5))))
    assert(values(out) === Seq(2.5, 5.0))
  }

  test("rate: Δx/Δt per second with (0,0) seed (rate_test.cc)") {
    val df = Seq(("s", 1000000000L, 5.0), ("s", 3000000000L, 9.0))
      .toDF("series", "ts", "value")
    val out = run(df, ApplySpec("rate", Map.empty))
    assert(values(out) === Seq(5.0, 2.0)) // 5/1s, then 4/2s
  }

  test("cusum accumulates per series") {
    val out = run(scalarDf(Seq(1.0, 2.0, 3.0)), ApplySpec("cusum", Map.empty))
    assert(values(out) === Seq(1.0, 3.0, 6.0))
  }

  test("sma: mean of previous N, zero-padded (sliding_window_test.cc)") {
    val out = run(scalarDf(Seq(10.0, 20.0, 30.0)),
      ApplySpec("sma", Map("window-width" -> 2.0)))
    assert(values(out) === Seq(0.0, 5.0, 15.0)) // (0+0)/2, (0+10)/2? no: buffer holds last 2
  }

  test("cma: expanding mean") {
    val out = run(scalarDf(Seq(2.0, 4.0, 9.0)), ApplySpec("cma", Map.empty))
    assert(values(out) === Seq(2.0, 3.0, 5.0))
  }

  test("ewma: first 11 outputs echo input, then prediction (sliding_window.cc:7-103)") {
    val xs = (1 to 13).map(_.toDouble)
    val out = values(run(scalarDf(xs), ApplySpec("ewma", Map("decay" -> 0.5))))
    assert(out.take(11) === xs.take(11))
    val mean11 = xs.take(11).sum / 11
    val v11 = 0.5 * xs(10) + 0.5 * mean11
    assert(math.abs(out(11) - v11) < 1e-12) // 12th output = state after 11 adds
    val v12 = 0.5 * xs(11) + 0.5 * v11
    assert(math.abs(out(12) - v12) < 1e-12)
  }

  test("math sum folds tuple slots with ignore_missing unit (math_test.cc)") {
    val df = Seq(("s", 1L, Some(1.0), Some(2.0)), ("s", 2L, None, Some(5.0)))
      .toDF("series", "ts", "a", "b")
    val out = run(df, ApplySpec("sum", Map("ignore_missing" -> true)), Seq("a", "b"))
    assert(values(out) === Seq(3.0, 5.0))
  }

  test("math sum without ignore_missing yields NaN on absent slots") {
    val df = Seq[(String, Long, Option[Double], Option[Double])](
      ("s", 1L, None, Some(5.0))).toDF("series", "ts", "a", "b")
    val out = run(df, ApplySpec("sum", Map.empty), Seq("a", "b"))
    assert(values(out).head.isNaN)
  }

  test("eval: expression over tuple metric names; NaN rows dropped (eval_test.cc)") {
    val df = Seq(("s", 1L, Some(2.0), Some(3.0)), ("s", 2L, None, Some(4.0)))
      .toDF("series", "ts", "cpu.user", "cpu.sys")
    val out = run(df, ApplySpec("eval", Map("expr" -> "cpu.user + 2*cpu.sys")),
      Seq("cpu.user", "cpu.sys"))
    assert(values(out) === Seq(8.0)) // row 2 drops: null slot -> null result
  }

  test("eval: one metric a substring of another quotes cleanly") {
    val df = Seq(("s", 1L, Some(2.0), Some(3.0)))
      .toDF("series", "ts", "cpu.user", "cpu")
    val out = run(df, ApplySpec("eval", Map("expr" -> "cpu.user + cpu")),
      Seq("cpu.user", "cpu"))
    assert(values(out) === Seq(5.0))
    // metric names inside other identifiers stay untouched ("ab" in "abs"),
    // while a standalone reference — even as a function argument — is quoted
    assert(ApplyNodes.quoteMetricRefs("abs(ab) + ab", Seq("ab"))
      === "abs(`ab`) + `ab`")
    assert(ApplyNodes.quoteMetricRefs("cpu.user + cpu", Seq("cpu.user", "cpu"))
      === "`cpu.user` + `cpu`")
  }

  test("ewma on tuple stream passes null slots through without advancing state") {
    // slot 'a' missing at ts=2: output keeps the null and the EWMA state for
    // 'a' is unaffected (warm-up echo continues as if row 2 never happened)
    val df = Seq[(String, Long, Option[Double], Option[Double])](
      ("s", 1L, Some(1.0), Some(10.0)),
      ("s", 2L, None, Some(20.0)),
      ("s", 3L, Some(3.0), Some(30.0))
    ).toDF("series", "ts", "a", "b")
    val out = run(df, ApplySpec("ewma", Map("decay" -> 0.5)), Seq("a", "b"))
      .orderBy("ts")
    val rows = out.select("a", "b").collect()
    assert(rows(0).getDouble(0) === 1.0 && rows(0).getDouble(1) === 10.0)
    assert(rows(1).isNullAt(0) && rows(1).getDouble(1) === 20.0)
    assert(rows(2).getDouble(0) === 3.0 && rows(2).getDouble(1) === 30.0)
  }

  test("top: N series by time-weighted sum (top_test.cc)") {
    val df = Seq(
      ("a", 0L, 1.0), ("a", 2000000000L, 1.0), // a: 1.0 over 2s = 2.0
      ("b", 0L, 10.0), ("b", 1000000000L, 10.0) // b: 10 over 1s = 10.0
    ).toDF("series", "ts", "value")
    val out = run(df, ApplySpec("top", Map("N" -> 1.0)))
    assert(out.select("series").as[String].collect().toSeq === Seq("b"))
  }

  test("heavy-hitters: weighted share above portion-error (spacesaver_test.cc)") {
    val df = Seq(("a", 1L, 80.0), ("b", 2L, 15.0), ("c", 3L, 5.0))
      .toDF("series", "ts", "value")
    val out = run(df, ApplySpec("heavy-hitters",
      Map("portion" -> 0.2, "error" -> 0.05)))
    assert(out.select("series").as[String].collect().toSeq === Seq("a"))
  }

  test("frequent-items counts occurrences, not weights") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 1.0), ("a", 3L, 1.0), ("b", 4L, 99.0))
      .toDF("series", "ts", "value")
    val out = run(df, ApplySpec("frequent-items",
      Map("portion" -> 0.6, "error" -> 0.1)))
    assert(out.select("series").as[String].collect().toSeq === Seq("a"))
  }

  test("CMS-sketch frequent keys are a superset of the exact hitters") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(5)("c"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "i")
    val approx = graft.ops.Sketches.frequentKeys(df, "k", portion = 0.3, error = 0.05)
      .select("k").as[String].collect().toSet
    assert(approx.contains("a")) // 50/85 ≈ 0.59
    assert(approx.contains("b")) // 30/85 ≈ 0.35
    // CMS overestimates only: never misses a true hitter; c (0.06) may
    // appear under collision but not here at default accuracy
    assert(!approx.contains("c"))
  }

  test("KMV distinct estimate lands within 3 standard errors; small groups exact") {
    // group "big": 10k distinct values (k=256 → SE ≈ 6.3%); group
    // "small": 9 distinct < k → must report exactly. Duplicates in the
    // input must not shift either (the sketch sees DISTINCT hashes).
    val rows = (1 to 10000).map(i => ("big", s"v$i")) ++
      (1 to 9).flatMap(i => Seq.fill(3)(("small", s"w$i")))
    val df = rows.toDF("g", "v")
    val out = graft.ops.Sketches.kmvDistinct(df, "g", "v", k = 256)
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    val (bigN, bigEst) = (out(0)._2, out(0)._3)
    assert(bigN === 256L)
    assert(math.abs(bigEst - 10000.0) / 10000.0 < 3 * 0.063,
      s"estimate $bigEst too far from 10000")
    assert(out(1) === (("small", 9L, 9.0)))
  }

  test("KMV rollup: per-window index merges to the direct sketch exactly") {
    // k-min hash SETS merge losslessly: any hash among the union's k
    // minimal is among its own window's k minimal — so serving from the
    // per-window index must equal the direct sketch row-for-row, both
    // over the full window set and over any window subset
    val rows = (1 to 5000).map(i => (s"g${i % 2}", (i % 7).toLong, s"v${i % 900}"))
    val df = rows.toDF("g", "w", "v")
    val idx = graft.ops.Sketches.kmvIndex(df, "g", "w", "v", k = 64)
    val served = graft.ops.Sketches.kmvServe(idx, "g", k = 64)
      .orderBy("g").collect().toSeq
    val direct = graft.ops.Sketches.kmvDistinct(df, "g", "v", k = 64)
      .orderBy("g").collect().toSeq
    assert(served === direct)
    val sub = graft.ops.Sketches.kmvServe(idx.where(idx("w") <= 3), "g", k = 64)
      .orderBy("g").collect().toSeq
    val directSub = graft.ops.Sketches.kmvDistinct(
        df.where(df("w") <= 3), "g", "v", k = 64)
      .orderBy("g").collect().toSeq
    assert(sub === directSub)
  }

  test("KMV's k-smallest filter is map-side (WindowGroupLimit)") {
    val df = (1 to 500).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "v")
    val p = graft.ops.Sketches.kmvDistinct(df, "g", "v", k = 16)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"k-smallest per group must push below the shuffle:\n$p")
  }

  test("CMS builder reads its input in ONE pass (total folded into sketch agg)") {
    val execs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        execs.incrementAndGet()
      def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = Seq.fill(40)("a").zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "i")
      graft.ops.Sketches.frequentKeys(df, "k", portion = 0.3, error = 0.05)
      // the build (count + sketch) must be one action; the returned probe
      // frame is lazy, so nothing else has executed yet. Listener callbacks
      // are async — poll until delivered.
      val deadline = System.nanoTime() + 10_000_000_000L
      while (execs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(execs.get() === 1,
        s"expected exactly 1 execution for the CMS build, saw ${execs.get()}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("CMS candidates contract: a supplied catalog avoids rescanning the input") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    Seq.fill(40)("a").zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "i").write.mode("overwrite").parquet(dir)
    val big = spark.read.parquet(dir)
    // with a candidate catalog: the probe frame never touches the input
    val probe = graft.ops.Sketches.frequentKeys(big, "k",
      portion = 0.3, error = 0.05, candidates = Some(Seq("a", "b").toDF("k")))
    assert(probe.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }.isEmpty,
      "probing a supplied candidate set must not rescan the input")
    assert(probe.select("k").as[String].collect().toSet === Set("a"))
    // default candidates = df.distinct(): the probe re-reads the input —
    // fine at catalog scale, the documented misuse at 100 TB
    val dflt = graft.ops.Sketches.frequentKeys(big, "k",
      portion = 0.3, error = 0.05)
    assert(dflt.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }.nonEmpty)
  }

  test("tsdb context registers SQL views") {
    val ctx = rampContext(Seq(1), 0, 10)
    ctx.registerViews("t_")
    assert(spark.sql("SELECT count(*) FROM t_samples").as[Long].head() === 10L)
    assert(spark.sql(
      """SELECT count(*) FROM t_samples s JOIN t_series c USING (series_id)
         WHERE c.metric = 'test'""").as[Long].head() === 10L)
  }

  test("chained nodes compose in JSON order") {
    val out = ApplyNodes.chain(scalarDf(Seq(-2.0, 3.0)),
      Seq(ApplySpec("abs", Map.empty), ApplySpec("cusum", Map.empty)), Seq("value"))
    assert(values(out) === Seq(2.0, 5.0))
  }

  test("unknown node is rejected") {
    assertThrows[IllegalArgumentException](
      run(scalarDf(Seq(1.0)), ApplySpec("bogus", Map.empty)))
  }

  test("fill ffill: grid gaps inserted and carried forward per series") {
    // series s: ts 10,40 (grid step 10 -> inserted 20,30); series t: 10 only
    val df = Seq(("s", 10L, 1.0), ("s", 40L, 4.0), ("t", 10L, 9.0))
      .toDF("series", "ts", "value")
    val out = run(df, ApplySpec("fill", Map("step" -> "10n", "method" -> "ffill")))
      .orderBy("series", "ts")
      .as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(("s", 10L, 1.0), ("s", 20L, 1.0), ("s", 30L, 1.0),
      ("s", 40L, 4.0), ("t", 10L, 9.0)))
  }

  test("fill linear: interpolates between surrounding present points") {
    val df = Seq(("s", 10L, 1.0), ("s", 40L, 4.0)).toDF("series", "ts", "value")
    val out = run(df, ApplySpec("fill", Map("step" -> "10n", "method" -> "linear")))
      .orderBy("ts").as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(("s", 10L, 1.0), ("s", 20L, 2.0), ("s", 30L, 3.0),
      ("s", 40L, 4.0)))
  }

  test("fill: off-grid originals pass through untouched") {
    val df = Seq(("s", 10L, 1.0), ("s", 25L, 7.0), ("s", 30L, 3.0))
      .toDF("series", "ts", "value")
    val out = run(df, ApplySpec("fill", Map("step" -> "10n")))
      .orderBy("ts").as[(String, Long, Double)].collect().toSeq
    // grid 10,20,30: 20 inserted (ffill 1.0); off-grid 25 kept as-is
    assert(out === Seq(("s", 10L, 1.0), ("s", 20L, 1.0), ("s", 25L, 7.0),
      ("s", 30L, 3.0)))
  }

  test("fill on tuple streams: each slot fills independently, absent edges stay null") {
    // two slots; slot b has no value until ts 30 -> its leading grid rows
    // stay null (absent), slot a carries forward
    val df = Seq(("s", 10L, Some(1.0), None: Option[Double]),
        ("s", 30L, None: Option[Double], Some(5.0)))
      .toDF("series", "ts", "a", "b")
    val out = run(df, ApplySpec("fill", Map("step" -> "10n")), cols = Seq("a", "b"))
      .orderBy("ts")
      .as[(String, Long, Option[Double], Option[Double])].collect().toSeq
    assert(out === Seq(
      ("s", 10L, Some(1.0), None),
      ("s", 20L, Some(1.0), None),
      ("s", 30L, Some(1.0), Some(5.0))))
  }

  test("fill rejects bad step/method") {
    val df = scalarDf(Seq(1.0))
    assertThrows[IllegalArgumentException](
      run(df, ApplySpec("fill", Map.empty)))
    assertThrows[IllegalArgumentException](
      run(df, ApplySpec("fill", Map("step" -> "10n", "method" -> "cubic"))))
  }
}
