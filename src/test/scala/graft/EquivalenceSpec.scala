package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model.{TsdbContext, TsdbLayout}

/** Independent-implementation cross-checks: the same query must produce
  * identical rows over the flat context and over the partitioned
  * physical layout (different scan paths, partition pruning, extra
  * columns). Round-1 lesson: this class of equivalence test caught a
  * real ts-collapse bug the oracle missed. */
class EquivalenceSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val flatCtx = TsdbContext.fromTestdata(spark, sfDir)
  private lazy val layoutCtx = {
    val path = java.nio.file.Files.createTempDirectory("graft_equiv").toString
    TsdbLayout.writeSamples(flatCtx, s"$path/samples")
    TsdbLayout.contextOver(spark, s"$path/samples", flatCtx.series, flatCtx.events)
  }

  private val queries = Seq(
    "select scan" ->
      """{"select": "purchase",
          "range": {"from": "20240101T000000", "to": "20240401T000000"},
          "order-by": "series"}""",
    "group-aggregate" ->
      """{"group-aggregate": {"metric": "purchase", "step": "7d",
                              "func": ["min", "max", "cnt"]},
          "range": {"from": "20240101T000000", "to": "20240401T000000"}}""",
    "join" ->
      """{"join": ["click", "view"],
          "range": {"from": "20240101T000000", "to": "20240401T000000"}}""",
    "aggregate all funcs" ->
      """{"aggregate": {"purchase": ["min", "max", "sum", "cnt", "mean"]},
          "range": {"from": "20240101T000000", "to": "20240401T000000"}}""",
    "apply chain" ->
      """{"select": "purchase",
          "range": {"from": "20240101T000000", "to": "20240401T000000"},
          "apply": [{"name": "sma", "window-width": 3}, {"name": "cusum"}]}""",
    "where-location box" ->
      """{"select": "purchase",
          "range": {"from": "20240101T000000", "to": "20240401T000000"},
          "where-location": {"box": {"lon": [-60, 60], "lat": [-40, 40]}}}""",
    "where-location knn aggregate" ->
      """{"aggregate": {"purchase": "sum"},
          "range": {"from": "20240101T000000", "to": "20240401T000000"},
          "where-location": {"knn": {"lon": 10.0, "lat": 10.0, "k": 5}}}""",
    // relies on the fixture having no duplicate (series, ts) on the right
    // metric (true of the generated testdata): tied right rows make the
    // carried value implementation-defined, as the brute-force test below
    // documents by construction
    "asof-join" ->
      """{"asof-join": {"left": "click", "right": "view"},
          "range": {"from": "20240101T000000", "to": "20240401T000000"}}""")

  /** Doubles rounded to 6 decimals — the two layouts feed sums in
    * different row orders, so sum/mean differ in the last ulp (FP
    * addition is not associative); same tolerance as the oracle gate. */
  private def norm(row: Seq[Any]): Seq[Any] = row.map {
    case d: Double => BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_EVEN)
    case x => x
  }

  for ((name, json) <- queries)
    test(s"flat and partitioned layouts agree: $name") {
      val flat = new Engine(flatCtx).execute(json)
        .collect().map(r => norm(r.toSeq)).sortBy(_.toString)
      val layered = new Engine(layoutCtx).execute(json)
        .collect().map(r => norm(r.toSeq)).sortBy(_.toString)
      assert(flat.nonEmpty)
      assert(layered.toSeq === flat.toSeq)
    }

  test("asof-join equals a brute-force reference on random duplicate-heavy data") {
    import spark.implicits._
    import graft.query.Ast._
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      // left rows may share (tag, ts); right (tag, ts) kept unique —
      // duplicate right timestamps make the carried value ambiguous by
      // construction (any implementation is free to pick either)
      val tags = Seq("T0", "T1", "T2")
      val lRows = Seq.fill(40)(("l", tags(rnd.nextInt(3)),
        rnd.nextInt(30).toLong, rnd.nextInt(1000).toDouble))
      val rRows = rnd.shuffle(
        (for (t <- tags; ts <- 0L to 30L) yield (t, ts)).toList)
        .take(25)
        .map { case (t, ts) => ("r", t, ts, rnd.nextInt(1000).toDouble) }
      val wide = (lRows ++ rRows).toDF("metric", "tag", "ts", "value")
      val eng = new Engine(TsdbContext.fromWide(
        spark, wide, "metric", Seq("tag"), "ts", "value"))
      val got = eng.asofJoin(AsofJoinQuery("l", "r", TimeRange(0, 100)))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(_.toString).toSeq
      val expect = lRows.map { case (_, t, ts, v) =>
        val matches = rRows.filter(r => r._2 == t && r._3 <= ts)
        val carried =
          if (matches.isEmpty) None
          else Some(matches.maxBy(_._3)._4)
        (s"l|r tag=$t", ts, v, carried)
      }.sortBy(_.toString)
      assert(got === expect, s"round $round")
    }
  }
}
