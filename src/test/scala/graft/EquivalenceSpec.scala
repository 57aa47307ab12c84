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
          "where-location": {"knn": {"lon": 10.0, "lat": 10.0, "k": 5}}}""")

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
}
