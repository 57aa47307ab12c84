package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.OutputFormat
import graft.query.Ast.{BadQuery, OutputSpec}
import graft.query.QueryParser

/** Golden-string tests for the `output` clause rendering sink. */
class OutputFormatSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val jan1Ns = 1704067200000000000L // 2024-01-01T00:00:00 UTC

  private def frame = Seq(
    ("cpu user=1", jan1Ns, Some(42.5)),
    ("cpu user=2", jan1Ns + 1500L, None)
  ).toDF("series", "ts", "value")

  test("csv with raw timestamps") {
    val lines = OutputFormat.render(frame, OutputSpec("csv", "raw"))
      .collect().sorted.toSeq
    assert(lines === Seq(
      "cpu user=1,1704067200000000000,42.5",
      "cpu user=2,1704067200000001500,"))
  }

  test("csv with ISO-basic timestamps keeps ns precision") {
    val lines = OutputFormat.render(frame, OutputSpec("csv", "iso"))
      .collect().sorted.toSeq
    assert(lines === Seq(
      "cpu user=1,20240101T000000.000000000,42.5",
      "cpu user=2,20240101T000000.000001500,"))
    // matches the driver-side renderer exactly
    assert(graft.time.TimeUtil.toIsoBasic(jan1Ns + 1500L)
      === "20240101T000000.000001500")
  }

  test("resp renders the reference element grammar") {
    val lines = OutputFormat.render(frame, OutputSpec("resp", "raw"))
      .collect().sorted.toSeq
    assert(lines === Seq(
      "+cpu user=1\r\n:1704067200000000000\r\n+42.5\r\n",
      "+cpu user=2\r\n:1704067200000001500\r\n+\r\n"))
  }

  test("multi-slot frames render one value element per slot") {
    val df = Seq[(String, Long, Option[Double], Option[Double])](
      ("a|b u=1", 5L, Some(1.0), None))
      .toDF("series", "ts", "a", "b")
    assert(OutputFormat.render(df, OutputSpec("csv", "raw")).collect().toSeq
      === Seq("a|b u=1,5,1.0,"))
    assert(OutputFormat.render(df, OutputSpec("resp", "raw")).collect().toSeq
      === Seq("+a|b u=1\r\n:5\r\n+1.0\r\n+\r\n"))
  }

  test("rendered RESP re-parses through the RESP ingestion parser") {
    // closed loop: output -> wire -> ingestion recovers the samples
    val df = Seq(("cpu user=1", 5L, 42.5), ("cpu user=2", 7L, -1.25))
      .toDF("series", "ts", "value")
    val payload = OutputFormat.render(df, OutputSpec("resp", "raw"))
      .collect().sorted.mkString
    val records = graft.sources.Resp.parse(payload)
    assert(records.toSet === Set(
      graft.sources.Resp.Sample("cpu user=1", 5L, 42.5),
      graft.sources.Resp.Sample("cpu user=2", 7L, -1.25)))
  }

  test("output clause parses with defaults and rejects bad values") {
    assert(QueryParser.parseOutputSpec("""{"select": "m"}""")
      === OutputSpec("resp", "raw"))
    assert(QueryParser.parseOutputSpec(
      """{"select": "m", "output": {"format": "csv", "timestamp": "iso"}}""")
      === OutputSpec("csv", "iso"))
    intercept[BadQuery](QueryParser.parseOutputSpec(
      """{"output": {"format": "xml"}}"""))
    intercept[BadQuery](QueryParser.parseOutputSpec(
      """{"output": {"timestamp": "unix"}}"""))
  }

  test("engine executeRendered wires the clause end-to-end") {
    val ctx = rampContext(Seq(1), 100, 103)
    val lines = new graft.engine.Engine(ctx).executeRendered(
      """{"select": "test", "range": {"from": 100, "to": 103},
         "output": {"format": "csv"}}""")
      .collect().toSeq
    assert(lines === Seq(
      "test tag=T1,100,10.0",
      "test tag=T1,101,10.100000000000001",
      "test tag=T1,102,10.200000000000001"))
  }
}
