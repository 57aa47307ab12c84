package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import graft.query.Ast.{BadQuery, OutputSpec}

/** Sink-side rendering of a final query frame — the `output` clause
  * (reference: RESP or CSV formatting at the query sink,
  * queryparser.cc:933; RESP element grammar resp.h:34-46).
  *
  * Pure column algebra (concat over the row's columns), so rendering is
  * distributed and codegen'd — the formatted lines can stream straight to
  * any sink without a driver-side loop. Column convention matches every
  * engine output: `series`, `ts` (Long UTC ns), then one or more value
  * columns; absent tuple slots render as the empty string.
  */
object OutputFormat {

  /** Render one line per row.
    *   - csv:  `series,timestamp,v1[,v2...]`
    *   - resp: `+series\r\n:<raw ts>\r\n` (or `+<iso ts>\r\n`) then one
    *     `+value\r\n` element per value column
    */
  def render(df: DataFrame, spec: OutputSpec): Dataset[String] = {
    val valueCols = df.columns.filterNot(c => c == "series" || c == "ts").toSeq
    val tsStr: Column = spec.timestamp match {
      case "raw" => col("ts").cast("string")
      case "iso" => isoBasic(col("ts"))
      case other => throw new BadQuery(s"bad output timestamp format: '$other'")
    }
    def v(c: String): Column = coalesce(col(c).cast("string"), lit(""))
    val line = spec.format match {
      case "csv" =>
        concat_ws(",", (col("series") +: tsStr +: valueCols.map(v)): _*)
      case "resp" =>
        val tsEl =
          if (spec.timestamp == "raw") concat(lit(":"), tsStr, lit("\r\n"))
          else concat(lit("+"), tsStr, lit("\r\n"))
        val els = concat(lit("+"), col("series"), lit("\r\n")) +: tsEl +:
          valueCols.map(c => concat(lit("+"), v(c), lit("\r\n")))
        concat(els: _*)
      case other => throw new BadQuery(s"bad output format: '$other'")
    }
    df.select(line.as("line")).as[String](Encoders.STRING)
  }

  /** ISO-8601 basic `YYYYMMDDThhmmss.nnnnnnnnn` (UTC) from a Long-ns
    * column — the column twin of [[graft.time.TimeUtil.toIsoBasic]]. */
  def isoBasic(tsNs: Column): Column = {
    val sec = graft.functions.VectorExpressions.longDiv(tsNs, 1000000000L)
    concat(
      date_format(timestamp_seconds(sec), "yyyyMMdd'T'HHmmss"),
      lit("."), lpad(pmod(tsNs, lit(1000000000L)).cast("string"), 9, "0"))
  }
}
