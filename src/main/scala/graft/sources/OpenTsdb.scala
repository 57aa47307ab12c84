package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** OpenTSDB telnet `put` line parser
  * (reference: OpenTSDBProtocolParser,
  * /root/reference/stdb/protocol/protocolparser.h:287-312).
  *
  * Line grammar: `put <metric> <ts> <value> <k=v> [<k=v> ...]`.
  * Timestamps may be seconds (OpenTSDB classic), milliseconds (OpenTSDB
  * 2.x) or raw nanoseconds; disambiguated by magnitude. Output `ts` is
  * Long UTC ns like everything else in the engine.
  *
  * The whole parse is `org.apache.spark.sql.functions` column algebra —
  * no UDFs — so it runs inside whole-stage codegen and applies identically
  * to a batch `spark.read.text` DataFrame and a Structured Streaming
  * `readStream` (socket/Kafka/file) DataFrame: parsing a 100 TB backlog
  * and tailing a live feed are the same code path.
  */
object OpenTsdb {

  /** Normalize an epoch number of unknown unit to ns. Thresholds: < 1e11
    * → seconds (covers dates to year 5138), < 1e14 → ms, < 1e17 → µs,
    * else ns. */
  def toNs(ts: Column): Column =
    when(ts < 100000000000L, ts * 1000000000L)
      .when(ts < 100000000000000L, ts * 1000000L)
      .when(ts < 100000000000000000L, ts * 1000L)
      .otherwise(ts)

  /** Parse a DataFrame with a string column `lineCol` of `put` lines into
    * `(name, metric, tags, ts, value)`. Malformed lines (wrong verb, short,
    * non-numeric ts/value) are dropped, matching the reference's per-line
    * error handling. Tag keys are sorted so `name` is canonical
    * (seriesparser.cc:112). */
  def parseLines(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val toks = split(trim(col(lineCol)), "\\s+")
    val parsed = lines
      .select(toks.as("t"))
      .where(col("t").getItem(0) === "put" && size(col("t")) >= 5)
      .select(
        col("t").getItem(1).as("metric"),
        col("t").getItem(2).cast(LongType).as("raw_ts"),
        col("t").getItem(3).cast(DoubleType).as("value"),
        // k=v tokens -> sorted entries -> map
        array_sort(filter(
          transform(slice(col("t"), 5, 28),
            p => struct(
              substring_index(p, "=", 1).as("key"),
              substring_index(p, "=", -1).as("value"))),
          e => e.getField("key").isNotNull && e.getField("key") =!= ""))
          .as("entries"))
      .where(col("raw_ts").isNotNull && col("value").isNotNull)
    parsed.select(
      concat_ws(" ",
        col("metric"),
        array_join(transform(col("entries"),
          e => concat_ws("=", e.getField("key"), e.getField("value"))), " "))
        .as("name"),
      col("metric"),
      map_from_entries(col("entries")).as("tags"),
      toNs(col("raw_ts")).as("ts"),
      col("value"))
  }

  /** The samples-fact projection of [[parseLines]] with the engine's stable
    * hash series ids (TsdbContext.fromWide uses the same xxhash64(name)). */
  def toSamples(lines: DataFrame, lineCol: String = "value"): DataFrame =
    parseLines(lines, lineCol)
      .select(xxhash64(col("name")).as("series_id"), col("ts"), col("value"))

  /** The catalog projection: distinct series seen in this batch/stream. */
  def toCatalog(lines: DataFrame, lineCol: String = "value"): DataFrame =
    parseLines(lines, lineCol)
      .select(xxhash64(col("name")).as("series_id"), col("name"),
        col("metric"), col("tags"))
      .dropDuplicates("series_id")
}
