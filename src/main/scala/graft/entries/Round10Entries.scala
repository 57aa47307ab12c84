package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 driver entries: the persisted index catalog — statements
  * served through a registration LOADED from storage
  * ([[graft.model.IndexCatalog]]), sharing one oracle each with their
  * hand-wired twins because the catalog hop must change nothing.
  */
object Round10Entries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // group-aggregate served through a LOADED index catalog: the hourly
    // rollup was built, SAVED (parquet + manifest) and re-registered by
    // IndexCatalog.load onto a fresh base context — the restart path the
    // reference covers with its sqlite metastorage (meta_storage.h:44+).
    // Same statement and oracle as ts_group_aggregate_rollup: loading a
    // registration from storage is invisible to answers
    "ts_group_aggregate_catalog" -> ((s, dir) =>
      EntryUtil.usView(EntryUtil.engineCatalogFor(s, dir).execute(
        s"""{"group-aggregate": {"metric": "purchase", "step": "1d",
                                 "func": ["min", "max", "cnt"]},
             "range": {"from": "20240101T003000", "to": "20240331T233000"}}"""),
        valueCols = Seq("min", "max", "cnt"))),

    // the anomaly statement served from the LOADED med/MAD index — the
    // second family through the same catalog round-trip, proving load
    // reconstructs parameterized IndexDefs (build range), not just
    // step-keyed frames; one oracle with ts_anomaly_json_indexed
    "ts_anomaly_catalog" -> ((s, dir) =>
      EntryUtil.engineCatalogFor(s, dir).execute(
        s"""{"anomaly": {"metric": "purchase", "c": 3.0},
             "range": {"from": "${EntryUtil.FromIso}", "to": "${EntryUtil.ToIso}"}}""")))

  // lazy: references sibling entry objects' oracle maps, and cross-object
  // initialization order at JVM clinit is otherwise circular
  lazy val oracle: Map[String, String] = Map(
    // catalog-loaded = hand-wired exactly — one replay each
    "ts_group_aggregate_catalog" ->
      Round2Entries.oracle("ts_group_aggregate_rollup"),
    "ts_anomaly_catalog" -> Round9Entries.oracle("ts_anomaly_json_indexed"))
}
