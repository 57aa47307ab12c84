package graft.model

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.SparkSession

/** Persisted index catalog — the save/load half of index registration.
  *
  * Six index families serve statements ([[TsdbContext]].rollups /
  * histograms / bucketSums / kmvIndexes / madIndexes / gapIndexes), but
  * registration is construction-time wiring: nothing records WHICH
  * indexes exist, at what parameters, over which ranges. This module
  * closes that gap: [[save]] writes every registered index's frame to
  * parquet under one directory plus a single JSON-lines manifest of
  * (kind, path, params); [[load]] reconstructs the registration onto a
  * base context, after which [[graft.engine.Engine]]'s constructor
  * shape guards re-validate every frame exactly as they do for
  * hand-wired registration. A restarted engine no longer re-derives
  * its registration from code, and an operator can list / add / retire
  * indexes by editing storage, not redeploying.
  *
  * The reference persists exactly this kind of state in its sqlite
  * metastorage (/root/reference/stdb/metastorage/meta_storage.h:44+ —
  * series, configs and volumes survive restart); parquet + one
  * manifest file is the Spark-native analog: the index DATA is already
  * columnar and distributed, only the small registration record needs
  * a driver-readable file.
  *
  * Failure contract mirrors engine construction: a manifest that is
  * malformed, truncated, version-skewed, of unknown kind, or missing a
  * required parameter fails LOUDLY at load — never a silently smaller
  * registration. Parameters round-trip exactly: longs verbatim,
  * doubles via shortest-round-trip decimal (so [[GapIndexDef.factor]]'s
  * bit-exact serve-time match survives the catalog hop).
  *
  * 100 TB notes: the manifest is O(#indexes) — tens of lines — and
  * lives beside index parquet that executors read directly; load does
  * no Spark job at all (frames stay lazy), so catalog recovery is a
  * driver-side millisecond operation regardless of data volume.
  */
object IndexCatalog {

  /** Manifest file name inside the catalog directory. */
  val ManifestName = "catalog.json"

  /** Manifest format version this code writes and accepts. */
  val Version = 1

  private val mapper = new ObjectMapper

  /** Write `ctx`'s full index registration (all six families) under
    * `dir`: one parquet directory per index (`idx_<pos>_<kind>`) and
    * one JSON-lines manifest — a header line
    * `{"catalog_version":1,"entries":N}` followed by one entry object
    * per index in registration order (order matters: ladders register
    * coarsest-first and serving takes the first eligible level). */
  def save(ctx: TsdbContext, dir: String): Unit = {
    val root = Paths.get(dir)
    Files.createDirectories(root)

    var pos = 0
    val entries = Seq.newBuilder[ObjectNode]
    def add(kind: String, frame: org.apache.spark.sql.DataFrame)(
        fill: ObjectNode => Unit): Unit = {
      val rel = s"idx_${pos}_$kind"
      frame.write.mode("overwrite").parquet(root.resolve(rel).toString)
      val n = mapper.createObjectNode()
      n.put("pos", pos); n.put("kind", kind); n.put("path", rel)
      fill(n)
      entries += n
      pos += 1
    }

    ctx.rollups.foreach { case (step, r) =>
      add("rollup", r)(_.put("windowNs", step)) }
    ctx.histograms.foreach { case (win, h) =>
      add("histogram", h)(_.put("windowNs", win)) }
    ctx.bucketSums.foreach { case (step, b) =>
      add("bucket_sums", b)(_.put("windowNs", step)) }
    ctx.kmvIndexes.foreach { d =>
      add("kmv", d.index) { n =>
        n.put("tag", d.tag); n.put("windowNs", d.windowNs); n.put("k", d.k) } }
    ctx.madIndexes.foreach { d =>
      add("mad", d.index) { n =>
        n.put("fromNs", d.fromNs); n.put("toNs", d.toNs) } }
    ctx.gapIndexes.foreach { d =>
      add("gap", d.index) { n =>
        n.put("fromNs", d.fromNs); n.put("toNs", d.toNs)
        n.put("factor", d.factor) } }

    val header = mapper.createObjectNode()
    header.put("catalog_version", Version)
    header.put("entries", pos)
    val lines = (header +: entries.result()).map(mapper.writeValueAsString)
    Files.write(root.resolve(ManifestName),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  /** Reconstruct a saved registration onto `base` (whose catalog/fact
    * frames are supplied by the caller — the manifest records indexes,
    * not the data they index). Frames load lazily from the recorded
    * parquet paths; registration order is the manifest's entry order.
    * Any structural problem — unreadable or truncated manifest,
    * version skew, unknown kind, missing parameter — throws
    * IllegalArgumentException naming the offending line; a missing
    * parquet directory surfaces as Spark's own loud path error.
    * Build an [[graft.engine.Engine]] over the result to re-run the
    * constructor shape guards on every loaded frame. */
  def load(spark: SparkSession, dir: String, base: TsdbContext): TsdbContext = {
    val root = Paths.get(dir)
    val manifest = root.resolve(ManifestName)
    require(Files.isRegularFile(manifest),
      s"index catalog manifest not found: $manifest")
    val lines = Files.readAllLines(manifest, StandardCharsets.UTF_8)
      .asScala.map(_.trim).filter(_.nonEmpty).toSeq
    require(lines.nonEmpty, s"index catalog manifest is empty: $manifest")

    def parse(line: String, what: String): JsonNode =
      try mapper.readTree(line)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"index catalog $what is not valid JSON: ${e.getMessage}") }

    val header = parse(lines.head, "header")
    val ver = header.path("catalog_version")
    require(ver.isInt && ver.asInt == Version,
      s"index catalog version mismatch: expected $Version, " +
        s"manifest says ${if (ver.isMissingNode) "<missing>" else ver}")
    val declared = header.path("entries")
    require(declared.isInt && declared.asInt == lines.size - 1,
      s"index catalog manifest truncated or padded: header declares " +
        s"${declared} entries, file has ${lines.size - 1}")

    def longOf(n: JsonNode, field: String, kind: String): Long = {
      val v = n.path(field)
      require(v.isIntegralNumber,
        s"index catalog entry (kind $kind) lacks required long '$field'")
      v.asLong
    }
    def doubleOf(n: JsonNode, field: String, kind: String): Double = {
      val v = n.path(field)
      require(v.isNumber,
        s"index catalog entry (kind $kind) lacks required double '$field'")
      v.asDouble
    }
    def textOf(n: JsonNode, field: String, kind: String): String = {
      val v = n.path(field)
      require(v.isTextual && v.asText.nonEmpty,
        s"index catalog entry (kind $kind) lacks required string '$field'")
      v.asText
    }

    var out = base
    lines.tail.zipWithIndex.foreach { case (line, i) =>
      val n = parse(line, s"entry ${i + 1}")
      val kind = textOf(n, "kind", "<any>")
      val frame = spark.read.parquet(
        root.resolve(textOf(n, "path", kind)).toString)
      kind match {
        case "rollup" =>
          out = out.copy(rollups =
            out.rollups :+ (longOf(n, "windowNs", kind) -> frame))
        case "histogram" =>
          out = out.copy(histograms =
            out.histograms :+ (longOf(n, "windowNs", kind) -> frame))
        case "bucket_sums" =>
          out = out.copy(bucketSums =
            out.bucketSums :+ (longOf(n, "windowNs", kind) -> frame))
        case "kmv" =>
          out = out.copy(kmvIndexes = out.kmvIndexes :+ KmvIndexDef(
            textOf(n, "tag", kind), longOf(n, "windowNs", kind),
            longOf(n, "k", kind).toInt, frame))
        case "mad" =>
          out = out.copy(madIndexes = out.madIndexes :+ MadIndexDef(
            longOf(n, "fromNs", kind), longOf(n, "toNs", kind), frame))
        case "gap" =>
          out = out.copy(gapIndexes = out.gapIndexes :+ GapIndexDef(
            longOf(n, "fromNs", kind), longOf(n, "toNs", kind),
            doubleOf(n, "factor", kind), frame))
        case other => throw new IllegalArgumentException(
          s"index catalog entry ${i + 1} has unknown kind '$other'")
      }
    }
    out
  }
}
