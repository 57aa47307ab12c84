package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Spatial operators over series locations — the Spark re-expression of the
  * reference's in-memory R-tree (/root/reference/stdb/index/rtree.h: Insert
  * :594, RangeQuery :683, KnnQuery best-first :631) that indexes each
  * series' (lon, lat) (/root/reference/stdb/index/series_matcher.h:46,53).
  *
  * Instead of a pointer-based tree, locations live as two Float columns on
  * the series catalog (SURVEY §1.1) and queries are declarative predicates:
  *
  *   - range  → a bounding-box `BETWEEN` filter. On a partitioned catalog
  *     the `cell` grid key (see [[withGridCell]]) turns this into partition
  *     pruning — the analog of descending R-tree interior nodes.
  *   - kNN    → `ORDER BY dist LIMIT k`, which Spark plans as
  *     TakeOrderedAndProject: a per-partition top-k heap + driver merge of
  *     k·P candidates, never a full sort. That is the same work profile as
  *     best-first tree descent, but embarrassingly parallel.
  *
  * Distances are squared Euclidean over raw coordinates, matching the
  * reference's R-tree distance (rtree.h works on untransformed f32 points —
  * no haversine).
  *
  * 100 TB notes: the catalog is small relative to facts, but at 10⁹ series
  * a full kNN scan is still wasteful. [[withGridCell]] assigns a coarse grid
  * cell id; persisting the catalog partitioned by `cell` lets a range query
  * read only overlapping cells, and [[knnPruned]] restricts kNN to the
  * cells within a caller-supplied radius bound before the top-k.
  */
object Spatial {

  /** Squared Euclidean distance to a fixed query point. */
  def dist2(lon: Double, lat: Double): Column =
    (col("lon") - lon) * (col("lon") - lon) +
      (col("lat") - lat) * (col("lat") - lat)

  /** Coarse grid cell id for partition-level spatial pruning. One Long key
    * (x * 100000 + y) so it can be a single partitioning column. */
  def withGridCell(series: DataFrame, cellDeg: Double): DataFrame =
    series.withColumn("cell",
      (floor((col("lon") + 180.0) / cellDeg) * 100000L +
        floor((col("lat") + 90.0) / cellDeg)).cast("long"))

  /** All located series inside the closed bounding box. (R-tree RangeQuery,
    * rtree.h:683 — rectangle containment over leaf points.) */
  def rangeQuery(series: DataFrame,
      lonMin: Double, lonMax: Double,
      latMin: Double, latMax: Double): DataFrame =
    series
      .where(col("lon").isNotNull && col("lat").isNotNull)
      .where(col("lon").between(lonMin, lonMax) &&
        col("lat").between(latMin, latMax))

  /** k nearest located series to (lon, lat); ties break on name so output
    * is deterministic. (R-tree KnnQuery, rtree.h:631.) */
  def knn(series: DataFrame, lon: Double, lat: Double, k: Int): DataFrame =
    series
      .where(col("lon").isNotNull && col("lat").isNotNull)
      .withColumn("dist2", dist2(lon, lat).cast(DoubleType))
      .orderBy(col("dist2").asc, col("name").asc)
      .limit(k)

  /** kNN with grid pruning: only cells intersecting the disc of `radius`
    * around the query point are scanned. Caller guarantees ≥k candidates
    * inside the radius (else fall back to [[knn]]). */
  def knnPruned(series: DataFrame, lon: Double, lat: Double, k: Int,
      radius: Double, cellDeg: Double): DataFrame = {
    val pruned = withGridCell(series, cellDeg)
      .where(col("lon").between(lon - radius, lon + radius) &&
        col("lat").between(lat - radius, lat + radius))
    knn(pruned.drop("cell"), lon, lat, k)
  }
}
