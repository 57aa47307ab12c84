package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark lacks as built-ins.
  *
  * The reference's JOIN kind aligns metrics on *exact* timestamps
  * (operators/join.cc); real TSDB workloads also need the inexact form —
  * "for each left sample, the latest right sample at or before it" — the
  * as-of join.
  *
  * Implementation is the union/carry-forward composition (prompt
  * preference (a): compose existing ops): tag both sides, union them,
  * and per partition key take `last(right_value, ignoreNulls)` over a
  * (ts, side) window — right rows sort before left rows at equal ts, so
  * `<=` semantics fall out of the sort order. One shuffle on the
  * partition key, linear scan, no per-row probing; at 100 TB this is the
  * same cost as any windowed per-series operator, and a pre-bucketed
  * layout on the key makes the shuffle local.
  */
object TimeJoins {

  /** Range (interval) join: pair each point with every interval of the
    * same key containing it (`start <= ts < end`).
    *
    * A naive inequality join plans as a nested loop (O(points·intervals)
    * per key). Bucketizing makes it an equi-join: each point lands in one
    * coarse time bucket, each interval is replicated to the buckets it
    * overlaps, and the join key becomes (keys..., bucket) with an exact
    * containment filter after. Every (point, interval) pair meets in
    * exactly one bucket — the point's — so no dedup is needed. Choose
    * `bucketNs` near the typical interval length: replication factor is
    * ~len/bucket + 1.
    *
    * @param points    (keys..., ts, …)
    * @param intervals (keys..., start, end, …), half-open [start, end)
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      bucketNs: Long): DataFrame = {
    require(bucketNs > 0, "bucket width must be positive")
    // integer division: `/` on Long ns columns is double division, which
    // can misbucket values within ~0.25µs of a boundary past 2^53
    import graft.functions.VectorExpressions.longDiv
    val pts = points.withColumn("__b", longDiv(col("ts"), bucketNs))
    val ivs = intervals.withColumn("__b",
      explode(sequence(
        longDiv(col("start"), bucketNs),
        longDiv(col("end") - 1, bucketNs))))
    pts.join(ivs, keys :+ "__b")
      .where(col("ts") >= col("start") && col("ts") < col("end"))
      .drop("__b")
  }

  /** As-of join: for each `left` row, the most recent `right` row with the
    * same `keys` and `right.ts <= left.ts` (within `toleranceNs` if set).
    * Right columns come back as `valueCols` (null when nothing qualifies).
    *
    * TIE RULE (pinned): equal-timestamp right rows resolve to the MAX of
    * each value column (independently per column, ≡ a max-groupBy dedup
    * of the right side per (keys, ts)) — implemented by including the
    * column itself in its carry window's ordering (ts, side, value), so
    * `last(…, ignoreNulls)` lands on the largest value of the latest
    * qualifying timestamp instead of an arbitrary tied row. One rule
    * across the engine: the streaming probe
    * ([[graft.streaming.TsdbStream.asofIndex]]) pins the same
    * largest-value choice, where both a raw window carry and DuckDB's
    * native ASOF are arbitrary. Folding the tie-break into the window
    * ordering (rather than a pre-aggregation) keeps the operator at ONE
    * hash exchange — the tag-key window shuffle — which PlanShapeSpec
    * pins.
    *
    * @param left  (keys..., ts, …left cols)
    * @param right (keys..., ts, valueCols...)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      valueCols: Seq[String], toleranceNs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    def rtsCol(c: String) = s"__rts_$c"
    val l = left
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) ++ valueCols.map(c => lit(null).cast(
        right.schema(c).dataType).as(c)) ++
        valueCols.map(c => lit(null).cast("long").as(rtsCol(c))) :+
        col("__side")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select((leftCols.map(c => if (keys.contains(c) || c == "ts") col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col) ++
        // staleness is PER value column: a right row with a null value in
        // column c must not refresh c's match timestamp, or the tolerance
        // gate would compare the carried value against a newer row's ts
        valueCols.map(c => when(col(c).isNotNull, col("ts")).as(rtsCol(c))) :+
        col("__side")): _*)
    // per-column carry window: ordering ends with the column itself
    // (nulls first), so among right rows tied on (ts, side) the LAST —
    // the carried one — is the max non-null value. ts stays the primary
    // key, so the carry is still "latest qualifying timestamp"; all
    // windows share the one keys-hash exchange (extra in-partition sort
    // per column, no extra shuffle)
    def wFor(c: String) = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("ts").asc, col("__side").asc, col(c).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(
        (leftCols.map(col) ++
          valueCols.map(c =>
            last(col(c), ignoreNulls = true).over(wFor(c)).as(c)) ++
          valueCols.map(c =>
            last(col(rtsCol(c)), ignoreNulls = true).over(wFor(c))
              .as(rtsCol(c))) :+
          col("__side")): _*)
      .where(col("__side") === 1)
    val out = toleranceNs match {
      case None => carried
      case Some(tol) =>
        valueCols.foldLeft(carried) { (d, c) =>
          d.withColumn(c, when(col("ts") - col(rtsCol(c)) <= tol, col(c)))
        }
    }
    out.drop("__side" +: valueCols.map(rtsCol): _*)
  }
}
