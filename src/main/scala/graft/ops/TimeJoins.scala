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

  /** Linear-interpolation join: for each `left` row, `right`'s value
    * linearly interpolated between its bracketing neighbors — the
    * latest right sample at-or-before (t0, v0) and the earliest
    * at-or-after (t1, v1):
    * `v = v0 + (v1 − v0) · (ts − t0)/(t1 − t0)`; exactly-at-ts right
    * rows give v0 directly (t0 = t1). Null when either neighbor is
    * missing (no extrapolation past the series' ends — the honest
    * boundary rule). The alignment mode beyond as-of: as-of answers
    * "what was the last reading", interpolation answers "what was the
    * level at this instant" for continuously-varying quantities.
    *
    * Same union/window composition as [[asof]] — ONE hash exchange on
    * the keys; the backward carry and the forward lookahead are two
    * window passes over that one exchange (an extra in-partition sort,
    * no extra shuffle). Ties at equal right ts resolve to the MAX value
    * in BOTH directions (the [[asof]] pin, ≡ a max-per-(keys, ts) dedup
    * of the right side, which is how the oracle replays it).
    *
    * @param left  (keys..., ts, …left cols)
    * @param right (keys..., ts, valueCol)
    * @param asCol output column name for the interpolated value
    */
  def interpolationJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], valueCol: String,
      asCol: String = "interp"): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) :+
        lit(null).cast(right.schema(valueCol).dataType).as("__rv") :+
        col("__side")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select((leftCols.map(c => if (keys.contains(c) || c == "ts") col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(valueCol).as("__rv") :+
        col("__side")): _*)
    // backward: right-before-left at equal ts (side asc), max value
    // carried (value ends the ordering — the asof tie pin)
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("ts").asc, col("__side").asc, col("__rv").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: left-before-right at equal ts (side DESC), max value
    // first (value desc), so first() lands on the max of the earliest
    // qualifying timestamp — the same tie rule mirrored
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("ts").asc, col("__side").desc, col("__rv").desc_nulls_last)
      .rowsBetween(1, Window.unboundedFollowing)
    val rts = when(col("__rv").isNotNull, col("ts"))
    val t0 = col("__t0"); val v0 = col("__v0")
    val t1 = col("__t1"); val v1 = col("__v1")
    val interp = when(t0.isNull || t1.isNull, lit(null))
      .when(t1 === t0, v0)
      .otherwise(v0 + (v1 - v0) *
        ((col("ts") - t0).cast("double") / (t1 - t0).cast("double")))
    l.unionByName(r)
      .withColumn("__rts", rts)
      .withColumn("__v0", last(col("__rv"), ignoreNulls = true).over(wb))
      .withColumn("__t0", last(col("__rts"), ignoreNulls = true).over(wb))
      .withColumn("__v1", first(col("__rv"), ignoreNulls = true).over(wf))
      .withColumn("__t1", first(col("__rts"), ignoreNulls = true).over(wf))
      .where(col("__side") === 1)
      .withColumn(asCol, interp)
      .select(leftCols.map(col) :+ col(asCol): _*)
  }
}
