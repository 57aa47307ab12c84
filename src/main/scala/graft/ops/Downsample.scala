package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Visualization-oriented downsampling — the query a dashboard runs to
  * draw a month of a series in a 1000-pixel panel without shipping
  * every sample.
  */
object Downsample {

  /** M4 aggregation (Jugel, Jerzak, Hackenbroich & Markl, "M4: A
    * Visualization-Oriented Time Series Data Aggregation Method",
    * VLDB 2014): per (key, time bucket), the FIRST, LAST, MIN-value and
    * MAX-value samples — the four points that make a line chart drawn
    * from the reduction pixel-identical to one drawn from all rows.
    *
    * One row per (key, bucket) with the four (ts, value) pairs. All
    * four extremes are struct min/max aggregates — lexicographic, so
    * ties are pinned (equal ts → smaller/larger value; equal value →
    * earlier/later ts) and partial-aggregatable: each map task reduces
    * its rows to ≤ one struct per (key, bucket) before the exchange,
    * so the shuffle carries bucket counts, not sample counts — the
    * right plan at any scale.
    *
    * Feed µs-truncated timestamps when oracle-comparing (the repo-wide
    * convention: DuckDB's TIMESTAMP is µs, and the tie rules order by
    * ts). Buckets use FLOOR division (Math.floorDiv codegen), matching
    * DuckDB's `//` on pre-1970 (negative) timestamps — truncation would
    * merge the (−bucket, 0) and [0, bucket) pixels. */
  def m4(samples: DataFrame, keyCols: Seq[String], bucketNs: Long,
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    require(bucketNs > 0, "bucket width must be positive")
    import graft.functions.VectorExpressions.longFloorDiv
    val ts = col(tsCol); val v = col(valueCol)
    samples
      .withColumn("bucket", longFloorDiv(ts, bucketNs))
      .groupBy(keyCols.map(col) :+ col("bucket"): _*)
      .agg(
        min(struct(ts.as("t"), v.as("v"))).as("__f"),
        max(struct(ts.as("t"), v.as("v"))).as("__l"),
        min(struct(v.as("v"), ts.as("t"))).as("__lo"),
        max(struct(v.as("v"), ts.as("t"))).as("__hi"))
      .select(keyCols.map(col) ++ Seq(col("bucket"),
        col("__f.t").as("first_ts"), col("__f.v").as("first_v"),
        col("__l.t").as("last_ts"), col("__l.v").as("last_v"),
        col("__lo.t").as("min_ts"), col("__lo.v").as("min_v"),
        col("__hi.t").as("max_ts"), col("__hi.v").as("max_v")): _*)
  }

  /** Prometheus-style counter increase per time bucket: total upward
    * movement of a MONOTONIC-except-for-resets counter, where a drop
    * (restart) means the counter began again from its post-reset value
    * — so a reset contributes the new reading, not a negative delta
    * (the `increase()` semantics every metrics stack hardens its rate
    * queries with; the reference's `rate` node is the plain Δv/Δt that
    * a reset would send hugely negative).
    *
    * Per-sample contribution: value − prev if value ≥ prev (normal
    * step), else value (post-reset reading); the first sample of a
    * series contributes 0 (no baseline). Contributions quantize to
    * integer micro-units BEFORE the per-(key, bucket) sum — integer
    * sums are aggregation-order independent, so the cross-partition
    * reduce cannot put FP noise on the total (the DSIR/ngram-ppl
    * idiom). One lag window (one key-hash exchange) + one
    * partial-aggregatable groupBy. */
  def counterIncrease(samples: DataFrame, keyCols: Seq[String],
      bucketNs: Long, tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(bucketNs > 0, "bucket width must be positive")
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorExpressions.longFloorDiv
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(valueCol))
    val contrib = samples
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .withColumn("__inc",
        when(col("__prev").isNull, lit(0.0))
          .when(col(valueCol) >= col("__prev"), col(valueCol) - col("__prev"))
          .otherwise(col(valueCol)))
    contrib
      .withColumn("bucket", longFloorDiv(col(tsCol), bucketNs))
      .withColumn("__incq", round(col("__inc") * lit(1000000.0), 0).cast("long"))
      .groupBy(keyCols.map(col) :+ col("bucket"): _*)
      .agg(round(sum(col("__incq")) / lit(1000000.0), 6).as("increase"))
  }
}
