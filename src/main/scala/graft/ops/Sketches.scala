package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Sketch-based variants of the SpaceSaver nodes — the 100 TB swap-in for
  * `frequent-items`/`heavy-hitters` (reference spacesaver.h:12-153).
  *
  * The exact forms in [[ApplyNodes]] shuffle one partial count per
  * distinct series, which is fine while |series| is catalog-sized. When
  * the key universe itself is huge (e.g. hitting shingles or URLs, not
  * series), a Count-Min sketch bounds memory: each partition folds its
  * rows into a fixed-size sketch (Spark's `count_min_sketch` partial
  * aggregate), sketches merge associatively, and candidates are probed
  * against the merged sketch. CMS only overestimates, so the result is a
  * superset of the true hitters at the same threshold — the same
  * guarantee SpaceSaver gives (reference emits count > (portion−error)·N
  * with est ≥ true).
  */
object Sketches {

  /** Approximate frequent keys: every key whose estimated count exceeds
    * `portion − error` of the total. `candidates` bounds the probe set
    * (for series workloads: the catalog; defaults to distinct keys of
    * `df` — exact-ish but still sketch-memory-bounded on the agg side).
    *
    * SCALE CONTRACT: pass `candidates` at scale. The default probe set
    * (`df.distinct()`) re-scans the full input a second time — the sketch
    * build already read it once, so the default doubles the operator's
    * I/O at 100 TB. Any frame that covers the key universe works (the
    * series catalog, a dictionary table, last run's hitters); the probe
    * then touches only that frame and the broadcast sketch, never `df`
    * again (spec-pinned: "CMS candidates contract").
    *
    * @param eps,confidence CMS accuracy: width = ⌈e/eps⌉, depth = ⌈ln(1/(1−conf))⌉
    */
  /** KMV (k-minimum-values) distinct-count sketch per group (Bar-Yossef
    * et al. 2002): keep each group's k smallest DISTINCT hash60 values;
    * with the k-th smallest at h_k, the estimate is (k−1)·2⁶⁰/h_k
    * (standard error ≈ 1/√(k−2)). Groups holding fewer than k distinct
    * values report exactly (estimate = count). Everything is plain
    * relational algebra over a deterministic hash — unlike HLL the
    * DuckDB oracle replays it bit-identically, which is why this is the
    * engine's oracle-gated approximate-distinct form; Spark's built-in
    * `approx_count_distinct` (HLL++, partial-aggregatable, not
    * cross-engine-deterministic) is the drop-in where replayability
    * doesn't matter.
    *
    * Scale shape: the dedup shuffles DISTINCT (group, hash) pairs —
    * vocabulary-sized, not corpus-sized — and the k-smallest filter
    * compiles to WindowGroupLimit (each map task forwards at most k
    * hashes per group, pinned in PlanShapeSpec), so no group ever
    * materializes its full distinct set on one task after the local
    * dedup. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 256): DataFrame =
    // the direct sketch IS one serve over the hashed values — one
    // estimator definition ([[kmvServe]]), so the spec-pinned
    // "served == direct" contract cannot de-synchronize
    kmvServe(
      df.select(col(groupCol),
        graft.pipeline.Dedup.hash60(col(valueCol)).as("h")),
      groupCol, k)

  /** Mergeable KMV rollup INDEX: per (group, window) the k minimal
    * distinct hash60 values as ROWS (group, window, h) — the
    * distinct-count analog of the histogram rollup
    * ([[graft.ops.HistQuantiles.histogram]]): build once at ingest
    * granularity, persist, and serve ANY window range later by merging
    * ([[kmvServe]]). Distinct counts don't add across windows (a user
    * active every day is one user, not thirty) — k-min hash SETS merge
    * exactly: the k minimal of a union are all among each window's k
    * minimal, so the union of per-window indexes loses nothing the
    * global sketch would keep (spec-pinned against [[kmvDistinct]]).
    *
    * Scale shape: distinct (group, window, h) dedup, then the k-smallest
    * filter compiles to WindowGroupLimit — each map task forwards at
    * most k hashes per (group, window); index size is
    * groups × windows × k rows, never value-count-sized. */
  def kmvIndex(df: DataFrame, groupCol: String, windowCol: String,
      valueCol: String, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "kmv needs k >= 2")
    val dedup = df
      .select(col(groupCol), col(windowCol),
        graft.pipeline.Dedup.hash60(col(valueCol)).as("h"))
      .distinct()
    val w = Window.partitionBy(groupCol, windowCol).orderBy("h")
    dedup.withColumn("__r", row_number().over(w)).where(col("__r") <= k)
      .select(groupCol, windowCol, "h")
  }

  /** Compact a [[kmvIndex]] to coarser windows (day → month): per
    * (group, coarse window) keep the k minimal distinct hashes of the
    * union of its fine windows' k-min sets. EXACTLY the direct coarse
    * index (spec-pinned): any hash in the coarse k-min is in its own
    * fine window's k-min (eviction there needs k smaller hashes, which
    * would evict it from the coarse set too), so compaction loses
    * nothing — the distinct-count analog of
    * [[graft.ops.HistQuantiles.compact]], and it shares that ladder's
    * ONE window-unit convention: labels are window STARTS in whatever
    * unit the index was built with (ns starts for the engine-registered
    * indexes, plain bucket indexes with `fineWin = 1` for index-labeled
    * ladders), re-keyed via `win − (win mod coarseWin)` — so a
    * ns-labeled index compacts without the silent label corruption a
    * floor-division would cause. `coarseWin` must be a whole number of
    * fine windows (same require as the histogram ladder). Index shrinks
    * to groups × coarse-windows × k rows; the k-cut is the same
    * map-side WindowGroupLimit shape as the build.
    *
    * CONTRACT: `k` must not exceed the k the FINE index was built with
    * — a larger k cannot be reconstructed from k-min sets (the fine
    * build already discarded the hashes beyond its k), and the
    * under-full coarse sets would make [[kmvServe]] take its exact
    * n_kept < k branch and report the retained-hash count as a true
    * distinct count. Compact with the build k (or smaller); this is
    * the k-analog of [[HistQuantiles.compact]]'s
    * whole-number-of-fine-windows rule (not statically checkable here
    * — the index rows don't carry their build k). */
  def kmvCompact(index: DataFrame, groupCol: String, windowCol: String,
      fineWin: Long, coarseWin: Long, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(fineWin > 0 && coarseWin > 0 && coarseWin % fineWin == 0,
      s"coarse window ($coarseWin) must be a whole number of fine windows ($fineWin)")
    require(k >= 2, "kmv needs k >= 2")
    val re = index.select(col(groupCol),
        (col(windowCol) - pmod(col(windowCol), lit(coarseWin)))
          .as(windowCol),
        col("h"))
      .distinct()
    val w = Window.partitionBy(groupCol, windowCol).orderBy("h")
    re.withColumn("__r", row_number().over(w)).where(col("__r") <= k)
      .select(groupCol, windowCol, "h")
  }

  /** Serve a distinct-count estimate from a [[kmvIndex]] (optionally
    * range-filtered by the caller first — any window subset is valid):
    * union the retained hashes, keep the k smallest distinct, apply the
    * same estimator as [[kmvDistinct]]. Output matches kmvDistinct
    * column-for-column, and over the full window set value-for-value —
    * the build-once/serve-any-range contract, oracle-gated. */
  def kmvServe(index: DataFrame, groupCol: String,
      k: Int = 256): DataFrame = kmvServeKeys(index, Seq(groupCol), k)

  /** [[kmvServe]] over a COMPOSITE group key (e.g. (metric, bin) for the
    * stepped `distinct` statement) — same dedup, k-cut and estimator,
    * one definition. */
  def kmvServeKeys(index: DataFrame, groupCols: Seq[String],
      k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "kmv needs k >= 2")
    val keys = groupCols.map(col)
    val dedup = index.select(keys :+ col("h"): _*).distinct()
    val w = Window.partitionBy(keys: _*).orderBy("h")
    dedup.withColumn("__r", row_number().over(w)).where(col("__r") <= k)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("__hk"))
      .select(keys ++ Seq(col("n_kept"),
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(
            lit((k - 1).toDouble) * lit(1152921504606846976.0) / col("__hk")),
          6).as("est_distinct")): _*)
  }

  def frequentKeys(df: DataFrame, keyCol: String,
      portion: Double, error: Double,
      eps: Double = 0.0001, confidence: Double = 0.99,
      candidates: Option[DataFrame] = None): DataFrame = {
    val spark = df.sparkSession
    // one action builds BOTH the total and the sketch: count(*) and the
    // CMS are partial aggregates of the same scan, so the input is read
    // once (at 100 TB a second full pass just for the denominator doubles
    // the operator's I/O)
    val totRow = df
      .agg(count(lit(1)).as("total"),
        count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(42)).as("s"))
      .head()
    val total = totRow.getAs[Long]("total")
    val sketchBytes = totRow.getAs[Array[Byte]]("s")
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))
    val bc = spark.sparkContext.broadcast(cms)
    val cand = candidates.getOrElse(df.select(col(keyCol)).distinct())
    val estimate = udf((k: Any) => bc.value.estimateCount(k))
    cand
      .withColumn("est_count", estimate(col(keyCol)))
      .where(col("est_count") > (portion - error) * total)
      .orderBy(col("est_count").desc, col(keyCol))
  }
}
