package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable log-bucketed quantile histograms — the bounded-memory,
  * any-time-range percentile index (DDSketch-family design: Masson,
  * Rim & Lee, "DDSketch: a fast and fully-mergeable quantile sketch
  * with relative-error guarantees", VLDB 2019; same log-bucket idea as
  * HdrHistogram).
  *
  * The exact `percentile` aggregate buffers EVERY value of a group —
  * unbounded in one hot series' row count — and percentile summaries
  * computed per-window cannot be combined later (quantiles don't add).
  * Log-bucket COUNTS do: bucket a value once at ingest, keep one count
  * per (series, window, bucket), and any time range's histogram is the
  * SUM of its windows' counts — the same partial-aggregatable
  * mergeability the rollup ladder gives min/max/sum/cnt
  * ([[graft.engine.Rollup]]), extended to percentiles with a bounded
  * relative error. ~8 sub-buckets per power of two caps the error at
  * 2⁻³ = 12.5% (one-sided: the reported value is the bucket's lower
  * edge, never above the true order statistic) and the whole per-series
  * histogram at a few hundred longs regardless of row count.
  *
  * Everything is INTEGER bit arithmetic on micro-unit values (round to
  * long, floor-log2 via binary-string length, clear the low bits), so
  * the index and its quantile answers replay bit-identically in DuckDB
  * — the engine's oracle-gated approximate-percentile form, where a
  * float-log bucketing could split on the last ulp.
  *
  * Domain: |value| < 2⁶³/10⁶ ≈ 9.22·10¹² (the micro-unit long's
  * headroom — the [[graft.ops.Stats.corrAligned]] integer-headroom
  * discipline; beyond it Spark's non-ANSI cast would saturate silently
  * while an oracle's CAST raises, so out-of-range series are the
  * caller's contract to rescale, exactly as with the correlation
  * moments). Positive and negative magnitudes get
  * mirrored log buckets (DDSketch's two-store design); values within
  * 1 micro-unit of zero share one underflow bucket at 0 — the ONLY
  * place the one-sided bound relaxes, to ≤ 1 µu absolute (a tiny
  * negative reports 0, one micro-unit above it).
  */
object HistQuantiles {

  /** The non-key columns every [[histogram]] emits — the schema half
    * that belongs to THIS module (callers add their own key columns);
    * consumers validating an index's shape (e.g. the engine's
    * registration gate) derive from here, never restate the names. */
  val histCols: Seq[String] = Seq("lo", "cnt")

  /** Bucket LOWER EDGE in micro-units — the histogram's bucket key,
    * unique per bucket and naturally ordered. q = round(v·1e6),
    * m = |q|; the magnitude bucket clears m's low (⌊log2 m⌋ − 3) bits,
    * keeping the leading 4 bits: values within a bucket agree to a 1/8
    * relative width. Positive values key on the magnitude bucket's
    * lower edge; negative values key on MINUS its UPPER edge — the
    * more-negative side — so the reported edge stays at-or-below every
    * value in the bucket on both sides of zero and negative keys sort
    * before positive ones. */
  def bucketLo(value: Column): Column = {
    val q = round(value * lit(1000000.0), 0).cast("long")
    val m = abs(q)
    // floor-log2 via the binary-string length (identical in DuckDB);
    // greatest(m, 1) keeps bin() off zero — that takes the underflow
    // branch below
    val e = length(bin(greatest(m, lit(1L)))) - lit(1)
    // call_function: the Scala shiftright/shiftleft wrappers only take a
    // literal Int shift; the SQL functions take a column
    val s = greatest(e - lit(3), lit(0))
    val base = call_function("shiftleft",
      call_function("shiftright", m, s), s)
    val width = call_function("shiftleft", lit(1L), s)
    when(m < 1, lit(0L))
      .when(q > 0, base)
      .otherwise(-(base + width))
  }

  /** The histogram index: one count per (keyCols..., lo). With a time
    * window among `keyCols` (e.g. the hour bin) this is the persistable
    * rollup — windows merge by ADDING counts ([[merge]]), so one build
    * serves every later range. One partial-aggregatable groupBy of the
    * scan; ≤ ~8·53 buckets per group no matter how many rows. */
  def histogram(samples: DataFrame, keyCols: Seq[String],
      valueCol: String = "value"): DataFrame =
    samples
      .select(keyCols.map(col) :+ bucketLo(col(valueCol)).as("lo"): _*)
      .groupBy(keyCols.map(col) :+ col("lo"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Re-key a histogram to coarser keys by adding counts — the
    * mergeability that makes the index serve ANY time range from one
    * build (quantiles themselves don't add; bucket counts do). */
  def merge(hist: DataFrame, keyCols: Seq[String]): DataFrame =
    hist.groupBy(keyCols.map(col) :+ col("lo"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Compact a window-keyed histogram index to a coarser window (hour →
    * day → month): counts add, so each level builds from the PREVIOUS
    * one and raw data is never rescanned —
    * [[graft.engine.Rollup.compact]]'s ladder for percentiles. Window
    * labels are starts (ts − ts mod win), so re-windowing is one
    * modulo; `coarseWinNs` must be a whole number of fine windows for
    * the result to equal a direct coarse build (it does then, BIT-FOR-
    * BIT — counts are exact; spec-pinned). At decade scale the ladder
    * keeps the serving index rows ∝ series × coarse windows while the
    * fine level keeps serving recent, finer-aligned ranges. */
  def compact(hist: DataFrame, keyCols: Seq[String], winCol: String,
      fineWinNs: Long, coarseWinNs: Long): DataFrame = {
    // the statically-checkable half of the compaction contract
    // (Rollup.compact's rule): a coarse window that is not a whole
    // number of fine windows would relabel straddling windows' counts
    // wholesale — an index silently unequal to a direct coarse build,
    // which the engine would then serve as truth
    require(fineWinNs > 0 && coarseWinNs > 0 &&
      coarseWinNs % fineWinNs == 0,
      s"coarse window ($coarseWinNs) must be a whole number of fine windows ($fineWinNs)")
    merge(
      hist.withColumn(winCol,
        col(winCol) - pmod(col(winCol), lit(coarseWinNs))),
      keyCols :+ winCol)
  }

  /** Quantile answers from a histogram: for each key and each p in
    * `ps`, the lower edge of the bucket holding the ⌈p·n⌉-th smallest
    * value, as a value (`q`, 6dp) — within 12.5% relative PLUS one
    * micro-unit BELOW the true order statistic, never above it, on
    * both signs (negative buckets key on their more-negative edge, so
    * the extra 1 µu bucket-width floor is what dominates at micro-unit
    * magnitudes; only the ±1 µu underflow band around zero can report
    * above, by up to 1 µu). `ps` are decimal STRINGS so the entry and
    * its oracle parse the identical literals (playbook rule).
    *
    * Plan shape: one cumulative window over bucket-count rows (a few
    * hundred per key — index-sized, never row-sized), an in-row explode
    * of the p list, and a per-(key, p) min. */
  def quantiles(hist: DataFrame, keyCols: Seq[String],
      ps: Seq[String]): DataFrame =
    quantileKeys(hist, keyCols, ps)
      .withColumn("q", round(col("lo_key") / lit(1000000.0), 6))
      .drop("lo_key")

  /** The integer core of [[quantiles]]: for each key and p, the µu
    * bucket KEY (`lo_key`) of the bucket holding the ⌈p·n⌉-th smallest
    * value — callers that need bucket geometry (e.g. the hull bound
    * [[bucketHiKey]]) consume this; [[quantiles]] is the value-facing
    * wrapper. */
  def quantileKeys(hist: DataFrame, keyCols: Seq[String],
      ps: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy("lo")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum(col("cnt")).over(w))
      .withColumn("__n", sum(col("cnt")).over(wAll))
    val pRows = explode(array(ps.map(p =>
      struct(lit(p).as("p"), lit(p.toDouble).as("__pv"))): _*)).as("__p")
    cum.select(keyCols.map(col) ++ Seq(col("lo"), col("__cum"), col("__n"),
        pRows): _*)
      .select(keyCols.map(col) ++ Seq(col("lo"), col("__cum"), col("__n"),
        col("__p.p").as("p"), col("__p.__pv").as("__pv")): _*)
      .where(col("__cum") >= ceil(col("__n") * col("__pv")))
      .groupBy(keyCols.map(col) :+ col("p"): _*)
      .agg(min(col("lo")).as("lo_key"))
  }

  /** Value UPPER edge (µu, exclusive for positive buckets) of the
    * bucket keyed `loKey` — with [[bucketLo]] this gives the bucket's
    * value HULL, the tight outlier bound (a value outside
    * [lo_key, bucketHiKey) lies outside every value the bucket ever
    * saw). Pure integer bit arithmetic, replayable:
    *  - key 0 (underflow): covers (−1, 1) µu → upper edge 1;
    *  - key > 0: magnitude bucket [key, key + 2^s), s from the key's
    *    own floor-log2 (the key keeps the leading 4 bits, so its
    *    exponent IS the bucket's);
    *  - key < 0: key = −(base + w) covering values (key, −base]; |key|
    *    = base + w may cross a power of two (base = 15·2^s → |key| =
    *    16·2^s), exactly when |key| is a power of two — the one case
    *    the exponent must step down. */
  def bucketHiKey(loKey: Column): Column = {
    val negL = -loKey
    val sPos = greatest(length(bin(loKey)) - lit(4), lit(0))
    val sNeg = when(negL.bitwiseAND(negL - lit(1L)) === 0,
        greatest(length(bin(negL)) - lit(5), lit(0)))
      .otherwise(greatest(length(bin(negL)) - lit(4), lit(0)))
    when(loKey === 0, lit(1L))
      .when(loKey > 0,
        loKey + call_function("shiftleft", lit(1L), sPos))
      .otherwise(loKey + call_function("shiftleft", lit(1L), sNeg))
  }
}
