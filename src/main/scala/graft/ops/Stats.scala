package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-series statistics — "which metrics move together", the
  * fleet-analytics readout beyond any single series' history. The
  * reference has no cross-series statistics at all (its operators are
  * per-query-leaf pipelines, stdb/query/query_processing); here it is
  * one rollup-sized composition.
  */
object Stats {

  /** Pearson correlation matrix between series on ALIGNED time buckets:
    * per (key, bucket) the bucket-mean value, then for every key pair
    * sharing a bucket the correlation of their bucket-mean sequences.
    * Bucket means (not sums) keep magnitudes sf-invariant; quantizing
    * them to MILLI-units makes every moment (n, Σx, Σy, Σxy, Σx², Σy²)
    * an INTEGER sum — aggregation-order independent, so the
    * cross-partition reduce cannot put FP noise on the moments and the
    * one final double formula replays with identical IEEE op order in
    * any engine (the DSIR/ngram-ppl idiom, extended to second moments).
    *
    * Scale shape: the fact scan reduces to (keys × buckets) rows — a
    * rollup-sized frame — BEFORE anything pairs; the pair join is
    * bucket-keyed over that reduced frame (k² pairs per bucket, k =
    * series under comparison, catalog-bounded) and the moments are one
    * partial-aggregatable groupBy. Nothing pair-shaped ever touches the
    * raw facts.
    *
    * Integer headroom: each MOMENT fits BIGINT while
    * n_buckets · (1000·|mean|)² < 2⁶³ — e.g. |value| ≤ 10³ allows ~9M
    * buckets (a decade of minutes). Coarsen `bucketNs` (or rescale
    * values) beyond that; the op requires nothing else of the domain.
    * The final formula casts each moment to double BEFORE combining
    * (n·Σxx and Σx·Σx would need n²·(1000·|mean|)² headroom as
    * integers — 3k buckets at |value| ≤ 10³, a silent-wrap trap);
    * both engines run the identical double ops, so the mirror cannot
    * split on it.
    *
    * Output: one row per unordered pair (key_a < key_b) with `corr`
    * (6dp) and `n_buckets` (shared buckets; pairs with < 2 shared
    * buckets or a zero-variance side yield null corr — no judgement,
    * matching SQL corr semantics).
    *
    * `lagBuckets` shifts the alignment: corr of key_a at bucket b with
    * key_b at bucket b + lag — "does a today predict b tomorrow", the
    * lead/lag readout. Direction matters once lag ≠ 0 (pairs stay
    * key_a < key_b; flip the lag's sign for the other direction). */
  def corrAligned(samples: DataFrame, bucketNs: Long,
      keyCol: String = "metric", tsCol: String = "ts",
      valueCol: String = "value", lagBuckets: Long = 0L): DataFrame =
    corrFromBucketMeans(
      bucketMeans(samples, bucketNs, keyCol, tsCol, valueCol),
      keyCol, lagBuckets)

  /** The pair/moments half of [[corrAligned]] over an ALREADY-REDUCED
    * bucket-mean frame (keyCol, __b bucket index, __m milli-quantized
    * mean) — shared with the streaming bucket-mean maintainer
    * ([[graft.streaming.TsdbStream.bucketMeansBuild]] sinks exactly
    * this frame's integer ingredients), so a stream-maintained index
    * serves correlations bit-identically to the batch scan: the
    * moments are integer sums of the same integers and the one double
    * formula is shared. */
  def corrFromBucketMeans(buckets: DataFrame, keyCol: String,
      lagBuckets: Long = 0L): DataFrame = {
    val l = buckets.select(col(keyCol).as("key_a"), col("__b"),
      col("__m").as("__x"))
    val r = buckets.select(col(keyCol).as("key_b"),
      (col("__b") - lit(lagBuckets)).as("__b"), col("__m").as("__y"))
    val moments = l.join(r, Seq("__b"))
      .where(col("key_a") < col("key_b"))
      .groupBy("key_a", "key_b")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    pearson(moments).select("key_a", "key_b", "n_buckets", "corr")
  }

  /** Per (key, bucket) milli-quantized bucket MEAN — the ONE rollup
    * reduction both [[corrAligned]] and [[autocorr]] (and their
    * mirrors) must replay bit-identically: µu sum and count are exact
    * integers, their double ratio rounds half-up to one milli-unit
    * integer. */
  def bucketMeans(samples: DataFrame, bucketNs: Long,
      keyCol: String, tsCol: String, valueCol: String): DataFrame =
    meansFromSums(bucketSums(samples, bucketNs, keyCol, tsCol, valueCol),
      keyCol)

  /** The PERSISTABLE half of [[bucketMeans]]: per (key, epoch bucket)
    * the exact integer ingredients (µu sum `__s`, count `__c`) of the
    * milli-quantized bucket mean. Sums and counts ADD — across time
    * (coarser steps re-bin exactly) and across series merged under one
    * key — so one build at fine granularity serves every coarser
    * correlation/trend later ([[graft.engine.Engine]] registers this
    * frame as the `TsdbContext.bucketSums` index; the streaming twin
    * is [[graft.streaming.TsdbStream.bucketMeansBuild]]). */
  def bucketSums(samples: DataFrame, bucketNs: Long,
      keyCol: String = "metric", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(bucketNs > 0, "bucket width must be positive")
    import graft.functions.VectorExpressions.longFloorDiv
    samples
      .withColumn("__b", longFloorDiv(col(tsCol), bucketNs))
      .groupBy(col(keyCol), col("__b"))
      .agg(sum(round(col(valueCol) * lit(1000000.0), 0).cast("long")).as("__s"),
        count(lit(1)).as("__c"))
  }

  /** Compact a [[bucketSums]] index to a coarser step (hour → day →
    * month): sums and counts re-bin by ADDITION, so each level builds
    * from the PREVIOUS one and raw samples are never rescanned — the
    * [[graft.ops.HistQuantiles.compact]] ladder for the integer-moment
    * statements (correlate/trend/changepoints serving). `__b` labels
    * are bucket INDEXES (ts floor-divided by the step —
    * [[bucketSums]]'s convention, unlike the histogram ladder's
    * ns-start labels), so re-binning is one floor division;
    * `coarseStepNs` must be a whole number of fine steps for the
    * result to equal a direct coarse build (it does then, BIT-FOR-BIT
    * — µu sums and counts are exact integers; spec-pinned). At decade
    * scale the ladder keeps a year-long trend reading ∝ series ×
    * coarse buckets (365 day rows) instead of the fine level's 525k
    * minute rows. */
  def bucketSumsCompact(index: DataFrame, keyCol: String,
      fineStepNs: Long, coarseStepNs: Long): DataFrame = {
    require(fineStepNs > 0 && coarseStepNs > 0 &&
      coarseStepNs % fineStepNs == 0,
      s"coarse step ($coarseStepNs) must be a whole number of fine steps ($fineStepNs)")
    import graft.functions.VectorExpressions.longFloorDiv
    index.groupBy(col(keyCol),
        longFloorDiv(col("__b"), coarseStepNs / fineStepNs).as("__b"))
      .agg(sum(col("__s")).as("__s"), sum(col("__c")).as("__c"))
  }

  /** The ONE exact sum/count → milli-unit mean reduction: integer µu
    * sum and count divide as doubles, round half-up to one milli-unit
    * integer — applied by the batch [[bucketMeans]] and by callers
    * serving a stream-maintained (keyCol, __b, __s, __c) sink
    * ([[graft.streaming.TsdbStream.bucketMeansBuild]]); identical
    * integer ingredients → identical means, whichever side built
    * them. */
  def meansFromSums(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol), col("__b"),
      round(col("__s") / col("__c") / lit(1000.0), 0).cast("long").as("__m"))

  /** The ONE Pearson formula over integer moment columns (n_buckets,
    * __sx, __sy, __sxy, __sxx, __syy): each moment cast to double
    * BEFORE combining (integer n·Σxx / Σx·Σx would wrap at a few
    * thousand buckets); identical op shape on any mirror; a
    * zero-variance side makes the denominator 0 → null `corr`. */
  private def pearson(moments: DataFrame): DataFrame = {
    def d(name: String) = col(name).cast("double")
    val num = d("n_buckets") * d("__sxy") - d("__sx") * d("__sy")
    val den = sqrt(d("n_buckets") * d("__sxx") - d("__sx") * d("__sx")) *
      sqrt(d("n_buckets") * d("__syy") - d("__sy") * d("__sy"))
    moments.withColumn("corr", round(when(den > 0.0, num / den), 6))
  }

  /** Per-key ordinary-least-squares trend of the bucket-mean series
    * against the bucket INDEX, plus the line's value `horizonBuckets`
    * past the key's last observed bucket — the capacity-planning
    * readout ("is this ramping, and where will it be tomorrow"; the
    * predict_linear analog, computed batch-side). The reference has no
    * regression operator at all; this is the [[corrAligned]] moment
    * machinery pointed at time itself.
    *
    * Same exactness discipline as the correlation ops: bucket means
    * quantize to integer MILLI-units ([[bucketMeans]]), the x axis is
    * the bucket index REBASED per key to its first observed bucket
    * (small integers — Σx² needs only n³ headroom instead of the
    * epoch-bucket's ~10¹¹ square), so every moment (n, Σx, Σy, Σxy,
    * Σx²) is an order-independent integer sum and the one final double
    * formula replays with identical IEEE op order in any engine.
    *
    * Scale shape: the fact scan reduces to (keys × buckets) rows in one
    * partial-aggregatable groupBy BEFORE the per-key window rebase ever
    * runs; the window and the moment groupBy share the key hash
    * partitioning. Nothing beyond rollup size is ever shuffled.
    *
    * Output: one row per key — `n_buckets`, `slope` (units per bucket,
    * 6dp), `forecast` (units, 6dp — the OLS line at last + horizon),
    * `ts_us` (the µs timestamp of the forecast bucket's lower edge).
    * Keys with < 2 buckets (or all samples in one bucket) have no
    * defined line → null slope/forecast, matching SQL regr_slope. */
  def trend(samples: DataFrame, bucketNs: Long, horizonBuckets: Long,
      keyCol: String = "metric", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    trendFromBucketMeans(
      bucketMeans(samples, bucketNs, keyCol, tsCol, valueCol),
      keyCol, bucketNs, horizonBuckets)

  /** The rebase/moments half of [[trend]] over an already-reduced
    * bucket-mean frame (keyCol, __b, __m) — shared with index serving
    * ([[graft.engine.Engine]]'s registered bucket-sums index reduces
    * to exactly this frame), so a served trend equals the scan-built
    * one bit-for-bit. */
  def trendFromBucketMeans(buckets: DataFrame, keyCol: String,
      bucketNs: Long, horizonBuckets: Long): DataFrame = {
    require(bucketNs % 1000 == 0, "bucket width must be whole µs")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
    val xb = buckets
      .withColumn("__b0", min(col("__b")).over(w))
      .select(col(keyCol), (col("__b") - col("__b0")).as("__x"),
        col("__m").as("__y"), col("__b0"))
    val moments = xb.groupBy(keyCol)
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        max(col("__x")).as("__lx"), min(col("__b0")).as("__b0"))
    trendFromMoments(moments, keyCol, bucketNs, horizonBuckets)
  }

  /** The ONE line-fit readout over integer OLS moment columns
    * (n_buckets, __sx, __sy, __sxy, __sxx, __lx, __b0 — rebased-x
    * milli-unit moments, [[trend]]'s shape) — shared by the batch
    * builder and the streaming moment maintainer
    * ([[graft.streaming.TsdbStream.trendBuild]]) so both emit
    * bit-identical slopes/forecasts: each moment casts to double
    * BEFORE combining and one formula owns the IEEE op order. */
  def trendFromMoments(moments: DataFrame, keyCol: String,
      bucketNs: Long, horizonBuckets: Long): DataFrame = {
    require(horizonBuckets >= 0, "horizon must be >= 0 buckets")
    require(bucketNs % 1000 == 0, "bucket width must be whole µs")
    def d(name: String) = col(name).cast("double")
    val den = d("n_buckets") * d("__sxx") - d("__sx") * d("__sx")
    val slopeMu = when(den > 0.0,
      (d("n_buckets") * d("__sxy") - d("__sx") * d("__sy")) / den)
    val interceptMu = (d("__sy") - slopeMu * d("__sx")) / d("n_buckets")
    val forecastMu = interceptMu +
      slopeMu * (col("__lx") + lit(horizonBuckets)).cast("double")
    moments.select(col(keyCol), col("n_buckets"),
      round(slopeMu / lit(1000.0), 6).as("slope"),
      round(forecastMu / lit(1000.0), 6).as("forecast"),
      ((col("__b0") + col("__lx") + lit(horizonBuckets)) *
        lit(bucketNs / 1000L)).as("ts_us"))
  }

  /** Autocorrelation at chosen lags: per key, corr of the bucket-mean
    * series with ITSELF shifted by each lag — the periodicity detector
    * ("does this metric breathe daily?"; a peak at lag 24 on hourly
    * buckets is daily seasonality — the readout that justifies a
    * [[graft.ops.Monitoring.seasonalBands]] period choice). Same
    * integer-moment machinery as [[corrAligned]] ([[corrAligned]]'s
    * key_a < key_b pairing excludes self-pairs, so the ACF is its own
    * op): the fact scan reduces to (keys × buckets) ONCE, the lag list
    * explodes in-row on that rollup frame, and each (key, lag) pair's
    * moments partial-aggregate. Output: (key, lag, n_buckets, corr) —
    * n_buckets = overlapping bucket pairs; zero-variance or < 2
    * overlaps yield null. */
  def autocorr(samples: DataFrame, bucketNs: Long, lags: Seq[Long],
      keyCol: String = "metric", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    autocorrFromBucketMeans(
      bucketMeans(samples, bucketNs, keyCol, tsCol, valueCol)
        .withColumnRenamed(keyCol, "key"),
      "key", lags)

  /** The lag/moments half of [[autocorr]] over an already-reduced
    * bucket-mean frame (keyCol, __b, __m) — shared with index serving
    * ([[graft.engine.Engine]]'s registered bucket-sums index reduces
    * to exactly this frame), so a served ACF equals the scan-built one
    * bit-for-bit; the output key column keeps `keyCol`'s name.
    *
    * Pairing is a UNION + one groupBy, not a self-join: each bucket
    * contributes its mean as the `x` role at its own grid position and
    * as the `y` role shifted back by each lag, and positions holding
    * both roles are the overlapping pairs. One shuffle over the
    * rollup-sized frame (a self-join costs two), and — the practical
    * trigger — a self-join whose lagged side passes through a Generate
    * breaks Spark's relation deduplication when `buckets` is a memory-
    * sink VIEW (the stream-maintained index), where this shape is
    * analyzer-safe on any input. (key, __b) must be unique, which
    * every [[bucketMeans]]-shaped frame guarantees. */
  def autocorrFromBucketMeans(buckets: DataFrame, keyCol: String,
      lags: Seq[Long]): DataFrame = {
    require(lags.nonEmpty, "at least one lag required")
    val withLag = buckets.select(col(keyCol),
      explode(array(lags.map(lit): _*)).as("lag"), col("__b"), col("__m"))
    val nullM = lit(null).cast("long")
    val xs = withLag.select(col(keyCol), col("lag"), col("__b"),
      col("__m").as("__x"), nullM.as("__y"))
    val ys = withLag.select(col(keyCol), col("lag"),
      (col("__b") - col("lag")).as("__b"), nullM.as("__x"),
      col("__m").as("__y"))
    val pairs = xs.unionByName(ys)
      .groupBy(keyCol, "lag", "__b")
      .agg(max(col("__x")).as("__x"), max(col("__y")).as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val moments = pairs
      .groupBy(keyCol, "lag")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    pearson(moments).select(keyCol, "lag", "n_buckets", "corr")
  }

  /** Level-shift (changepoint) detection over a [[bucketMeans]] frame
    * (keyCol, __b, __m): at each occupied bucket b, compare the
    * UNWEIGHTED mean of the `w` occupied buckets before b against the
    * `w` starting at b, and flag boundaries where |shift| ≥ `minShift`
    * (the two-window mean-shift detector — Page 1954's mean-change
    * question answered offline on the bucket grid, the machinery
    * behind "when did this metric move"). Integer discipline end to
    * end: window sums of the milli-quantized bucket means are exact
    * integers; each reported mean (and the shift, computed from the
    * integer DIFFERENCE, not from the two rounded means — they can
    * disagree in the 6th decimal) is one double division rounded to
    * 6dp, and the threshold compares the ROUNDED shift, so any SQL
    * mirror replays flag-for-flag.
    *
    * Windows are the w occupied buckets each side — sparse series
    * compare across silences (pair with the `gaps` statement when
    * silence itself is the event); boundaries with fewer than w
    * buckets on either side abstain. A step change flags up to w
    * consecutive boundaries as the windows slide across it — the
    * extremum of a flagged run is the change's best estimate; emitting
    * the run keeps the op a pure per-boundary readout.
    *
    * Scale shape: rides the (keys × buckets) reduced frame — two
    * window passes over ONE per-key sort, never sample-sized rows;
    * output is flagged-boundary-sized. */
  def levelShifts(buckets: DataFrame, keyCol: String, stepNs: Long,
      w: Int, minShift: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(w >= 1, "window must be >= 1 bucket")
    require(stepNs > 0 && stepNs % 1000 == 0,
      "step must be a positive whole number of microseconds")
    val ord = Window.partitionBy(keyCol).orderBy("__b")
    val left = ord.rowsBetween(-w, -1)
    val right = ord.rowsBetween(0, w - 1)
    buckets
      .withColumn("__nl", count(lit(1)).over(left))
      .withColumn("__nr", count(lit(1)).over(right))
      .withColumn("__sl", sum(col("__m")).over(left))
      .withColumn("__sr", sum(col("__m")).over(right))
      .where(col("__nl") === w && col("__nr") === w)
      .select(col(keyCol),
        (col("__b") * lit(stepNs / 1000)).as("ts_us"),
        round(col("__sl").cast("double") / w / 1000.0, 6).as("before_mean"),
        round(col("__sr").cast("double") / w / 1000.0, 6).as("after_mean"),
        round((col("__sr") - col("__sl")).cast("double") / w / 1000.0, 6)
          .as("shift"))
      .where(abs(col("shift")) >= minShift)
  }
}
