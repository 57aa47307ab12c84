package graft.query

/** Query AST for the reference TSDB's JSON query language.
  *
  * Six mutually-exclusive data-query kinds plus the metadata entry points
  * (search / suggest), per /root/reference/stdb/query/queryparser.h:17-25 and
  * the per-kind parsers in queryparser.cc (§2.1 of SURVEY.md).
  */
object Ast {

  /** Aggregation functions (reference operator.h:33-45). */
  sealed abstract class AggFunc(val token: String)
  object AggFunc {
    case object Min extends AggFunc("min")
    case object Max extends AggFunc("max")
    case object Sum extends AggFunc("sum")
    case object Cnt extends AggFunc("cnt")
    case object Mean extends AggFunc("mean")
    case object First extends AggFunc("first")
    case object Last extends AggFunc("last")
    case object MinTimestamp extends AggFunc("min_timestamp")
    case object MaxTimestamp extends AggFunc("max_timestamp")
    case object FirstTimestamp extends AggFunc("first_timestamp")
    case object LastTimestamp extends AggFunc("last_timestamp")

    val all: Seq[AggFunc] = Seq(Min, Max, Sum, Cnt, Mean, First, Last,
      MinTimestamp, MaxTimestamp, FirstTimestamp, LastTimestamp)
    def fromToken(s: String): AggFunc = all.find(_.token == s)
      .getOrElse(throw new BadQuery(s"unknown aggregate function: '$s'"))
  }

  final class BadQuery(msg: String) extends IllegalArgumentException(msg)

  /** Semi-open time range [from, to) in UTC ns; from > to means backward
    * scan (descending output). */
  final case class TimeRange(from: Long, to: Long) {
    def forward: Boolean = from <= to
    def lo: Long = math.min(from, to)
    def hi: Long = math.max(from, to)
  }

  sealed trait Where
  object Where {
    /** `{"tag": ["v1","v2"], ...}` — AND across keys, OR within values. */
    final case class TagsIn(tags: Map[String, Seq[String]]) extends Where
    /** `[{"tag1":"v1",...}, ...]` — explicit series list (exact tag sets). */
    final case class ExplicitSeries(list: Seq[Map[String, String]]) extends Where
    case object All extends Where
  }

  /** Value-range predicate (gt/ge/lt/le), conjunctive within one filter. */
  final case class ValueFilter(
      gt: Option[Double] = None, ge: Option[Double] = None,
      lt: Option[Double] = None, le: Option[Double] = None) {
    def isEmpty: Boolean = gt.isEmpty && ge.isEmpty && lt.isEmpty && le.isEmpty
  }

  sealed trait FilterCombiner
  object FilterCombiner {
    case object All extends FilterCombiner
    case object Any extends FilterCombiner
  }

  /** `where-location` clause: restrict the series universe geometrically
    * before id resolution — a beyond-reference capability (the reference
    * maintains an R-tree over series locations, rtree.h:594-683, but
    * exposes no query-language surface for it). Composes with `where`:
    * tags narrow first, then geometry. */
  sealed trait LocationFilter
  object LocationFilter {
    /** `{"box": {"lon": [min,max], "lat": [min,max]}}` — closed bbox
      * (R-tree RangeQuery semantics, rtree.h:683). */
    final case class Box(lonMin: Double, lonMax: Double,
        latMin: Double, latMax: Double) extends LocationFilter
    /** `{"knn": {"lon": x, "lat": y, "k": n[, "radius": r]}}` — the k
      * nearest located series, squared-Euclidean, ties by name (KnnQuery,
      * rtree.h:631). With `radius`, candidates are restricted to the
      * ±radius box around the query point first (the grid-pruned scale
      * path, [[graft.spatial.Spatial.knnPruned]]): "k nearest within
      * radius" — fewer than k results when the box holds fewer series. */
    final case class Knn(lon: Double, lat: Double, k: Int,
        radius: Option[Double] = None) extends LocationFilter
  }

  sealed trait OrderBy
  object OrderBy {
    /** (series, ts) lexicographic — the default. */
    case object Series extends OrderBy
    /** (ts, series). */
    case object Time extends OrderBy
  }

  sealed trait GroupByOp
  object GroupByOp {
    /** `group-by-tag`: DROP the listed tags from the series key. */
    case object Group extends GroupByOp
    /** `pivot-by-tag`: KEEP ONLY the listed tags. */
    case object Pivot extends GroupByOp
  }
  final case class GroupByTag(op: GroupByOp, tags: Seq[String])

  /** One `apply` pipeline stage, e.g. {"name":"ewma","decay":0.9}. */
  final case class ApplySpec(name: String, params: Map[String, Any])

  /** The `output` clause: sink-side rendering of the final frame
    * (reference formats RESP or CSV at the output stage,
    * queryparser.cc:933). `format`: "resp" | "csv"; `timestamp`:
    * "raw" (ns long) | "iso" (ISO-8601 basic, ns precision). */
  final case class OutputSpec(format: String = "resp", timestamp: String = "raw")

  sealed trait Query

  final case class SelectQuery(
      metric: String,
      range: TimeRange,
      where: Where = Where.All,
      filter: Option[ValueFilter] = None,
      orderBy: OrderBy = OrderBy.Series,
      groupBy: Option[GroupByTag] = None,
      limit: Option[Long] = None,
      offset: Option[Long] = None,
      apply: Seq[ApplySpec] = Nil,
      location: Option[LocationFilter] = None) extends Query

  final case class SelectEventsQuery(
      metric: String, // starts with '!'
      range: TimeRange,
      regex: Option[String] = None,
      where: Where = Where.All,
      orderBy: OrderBy = OrderBy.Series,
      groupBy: Option[GroupByTag] = None,
      limit: Option[Long] = None,
      offset: Option[Long] = None,
      apply: Seq[ApplySpec] = Nil,
      location: Option[LocationFilter] = None) extends Query

  /** `{"aggregate": {"metric": "func", ...}}` — one value per series over
    * the whole (optional) range. Order-by is disallowed by the reference
    * (queryparser.cc:1499-1505). */
  final case class AggregateQuery(
      funcs: Seq[(String, AggFunc)], // (metric, func) pairs
      range: Option[TimeRange] = None,
      where: Where = Where.All,
      groupBy: Option[GroupByTag] = None,
      limit: Option[Long] = None,
      offset: Option[Long] = None,
      apply: Seq[ApplySpec] = Nil,
      location: Option[LocationFilter] = None) extends Query

  /** `{"group-aggregate": {"metric": m|[m...], "step": "30s", "func": f|[f...]}}`. */
  final case class GroupAggregateQuery(
      metrics: Seq[String],
      funcs: Seq[AggFunc],
      step: Long, // ns
      range: TimeRange,
      where: Where = Where.All,
      /** filter keyed by *function* name (HAVING), only min/max/mean legal. */
      filters: Map[String, ValueFilter] = Map.empty,
      combiner: FilterCombiner = FilterCombiner.All,
      orderBy: OrderBy = OrderBy.Series,
      groupBy: Option[GroupByTag] = None,
      limit: Option[Long] = None,
      offset: Option[Long] = None,
      apply: Seq[ApplySpec] = Nil,
      location: Option[LocationFilter] = None) extends Query

  /** `{"join": ["m1","m2",...]}` — align metrics sharing the same tag set
    * on timestamp into tuples. */
  final case class JoinQuery(
      metrics: Seq[String],
      range: TimeRange,
      where: Where = Where.All,
      filters: Map[String, ValueFilter] = Map.empty, // keyed by metric
      combiner: FilterCombiner = FilterCombiner.All,
      orderBy: OrderBy = OrderBy.Series,
      limit: Option[Long] = None,
      offset: Option[Long] = None,
      apply: Seq[ApplySpec] = Nil,
      location: Option[LocationFilter] = None) extends Query

  /** `{"asof-join": {"left": "m1", "right": "m2", "tolerance": "1h"?}}` —
    * beyond-reference: each left-metric sample carries the most recent
    * right-metric value at-or-before its timestamp within the same tag
    * set (null when nothing qualifies, or when the match is staler than
    * the optional tolerance). The alignment rule TSDB users reach for
    * when two metrics don't tick in lockstep — the reference's join only
    * aligns EXACT timestamps. */
  final case class AsofJoinQuery(
      left: String,
      right: String,
      range: TimeRange,
      toleranceNs: Option[Long] = None,
      where: Where = Where.All,
      /** Per-side value filters (metric-keyed; form-2 "" binds to left),
        * applied DURING each side's scan, before alignment — a filtered
        * right sample never supplies a carried value. */
      filters: Map[String, ValueFilter] = Map.empty,
      orderBy: OrderBy = OrderBy.Series,
      limit: Option[Long] = None,
      offset: Option[Long] = None,
      apply: Seq[ApplySpec] = Nil,
      location: Option[LocationFilter] = None) extends Query

  /** `{"group-aggregate-join": {"metric": [...], "step": s, "func": f}}` —
    * downsample each metric by step with a single func, then join. */
  final case class GroupAggregateJoinQuery(
      metrics: Seq[String],
      func: AggFunc,
      step: Long,
      range: TimeRange,
      where: Where = Where.All,
      /** per-metric filters on the DOWNSAMPLED values (the reference
        * converts each against the single func — min/max/mean only —
        * and replicates them across the join layout,
        * queryparser.cc:1869-1873, query_plan_builder.cc:235-273). */
      filters: Map[String, ValueFilter] = Map.empty,
      combiner: FilterCombiner = FilterCombiner.All,
      orderBy: OrderBy = OrderBy.Series,
      limit: Option[Long] = None,
      offset: Option[Long] = None,
      apply: Seq[ApplySpec] = Nil,
      location: Option[LocationFilter] = None) extends Query

  /** `{"seasonal": {"metric": "m", "period": "1d", "bin": "1h",
    * "p": ["0.25", "0.75"]}}` — beyond-reference: per-series seasonal
    * value bands — for each phase-of-period bin, the [pLo, pHi] bucket
    * HULL of the ranged values ([[graft.ops.Monitoring.seasonalBands]]
    * over the log-bucket histogram: bounded fit, SQL-replayable) — the
    * baseline index behind "is this value unusual FOR 3am". `bin` must
    * divide `period`; `p` is exactly two ascending quantile literals
    * (default ["0.25", "0.75"]). Output rows: (series, phase, lo, hi),
    * phase = ⌊(ts mod period)/bin⌋. */
  final case class SeasonalQuery(
      metric: String,
      periodNs: Long,
      binNs: Long,
      pLo: String,
      pHi: String,
      range: TimeRange,
      where: Where = Where.All,
      /** group-by-tag re-keying composes exactly like [[QuantileQuery]]
        * — merged series pool phase-histogram counts, so fleet-wide
        * phase bands are the per-series machinery re-keyed. */
      groupBy: Option[GroupByTag] = None,
      location: Option[LocationFilter] = None) extends Query

  /** `{"gaps": {"metric": "m", "min-gap": "12h"}}` or
    * `{"gaps": {"metric": "m", "factor": 3.0}}` — beyond-reference:
    * per-series silence intervals within the range
    * ([[graft.ops.Monitoring.gaps]]/[[graft.ops.Monitoring.gapsRelative]]
    * through the query language) — every gap between consecutive
    * in-range samples longer than the absolute `min-gap`, or (adaptive
    * form) longer than `factor` × the series' own in-range mean
    * spacing. Exactly one of the two thresholds must be given. Output
    * rows: (series, gap_start_us, gap_end_us, gap_us) — gap-count-
    * sized, never sample-sized. */
  final case class GapsQuery(
      metric: String,
      minGapNs: Option[Long],
      factor: Option[Double],
      range: TimeRange,
      where: Where = Where.All,
      location: Option[LocationFilter] = None) extends Query

  /** `{"stale": {"metric": "m", "older-than": "12h"}}` — beyond-
    * reference: registered series of the metric whose LAST in-range
    * sample is older than `range.to − older-than`, including series
    * that never wrote in the range at all (null last_ts) — "who is
    * silent NOW", with `range.to` as now
    * ([[graft.ops.Monitoring.staleSeries]] through the query
    * language; forward ranges only — a backward range has no single
    * "now" end). Output rows: (series, last_ts_us nullable). */
  final case class StaleQuery(
      metric: String,
      olderThanNs: Long,
      range: TimeRange,
      where: Where = Where.All,
      location: Option[LocationFilter] = None) extends Query

  /** `{"anomaly": {"metric": "m", "c": 3.0, "rate": 0.5}}` — beyond-
    * reference: per-series robust outliers of the ranged values —
    * samples with |x − median| > c · MAD (Hampel's identifier,
    * [[graft.ops.Monitoring.madAnomalies]] through the query
    * language). The med/MAD index fits on the ranged values; optional
    * `rate` fits it on a hash-deterministic row sample instead
    * ([[graft.ops.Monitoring.madIndexSampled]] — the bounded-memory
    * form for unbounded per-series counts; flags judge every ranged
    * sample of the INDEXED series — a series whose rows are all
    * sampled out has no baseline and drops out, the
    * no-baseline/no-judgement rule). `c` defaults to 3. Output rows:
    * (series, ts_us, value, med, mad), flagged samples only. */
  final case class AnomalyQuery(
      metric: String,
      c: Double,
      rate: Option[Double],
      range: TimeRange,
      where: Where = Where.All,
      location: Option[LocationFilter] = None) extends Query

  /** `{"active": {"metric": ["a", "b"], "step": "1d"}}` — beyond-
    * reference: per-metric count of DISTINCT series with at least one
    * sample in the range ("how many emitters are alive"), optionally
    * per `step` bin (bins anchored at `range.from`, the group-aggregate
    * rule) — the dashboard readout behind churn/cardinality monitoring.
    * The scan reduces to distinct (metric, bin, series_id) triples —
    * catalog × bins, never sample-sized. Output rows:
    * (metric, n_series) or (metric, ts_us, n_series). */
  final case class ActiveQuery(
      metrics: Seq[String],
      stepNs: Option[Long],
      range: TimeRange,
      where: Where = Where.All,
      location: Option[LocationFilter] = None) extends Query

  /** `{"sessions": {"metric": "m", "gap": "1d"}}` — beyond-reference:
    * per-series ACTIVITY sessions over the range — maximal sample runs
    * whose consecutive spacings stay under `gap` (a spacing ≥ gap
    * starts a new session; the complement of [[GapsQuery]], and the
    * batch twin of the streaming session windows). Output rows:
    * (series, start_us, end_us, n, min, max) — the observed interval
    * [first, last], its sample count, and value extrema. */
  final case class SessionsQuery(
      metric: String,
      gapNs: Long,
      range: TimeRange,
      where: Where = Where.All,
      location: Option[LocationFilter] = None) extends Query

  /** `{"changepoints": {"metric": ["m"], "step": "1d", "window": 7,
    * "min-shift": 1.0}}` — beyond-reference: per-metric level shifts of
    * the bucket-mean series over the range
    * ([[graft.ops.Stats.levelShifts]] — the two-window mean-shift
    * detector): at each occupied bucket, the unweighted means of the
    * `window` occupied buckets before and from it, flagged when
    * |shift| ≥ `min-shift` (rounded-6dp compare; a step change flags
    * up to `window` consecutive boundaries — the run's extremum is the
    * change's best estimate). Buckets are EPOCH-aligned like
    * `correlate`/`trend`, and the same registered bucket-sums index
    * serves aligned statements. Output rows:
    * (metric, ts_us, before_mean, after_mean, shift). */
  final case class ChangepointsQuery(
      metrics: Seq[String],
      stepNs: Long,
      window: Int,
      minShift: Double,
      range: TimeRange,
      where: Where = Where.All,
      location: Option[LocationFilter] = None) extends Query

  /** `{"distinct": {"metric": ["m"], "tag": "user", "k": 256,
    * "step": "1d"}}` — beyond-reference: per-metric ESTIMATED count of
    * distinct values of `tag` among series with at least one sample in
    * the range, optionally per `step` bin — [[ActiveQuery]]'s
    * high-cardinality twin. `active` counts distinct series exactly
    * (right while the per-bin active set is catalog-bounded); when the
    * tag universe itself explodes (user/session/request tags), the KMV
    * sketch ([[graft.ops.Sketches]]) bounds what crosses the wire: at
    * most `k` hashes per (metric, bin) survive the map-side
    * WindowGroupLimit cut, whatever the true cardinality. Estimates are
    * deterministic hash arithmetic (oracle-replayable, unlike HLL);
    * groups holding < k distinct values report exactly. Series lacking
    * the tag contribute nothing. Output rows:
    * (metric, n_kept, est_distinct) or
    * (metric, ts_us, n_kept, est_distinct). */
  final case class DistinctQuery(
      metrics: Seq[String],
      tag: String,
      k: Int,
      stepNs: Option[Long],
      range: TimeRange,
      where: Where = Where.All,
      /** optional value filter on the samples that count as activity
        * ("distinct users with a purchase over 150" — the qualifying-
        * population question). A registered rollup stores no values, so
        * index serving abstains when a filter is present (the quantile
        * statement's rule). */
      filter: Option[ValueFilter] = None,
      location: Option[LocationFilter] = None) extends Query

  /** `{"correlate": {"metric": ["a", "b"], "step": "1h", "lag": "1d"}}`
    * — beyond-reference: Pearson correlation between the named metrics'
    * bucket-mean series over the range
    * ([[graft.ops.Stats.corrAligned]]: milli-quantized integer moments,
    * the fact scan reduces to a metrics × buckets frame before anything
    * pairs). Buckets are EPOCH-aligned, not range-anchored: the
    * alignment grid is absolute, so correlations from different ranges
    * are comparable. Optional `lag` (a whole number of steps) leads the
    * second metric of each pair: corr of a at bucket b with b at
    * bucket b + lag. Output rows: (key_a, key_b, n_buckets, corr),
    * key_a < key_b. */
  final case class CorrelateQuery(
      metrics: Seq[String],
      stepNs: Long,
      lagNs: Long,
      range: TimeRange,
      where: Where = Where.All,
      location: Option[LocationFilter] = None) extends Query

  /** `{"trend": {"metric": ["a"], "step": "1h", "horizon": "1d"}}` —
    * beyond-reference: per-metric ordinary-least-squares trend of the
    * bucket-mean series over the range and the line's value `horizon`
    * past the metric's last observed bucket
    * ([[graft.ops.Stats.trend]]: milli-quantized integer moments, the
    * fact scan reduces to a metrics × buckets frame before the window
    * rebase; the predict_linear analog). `horizon` must be a whole
    * number of steps (default 0 = the line AT the last bucket).
    * Buckets are EPOCH-aligned like `correlate`. Output rows:
    * (metric, n_buckets, slope, forecast, ts_us) — slope in units per
    * step; metrics with < 2 occupied buckets yield null slope and
    * forecast. */
  final case class TrendQuery(
      metrics: Seq[String],
      stepNs: Long,
      horizonNs: Long,
      range: TimeRange,
      where: Where = Where.All,
      location: Option[LocationFilter] = None) extends Query

  /** `{"autocorr": {"metric": ["a"], "step": "1h",
    * "lags": ["1h", "1d", "1w"]}}` — beyond-reference: per-metric
    * autocorrelation of the bucket-mean series at the requested lags —
    * the periodicity readout ("does this metric breathe daily?") that
    * justifies a `seasonal` period choice, through the query language
    * ([[graft.ops.Stats.autocorr]]'s machinery; corr of the series
    * with itself shifted by each lag). Each lag is a duration that
    * must be a positive whole number of steps; buckets are
    * EPOCH-aligned like `correlate`, and the same registered
    * bucket-sums index serves aligned statements. Output rows:
    * (metric, lag, n_buckets, corr) — lag in steps; lags with < 2
    * overlapping buckets or a zero-variance side yield null corr. */
  final case class AutocorrQuery(
      metrics: Seq[String],
      stepNs: Long,
      lagsNs: Seq[Long],
      range: TimeRange,
      where: Where = Where.All,
      location: Option[LocationFilter] = None) extends Query

  /** `{"quantile": {"metric": "m", "p": [0.5, 0.99]}}` — beyond-
    * reference: per-series quantiles of the values in the range, served
    * from the mergeable log-bucketed histogram
    * ([[graft.ops.HistQuantiles]] — bounded memory per series at any
    * row count; answers within 12.5% relative PLUS one micro-unit
    * below the true order statistic, never above, on both signs — the
    * 1 µu term is the bucket-width floor, dominant only at micro-unit
    * magnitudes; only the ±1 µu underflow band around zero can report
    * above, by up to 1 µu). `ps` keep the caller's DECIMAL TEXT so the
    * output `p` labels — and any oracle replay — see the identical
    * literals (string-typed `p` entries; JSON numbers are
    * parser-normalized). Output rows: (series, p, q). */
  final case class QuantileQuery(
      metric: String,
      ps: Seq[String],
      range: TimeRange,
      /** optional `step`: per-bin quantiles (bins anchored at
        * `range.from`, the group-aggregate rule) — the "p99 per day"
        * dashboard query; output gains a `ts_us` bin column. */
      stepNs: Option[Long] = None,
      where: Where = Where.All,
      /** group-by-tag / pivot-by-tag re-keying composes: series merged
        * under one output name pool their bucket COUNTS (exact — the
        * histogram is mergeable), so "p99 across the fleet" is the
        * same machinery as per-series percentiles. */
      groupBy: Option[GroupByTag] = None,
      /** optional value filter applied to the scan BEFORE the histogram
        * ("p99 of the values above zero" — SLO floors, error codes).
        * A registered index stores unfiltered bucket counts and cannot
        * apply an arbitrary threshold, so index serving abstains when
        * a filter is present. */
      filter: Option[ValueFilter] = None,
      location: Option[LocationFilter] = None) extends Query

  // ---- metadata entry points ----

  final case class SearchQuery(
      metric: String,
      where: Where = Where.All,
      limit: Option[Long] = None,
      offset: Option[Long] = None) extends Query

  sealed trait SuggestKind
  object SuggestKind {
    case object MetricNames extends SuggestKind
    case object TagNames extends SuggestKind
    case object TagValues extends SuggestKind
  }
  final case class SuggestQuery(
      kind: SuggestKind,
      metric: Option[String] = None,
      tag: Option[String] = None,
      startsWith: Option[String] = None,
      limit: Option[Long] = None,
      offset: Option[Long] = None) extends Query

  // ---- LLM-pipeline statements (beyond-reference: one query surface
  // for both halves — the reference dispatches every statement kind
  // through one parser, queryparser.cc:887-918, and "same
  // capabilities" for its user means the pipeline operators answer to
  // the same JSON front end as the TSDB ones) ----

  /** `{"knn": {"queries": "<predicate>", "k": N, "index":
    * "brute"|"ivf", ...}}` — top-k cosine similarity search over the
    * context's registered embeddings table (columns `id`,
    * `embedding`). `queries` is a boolean SQL expression over that
    * table's columns selecting the query vectors (Catalyst is the
    * expression engine, the `eval` apply-node precedent); everything
    * is searched. `index: "ivf"` probes `nprobe` cells of an `nlist`
    * codebook — the context's registered [[graft.model.TsdbContext
    * .embeddingStore]] when its recipe matches `nlist` (persisted
    * cell-partitioned index, partition-pruned probes), else the
    * registered [[graft.model.TsdbContext.ivfCodebook]] when its size
    * matches `nlist`, else a deterministic Lloyd fit of `iters`
    * rounds; `"ivfpq"` (requires `m`/`ksub`) scores IVF candidates by
    * PQ asymmetric distance — the form an operator actually serves
    * 100 TB with — preferring the store's persisted codes; `"brute"`
    * is the exact scan (nlist/nprobe/iters/m/ksub must be absent).
    * Output (qid, id, rank, cos) — ivfpq ranks by ADC and returns
    * (qid, id, rank, adist). */
  final case class KnnQuery(
      k: Int, queries: String, index: String,
      nlist: Option[Int] = None, nprobe: Int = 2,
      iters: Int = 2, m: Option[Int] = None,
      ksub: Option[Int] = None) extends Query

  /** `{"dedup": {"batch": "<predicate>", "threshold": t, ...}}` —
    * incremental dedup of a batch against the rest of the context's
    * registered documents table (columns `id`, `text`): rows matching
    * the `batch` predicate are the arriving batch, everything else the
    * corpus ([[graft.pipeline.Dedup.dedupAgainstCorpus]]'s split).
    * Output (id, exact_dup_of, near_dup_of, status) per batch row. */
  final case class DedupQuery(
      batch: String, threshold: Double,
      k: Int = 3, numPerm: Int = 32, bands: Int = 8) extends Query
}
