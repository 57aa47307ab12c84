package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.query.Ast.AggFunc

/** Materialized downsample rollups — the Spark analog of the reference's
  * per-block SubtreeRef aggregates (stdb/storage/nbtree_def.h:47-84:
  * count/min/max/sum/first/last + the timestamps of min/max/first/last),
  * which let whole-range and coarse-step aggregates answer from interior
  * nodes without touching leaves (nbtree.h:457; SURVEY §4 "aggregate
  * pushdown").
  *
  * [[write]] precomputes the full accumulator per (series, fine bin) once;
  * [[reaggregate]] answers any aggregate whose step is a multiple of the
  * fine step — and any whole-range aggregate — from the rollup alone,
  * using the same combination law as the reference's
  * AggregationResult::combine. At 100 TB a 1-minute rollup is ~1/60th the
  * raw sample count per series: coarse dashboards and long-range
  * aggregates stop scanning raw data entirely.
  *
  * FRESHNESS CONTRACT: a rollup registered with the engine must be
  * COMPLETE over every range it may serve — whole-history aggregates and
  * fully-aligned ranges read the rollup INSTEAD of raw samples. A
  * streaming-maintained rollup (TsdbStream.rollupBuild, append mode)
  * finalizes a bin only after the watermark passes it, so it lags live
  * ingest by up to lateness + one fine step: either bound queries to the
  * finalized horizon, or rebuild batch-complete before serving
  * whole-history answers from it.
  */
object Rollup {

  /** Accumulator column names, in canonical order. */
  val accNames: Seq[String] = Seq("cnt", "sum", "vmin", "vmax", "first",
    "last", "ts_of_min", "ts_of_max", "ts_min", "ts_max")

  /** The accumulator aggregate columns over raw (ts, value) rows — used by
    * [[build]] and by the engine's raw-edge aggregation when a query range
    * is not aligned to the rollup's fine step. */
  def buildAggs: Seq[Column] = Seq(
    count(col("value")).as("cnt"),
    sum(col("value")).as("sum"),
    min(col("value")).as("vmin"),
    max(col("value")).as("vmax"),
    min(struct(col("ts"), col("value"))).getField("value").as("first"),
    max(struct(col("ts"), col("value"))).getField("value").as("last"),
    min(struct(col("value"), col("ts"))).getField("ts").as("ts_of_min"),
    max(struct(col("value"), col("ts"))).getField("ts").as("ts_of_max"),
    min(col("ts")).as("ts_min"),
    max(col("ts")).as("ts_max"))

  /** The SubtreeRef-style accumulator per (series_id, bin). Bins are
    * epoch-aligned: bin = ts - ts % step (exact Long arithmetic). */
  def build(samples: DataFrame, stepNs: Long): DataFrame = {
    require(stepNs > 0, "rollup step must be positive")
    samples
      .withColumn("bin", col("ts") - pmod(col("ts"), lit(stepNs)))
      .groupBy("series_id", "bin")
      .agg(buildAggs.head, buildAggs.tail: _*)
  }

  /** Persist a rollup next to the fact data. */
  def write(samples: DataFrame, path: String, stepNs: Long): Unit =
    build(samples, stepNs).write.mode("overwrite").parquet(path)

  /** Compact a persisted fine rollup into a coarser one (hour → day →
    * month): [[reaggregate]] is closed under the associative combine law
    * (RollupSpec pins it), so each level builds from the previous one and
    * raw data is never rescanned — the compaction ladder that keeps
    * decade-scale histories queryable. */
  def compact(spark: org.apache.spark.sql.SparkSession,
      inPath: String, outPath: String,
      fineStepNs: Long, coarseStepNs: Long): Unit = {
    require(fineStepNs > 0 && coarseStepNs > 0 &&
      coarseStepNs % fineStepNs == 0,
      "coarse step must be a positive multiple of the fine step")
    reaggregate(spark.read.parquet(inPath), Some(coarseStepNs))
      .write.mode("overwrite").parquet(outPath)
  }

  /** The accumulator-combination aggregate columns
    * (AggregationResult::combine as column algebra). */
  def combineAggs: Seq[Column] = Seq(
    sum(col("cnt")).as("cnt"),
    sum(col("sum")).as("sum"),
    min(col("vmin")).as("vmin"),
    max(col("vmax")).as("vmax"),
    min(struct(col("ts_min"), col("first"))).getField("first").as("first"),
    max(struct(col("ts_max"), col("last"))).getField("last").as("last"),
    min(struct(col("vmin"), col("ts_of_min"))).getField("ts_of_min").as("ts_of_min"),
    max(struct(col("vmax"), col("ts_of_max"))).getField("ts_of_max").as("ts_of_max"),
    min(col("ts_min")).as("ts_min"),
    max(col("ts_max")).as("ts_max"))

  /** Accumulator columns an extraction of `funcs` actually reads — closed
    * under the combine law's own reads (e.g. combining `first` consults
    * `ts_min`, combining `ts_of_min` consults `vmin`), so
    * [[combineAggsFor]] of this set is self-contained. Serving a
    * min/max/cnt query then combines 3 plain columns instead of all 10
    * (4 of which are struct-ordering aggs) — on the hot path this is the
    * difference between the rollup paying for itself and not. */
  def neededAccs(funcs: Seq[AggFunc]): Seq[String] = {
    val per: AggFunc => Seq[String] = {
      case AggFunc.Min            => Seq("vmin")
      case AggFunc.Max            => Seq("vmax")
      case AggFunc.Sum            => Seq("sum")
      case AggFunc.Cnt            => Seq("cnt")
      case AggFunc.Mean           => Seq("sum", "cnt")
      case AggFunc.First          => Seq("first", "ts_min")
      case AggFunc.Last           => Seq("last", "ts_max")
      case AggFunc.MinTimestamp   => Seq("ts_of_min", "vmin")
      case AggFunc.MaxTimestamp   => Seq("ts_of_max", "vmax")
      case AggFunc.FirstTimestamp => Seq("ts_min")
      case AggFunc.LastTimestamp  => Seq("ts_max")
    }
    val wanted = funcs.flatMap(per).toSet
    accNames.filter(wanted)
  }

  /** [[combineAggs]] restricted to `names` (use [[neededAccs]] so every
    * column a kept agg reads is itself kept). */
  def combineAggsFor(names: Seq[String]): Seq[Column] = {
    val byName = accNames.zip(combineAggs).toMap
    names.map(byName)
  }

  /** The accumulator value of a SINGLE raw sample (ts, value) — what a
    * fine bin containing exactly that sample would store. Lets raw edge
    * samples ride the combine aggregation as singleton rows. */
  def singletonAcc(name: String): Column = name match {
    case "cnt"                                        => lit(1L)
    case "sum" | "vmin" | "vmax" | "first" | "last"   => col("value")
    case _ /* ts_of_min ts_of_max ts_min ts_max */    => col("ts")
  }

  /** Combine fine-bin accumulators into coarser bins (coarse step must be
    * a multiple of the rollup's fine step). `coarseStepNs = None` folds
    * the whole range into one accumulator per series. */
  def reaggregate(rollup: DataFrame, coarseStepNs: Option[Long]): DataFrame = {
    val binned = coarseStepNs match {
      case Some(step) =>
        rollup.withColumn("bin", col("bin") - pmod(col("bin"), lit(step)))
      case None => rollup.withColumn("bin", lit(0L))
    }
    binned.groupBy("series_id", "bin").agg(combineAggs.head, combineAggs.tail: _*)
  }

  /** Extract an aggregation function's value from the accumulator columns
    * (TupleOutputUtils::get, stdb/storage/tuples.h:52-88). */
  def extract(f: AggFunc): Column = f match {
    case AggFunc.Min => col("vmin")
    case AggFunc.Max => col("vmax")
    case AggFunc.Sum => col("sum")
    case AggFunc.Cnt => col("cnt").cast(DoubleType)
    case AggFunc.Mean => col("sum") / col("cnt")
    case AggFunc.First => col("first")
    case AggFunc.Last => col("last")
    case AggFunc.MinTimestamp => col("ts_of_min").cast(DoubleType)
    case AggFunc.MaxTimestamp => col("ts_of_max").cast(DoubleType)
    case AggFunc.FirstTimestamp => col("ts_min").cast(DoubleType)
    case AggFunc.LastTimestamp => col("ts_max").cast(DoubleType)
  }

  /** Answer a group-aggregate from the rollup: one column per requested
    * function, bins of `coarseStepNs` (a multiple of the build step). */
  def groupAggregate(rollup: DataFrame, funcs: Seq[AggFunc],
      coarseStepNs: Long): DataFrame = {
    val combined = reaggregate(rollup, Some(coarseStepNs))
    combined.select(
      col("series_id") +: col("bin") +: funcs.map(f => extract(f).as(f.token)): _*)
  }
}
