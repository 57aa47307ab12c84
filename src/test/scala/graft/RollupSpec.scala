package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.engine.Rollup
import graft.query.Ast.AggFunc

/** Rollup accumulators must reproduce exactly what direct aggregation of
  * the raw samples gives, for every function and at every coarser step —
  * the combination law of the reference's AggregationResult. */
class RollupSpec extends AnyFunSuite with SparkTestBase {

  // values chosen so min/max/first/last land on distinct rows
  private lazy val ctx = rampContext(Seq(1, 2), 100, 200,
    value = ts => ((ts * 7919) % 101).toDouble)

  private def direct(stepNs: Long) = {
    val f = AggFunc.all
    ctx.samples
      .withColumn("bin", col("ts") - pmod(col("ts"), lit(stepNs)))
      .groupBy("series_id", "bin")
      .agg(
        min(col("value")).as("min"), max(col("value")).as("max"),
        sum(col("value")).as("sum"),
        count(col("value")).cast(DoubleType).as("cnt"),
        avg(col("value")).as("mean"),
        min(struct(col("ts"), col("value"))).getField("value").as("first"),
        max(struct(col("ts"), col("value"))).getField("value").as("last"),
        min(struct(col("value"), col("ts"))).getField("ts").cast(DoubleType).as("min_timestamp"),
        max(struct(col("value"), col("ts"))).getField("ts").cast(DoubleType).as("max_timestamp"),
        min(col("ts")).cast(DoubleType).as("first_timestamp"),
        max(col("ts")).cast(DoubleType).as("last_timestamp"))
  }

  test("rollup reaggregation equals direct aggregation for all 11 functions") {
    val rollup = Rollup.build(ctx.samples, stepNs = 10)
    for (coarse <- Seq(10L, 20L, 50L)) {
      val fromRollup = Rollup.groupAggregate(rollup, AggFunc.all, coarse)
        .orderBy("series_id", "bin").collect().map(_.toSeq)
      val fromRaw = direct(coarse)
        .select(col("series_id") :: col("bin") ::
          AggFunc.all.map(f => col(f.token)).toList: _*)
        .orderBy("series_id", "bin").collect().map(_.toSeq)
      assert(fromRollup.toSeq === fromRaw.toSeq, s"coarse step $coarse")
    }
  }

  test("rollup hierarchy: coarse built FROM the fine rollup equals coarse from raw") {
    // the hierarchical-compaction law (hour -> day -> month at a
    // deployment): reaggregate is closed under composition because the
    // accumulator combine law is associative
    val fine = Rollup.build(ctx.samples, stepNs = 10)
    val coarseFromFine = Rollup.reaggregate(fine, Some(50L))
    val coarseFromRaw = Rollup.build(ctx.samples, stepNs = 50)
    val a = coarseFromFine.orderBy("series_id", "bin").collect().map(_.toSeq)
    val b = coarseFromRaw.orderBy("series_id", "bin").collect().map(_.toSeq)
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      // 9 of 10 accumulator fields are exact (min/max/cnt/first/last/ts);
      // sum is FP-reassociated by the two-level combine — tolerance only
      val names = Seq("series_id", "bin") ++ Rollup.accNames
      names.zip(x).zip(y).foreach {
        case (("sum", xv: Double), yv: Double) =>
          assert(math.abs(xv - yv) <= 1e-9 * math.max(1.0, math.abs(yv)))
        case ((_, xv), yv) => assert(xv === yv)
      }
    }
  }

  test("whole-range reaggregate answers aggregate queries from the rollup") {
    val rollup = Rollup.build(ctx.samples, stepNs = 10)
    val whole = Rollup.reaggregate(rollup, None)
      .select(col("series_id"), Rollup.extract(AggFunc.Sum).as("sum"),
        Rollup.extract(AggFunc.Cnt).as("cnt"))
      .orderBy("series_id").collect().map(_.toSeq)
    val raw = ctx.samples.groupBy("series_id")
      .agg(sum("value").as("sum"), count(lit(1)).cast(DoubleType).as("cnt"))
      .orderBy("series_id").collect().map(_.toSeq)
    assert(whole.map(_.drop(1)).toSeq === raw.map(_.drop(1)).toSeq)
  }

  test("engine serves aligned group-aggregates from the rollup, not raw samples") {
    import graft.engine.Engine
    import graft.query.Ast._
    val rollup = Rollup.build(ctx.samples, stepNs = 10)
    val q = GroupAggregateQuery(Seq("test"), Seq(AggFunc.Min, AggFunc.Mean, AggFunc.Last),
      step = 20, range = TimeRange(100, 200))
    val direct = new Engine(ctx).groupAggregate(q).collect().map(_.toSeq)
    // poisoned samples: if the engine touched raw data the result would be empty
    val emptySamples = ctx.samples.where(lit(false))
    val viaRollup = new Engine(ctx.copy(
      samples = emptySamples, rollups = Seq(10L -> rollup)))
      .groupAggregate(q).collect().map(_.toSeq)
    assert(viaRollup.toSeq === direct.toSeq)
    assert(viaRollup.nonEmpty)

  }

  test("unaligned ranges serve interior bins from the rollup, edges from raw") {
    import graft.engine.Engine
    import graft.query.Ast._
    val rollup = Rollup.build(ctx.samples, stepNs = 10)
    val q = GroupAggregateQuery(Seq("test"), Seq(AggFunc.Min, AggFunc.Cnt, AggFunc.Last),
      step = 20, range = TimeRange(105, 195))

    // hybrid result must equal the pure raw scan on the same data
    val direct = new Engine(ctx).groupAggregate(q)
      .orderBy("series", "ts").collect().map(_.toSeq)
    val hybrid = new Engine(ctx.copy(rollups = Seq(10L -> rollup)))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(hybrid.toSeq === direct.toSeq)
    assert(hybrid.nonEmpty)

    // poison raw samples ONLY inside interior fine bins (the engine's own
    // interior predicate): with the rollup present the result must still
    // equal the unpoisoned direct answer — interior data came from the
    // rollup; only edge samples were read raw
    val fine = 10L; val from = 105L; val to = 195L; val step = 20L
    def qbin(c: org.apache.spark.sql.Column) =
      lit(from) + ((c - from) - pmod(c - from, lit(step)))
    val fineBin = col("ts") - pmod(col("ts"), lit(fine))
    val interior = fineBin >= from && fineBin + fine <= to &&
      qbin(fineBin) === qbin(fineBin + (fine - 1))
    val poisoned = ctx.samples.withColumn("value",
      when(interior, lit(-1e18)).otherwise(col("value")))
    val viaRollup = new Engine(ctx.copy(
      samples = poisoned, rollups = Seq(10L -> rollup)))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(viaRollup.toSeq === direct.toSeq)

    // sanity: without the rollup the poison leaks into the result
    val noRollup = new Engine(ctx.copy(samples = poisoned))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(noRollup.toSeq !== direct.toSeq)
  }

  test("whole-history AGGREGATE queries serve entirely from the rollup") {
    import graft.engine.Engine
    import graft.query.Ast._
    val rollup = Rollup.build(ctx.samples, stepNs = 10)
    val q = AggregateQuery(Seq("test" -> AggFunc.Min, "test" -> AggFunc.Cnt,
      "test" -> AggFunc.Last, "test" -> AggFunc.Mean))
    val direct = new Engine(ctx).aggregate(q)
      .orderBy("series", "ts").collect().map(_.toSeq)
    // no range → no edges → raw samples must never be read
    val viaRollup = new Engine(ctx.copy(
      samples = ctx.samples.where(lit(false)), rollups = Seq(10L -> rollup)))
      .aggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(viaRollup.toSeq === direct.toSeq)
    assert(viaRollup.nonEmpty)
  }

  test("range-bounded AGGREGATE serves from the rollup (single-bin case)") {
    import graft.engine.Engine
    import graft.query.Ast._
    val rollup = Rollup.build(ctx.samples, stepNs = 10)
    // aligned range → zero edges → rollup-only even at this density
    val q = AggregateQuery(Seq("test" -> AggFunc.Min, "test" -> AggFunc.Cnt,
      "test" -> AggFunc.Mean), range = Some(TimeRange(100, 200)))
    val direct = new Engine(ctx).aggregate(q)
      .orderBy("series", "ts").collect().map(_.toSeq)
    val viaRollup = new Engine(ctx.copy(
      samples = ctx.samples.where(lit(false)), rollups = Seq(10L -> rollup)))
      .aggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(viaRollup.toSeq === direct.toSeq)
    assert(viaRollup.nonEmpty)
    // unaligned range: hybrid (interior + raw edges) must equal direct
    val q2 = AggregateQuery(Seq("test" -> AggFunc.Min, "test" -> AggFunc.Cnt),
      range = Some(TimeRange(105, 195)))
    val d2 = new Engine(ctx).aggregate(q2)
      .orderBy("series", "ts").collect().map(_.toSeq)
    val h2 = new Engine(ctx.copy(rollups = Seq(10L -> rollup)))
      .aggregate(q2).orderBy("series", "ts").collect().map(_.toSeq)
    assert(h2.toSeq === d2.toSeq)
  }

  test("with several rollups registered the coarsest eligible serves") {
    import graft.engine.Engine
    import graft.query.Ast._
    val fine = Rollup.build(ctx.samples, stepNs = 10)
    val coarse = Rollup.build(ctx.samples, stepNs = 50)
    val q = GroupAggregateQuery(Seq("test"), Seq(AggFunc.Min, AggFunc.Cnt),
      step = 50, range = TimeRange(100, 600))
    val direct = new Engine(ctx).groupAggregate(q)
      .orderBy("series", "ts").collect().map(_.toSeq)
    // poison the FINE rollup: both are eligible (50 % 10 == 0), so an
    // unchanged result proves the coarser one answered
    val poisonedFine = fine.withColumn("vmin", lit(-1e18))
    val served = new Engine(ctx.copy(
      samples = ctx.samples.where(lit(false)),
      rollups = Seq(10L -> poisonedFine, 50L -> coarse)))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(served.toSeq === direct.toSeq)
    assert(served.nonEmpty)
  }

  test("a coarse level that abstains falls through to the finer level, not raw") {
    import graft.engine.Engine
    import graft.query.Ast._
    // ladder (5, 10) with step == coarse and an UNALIGNED range: every
    // coarse bin straddles a query-bin boundary (noInterior → the coarse
    // level abstains), but the fine level serves hybrid (density 5 ≥
    // guard). The engine must fall through the ladder level by level —
    // answering from the highest subtree that can actually serve
    // (nbtree.h:457) — instead of scanning raw the moment the coarsest
    // eligible level bows out.
    val fine = Rollup.build(ctx.samples, stepNs = 5)
    val coarse = Rollup.build(ctx.samples, stepNs = 10)
    val q = GroupAggregateQuery(Seq("test"), Seq(AggFunc.Min, AggFunc.Cnt),
      step = 10, range = TimeRange(101, 199))
    val direct = new Engine(ctx).groupAggregate(q)
      .orderBy("series", "ts").collect().map(_.toSeq)
    assert(direct.nonEmpty)
    // poisoned COARSE level: unchanged result proves it was never read
    val viaLadder = new Engine(ctx.copy(
      rollups = Seq(5L -> fine, 10L -> coarse.withColumn("vmin", lit(-1e18)))))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(viaLadder.toSeq === direct.toSeq)
    // poisoned FINE level: a changed result proves the fall-through landed
    // on the fine rollup (pre-fix the engine would scan raw here and the
    // poison would be inert)
    val viaPoisonedFine = new Engine(ctx.copy(
      rollups = Seq(5L -> fine.withColumn("vmin", lit(-1e18)), 10L -> coarse)))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(viaPoisonedFine.exists(_.contains(-1e18)),
      "the fine level must serve the interior once the coarse level abstains")
  }

  test("the coarse ladder level serves hybrid (interior + raw edges), finer level unread") {
    import graft.engine.Engine
    import graft.query.Ast._
    // ladder (5, 10), step 10, range 100..197: query bins anchor at the
    // range START, so bins 100..180 each coincide with one whole coarse
    // bin (the coarse level is eligible and dense → serves them) while
    // the ragged tail bin [190,197) is partial and comes from raw. The
    // week-over-(hour,day) deployment shape in miniature: the coarsest
    // level that can serve does, and the rest of the ladder is never
    // read. (A range whose START is off the coarse grid instead makes
    // every coarse bin straddle → coarse abstains and falls through —
    // that scenario is the fall-through test above.)
    val fine = Rollup.build(ctx.samples, stepNs = 5)
    val coarse = Rollup.build(ctx.samples, stepNs = 10)
    val q = GroupAggregateQuery(Seq("test"), Seq(AggFunc.Min, AggFunc.Cnt),
      step = 10, range = TimeRange(100, 197))
    val direct = new Engine(ctx).groupAggregate(q)
      .orderBy("series", "ts").collect().map(_.toSeq)
    assert(direct.nonEmpty)
    // poisoned FINE level, clean coarse: unchanged result proves the
    // hybrid (coarse interior + raw edges) never reads the finer level
    val served = new Engine(ctx.copy(rollups = Seq(
      5L -> fine.withColumn("vmin", lit(-1e18)), 10L -> coarse)))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(served.toSeq === direct.toSeq)
    // poisoned COARSE level, clean fine: a changed result proves the
    // interior really came from the coarse rollup (not raw, not fine —
    // the coarsest eligible level wins under hybrid serving too)
    val viaPoisonedCoarse = new Engine(ctx.copy(rollups = Seq(
      5L -> fine, 10L -> coarse.withColumn("vmin", lit(-1e18)))))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(viaPoisonedCoarse.exists(_.contains(-1e18)),
      "the coarse level must serve the hybrid interior")
  }

  test("sparse data abstains from hybrid rollup serving (density guard)") {
    import graft.engine.Engine
    import graft.query.Ast._
    // ~1 sample per fine bin: the rollup is no smaller than the raw data
    // (avg cnt = 1 < RollupMinDensity), so an UNALIGNED range must be
    // served by the plain raw scan — proven by poisoning the ROLLUP:
    // if the engine read it, the result would change
    val sparse = ctx.copy(samples = ctx.samples.where(pmod(col("ts"), lit(10)) === 0))
    val q = GroupAggregateQuery(Seq("test"), Seq(AggFunc.Min, AggFunc.Cnt),
      step = 20, range = TimeRange(105, 195))
    val direct = new Engine(sparse).groupAggregate(q)
      .orderBy("series", "ts").collect().map(_.toSeq)
    val poisonedRollup = Rollup.build(sparse.samples, stepNs = 10)
      .withColumn("vmin", lit(-1e18))
    val viaGuard = new Engine(sparse.copy(rollups = Seq(10L -> poisonedRollup)))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(viaGuard.toSeq === direct.toSeq)
    assert(viaGuard.nonEmpty)
  }

  test("fully-aligned wide ranges read ONLY the rollup at any density") {
    import graft.engine.Engine
    import graft.query.Ast._
    // same sparse data, but an aligned range has zero edge windows: the
    // density guard is exempt and raw samples are never touched — proven
    // with an empty samples table
    val sparse = ctx.copy(samples = ctx.samples.where(pmod(col("ts"), lit(10)) === 0))
    val q = GroupAggregateQuery(Seq("test"), Seq(AggFunc.Min, AggFunc.Cnt),
      step = 20, range = TimeRange(100, 200))
    val direct = new Engine(sparse).groupAggregate(q)
      .orderBy("series", "ts").collect().map(_.toSeq)
    val rollup = Rollup.build(sparse.samples, stepNs = 10)
    val viaRollup = new Engine(sparse.copy(
      samples = sparse.samples.where(lit(false)), rollups = Seq(10L -> rollup)))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(viaRollup.toSeq === direct.toSeq)
    assert(viaRollup.nonEmpty)
  }

  test("group-by-tag composes with rollup serving (fan-in across source series)") {
    import graft.engine.Engine
    import graft.query.Ast._
    // dropping the only tag merges both series into one output key, so
    // interior rollup accumulators combine ACROSS series (the reference's
    // FanInAggregateOperator, aggregate.h:48-68) under the same law
    val rollup = Rollup.build(ctx.samples, stepNs = 10)
    val q = GroupAggregateQuery(Seq("test"), Seq(AggFunc.Min, AggFunc.Cnt, AggFunc.Mean),
      step = 20, range = TimeRange(105, 195),
      groupBy = Some(GroupByTag(GroupByOp.Group, Seq("tag"))))
    val direct = new Engine(ctx).groupAggregate(q)
      .orderBy("series", "ts").collect().map(_.toSeq)
    assert(direct.nonEmpty)
    assert(direct.forall(_.head === "test:min|test:cnt|test:mean"))
    val hybrid = new Engine(ctx.copy(rollups = Seq(10L -> rollup)))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(hybrid.toSeq === direct.toSeq)

    // poison interior fine bins: equality with direct proves the interior
    // of the merged aggregate was served by the rollup, per source series
    val fine = 10L; val from = 105L; val to = 195L; val step = 20L
    def qbin(c: org.apache.spark.sql.Column) =
      lit(from) + ((c - from) - pmod(c - from, lit(step)))
    val fineBin = col("ts") - pmod(col("ts"), lit(fine))
    val interior = fineBin >= from && fineBin + fine <= to &&
      qbin(fineBin) === qbin(fineBin + (fine - 1))
    val poisoned = ctx.samples.withColumn("value",
      when(interior, lit(-1e18)).otherwise(col("value")))
    val viaRollup = new Engine(ctx.copy(
      samples = poisoned, rollups = Seq(10L -> rollup)))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(viaRollup.toSeq === direct.toSeq)
  }

  test("backward ranges also serve interior bins from the rollup") {
    import graft.engine.Engine
    import graft.query.Ast._
    val rollup = Rollup.build(ctx.samples, stepNs = 10)
    val q = GroupAggregateQuery(Seq("test"), Seq(AggFunc.Min, AggFunc.Cnt, AggFunc.Last),
      step = 20, range = TimeRange(195, 105)) // backward: from > to
    val direct = new Engine(ctx).groupAggregate(q)
      .orderBy("series", "ts").collect().map(_.toSeq)
    assert(direct.nonEmpty)
    val hybrid = new Engine(ctx.copy(rollups = Seq(10L -> rollup)))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(hybrid.toSeq === direct.toSeq)

    // poison interior fine bins (backward interior predicate): result must
    // still equal direct — interior served from the rollup
    val fine = 10L; val from = 195L; val to = 105L; val step = 20L
    def qbinB(c: org.apache.spark.sql.Column) =
      lit(from) - ((lit(from) - c) - pmod(lit(from) - c, lit(step)))
    val fineBin = col("ts") - pmod(col("ts"), lit(fine))
    val interior = fineBin > to && fineBin + (fine - 1) <= from &&
      qbinB(fineBin) === qbinB(fineBin + (fine - 1))
    val poisoned = ctx.samples.withColumn("value",
      when(interior, lit(-1e18)).otherwise(col("value")))
    val viaRollup = new Engine(ctx.copy(
      samples = poisoned, rollups = Seq(10L -> rollup)))
      .groupAggregate(q).orderBy("series", "ts").collect().map(_.toSeq)
    assert(viaRollup.toSeq === direct.toSeq)
  }

  test("rollup-backed engine ≡ plain engine over random range/step geometry") {
    import graft.engine.Engine
    import graft.query.Ast._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // dense ramp (1 sample per tick, density 10 per fine bin) so wide
    // ranges actually serve from the rollup; equality must hold no matter
    // which guard fires (hybrid, aligned-only, abstain) — this sweeps the
    // edge-window enumeration over arbitrary alignment geometry. Exact
    // funcs only (sum/mean are FP-reassociated by ANY partial agg).
    val rollup = Rollup.build(ctx.samples, stepNs = 10)
    val plain = new Engine(ctx)
    val backed = new Engine(ctx.copy(rollups = Seq(10L -> rollup)))
    val gen = for {
      stepMult <- Gen.chooseNum(1, 6)
      offFrom <- Gen.chooseNum(0L, 29L)
      offTo <- Gen.chooseNum(0L, 29L)
      backward <- Gen.oneOf(true, false)
    } yield (stepMult, offFrom, offTo, backward)
    (0 until 8).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach {
        case (stepMult, offFrom, offTo, backward) =>
          val (lo, hi) = (100L + offFrom, 200L - offTo)
          val range = if (backward) TimeRange(hi, lo) else TimeRange(lo, hi)
          val q = GroupAggregateQuery(Seq("test"),
            Seq(AggFunc.Min, AggFunc.Cnt, AggFunc.Last, AggFunc.MaxTimestamp),
            step = 10L * stepMult, range = range)
          val d = plain.groupAggregate(q)
            .orderBy("series", "ts").collect().map(_.toSeq)
          val r = backed.groupAggregate(q)
            .orderBy("series", "ts").collect().map(_.toSeq)
          assert(r.toSeq === d.toSeq,
            s"stepMult=$stepMult offFrom=$offFrom offTo=$offTo backward=$backward")
      }
    }
  }

  test("short ranges skip the rollup probe (MinServedBins guard)") {
    import graft.engine.Engine
    import graft.query.Ast._
    val rollup = Rollup.build(ctx.samples, stepNs = 10)
    // poison the ROLLUP: any query it serves would return garbage
    val poisonedRollup = rollup.withColumn("vmin", lit(-1e18))
    // span 40 = 4 fine bins < RollupMinServedBins → raw scan, poison inert
    val shortQ = GroupAggregateQuery(Seq("test"), Seq(AggFunc.Min),
      step = 20, range = TimeRange(100, 140))
    val direct = new Engine(ctx).groupAggregate(shortQ).collect().map(_.toSeq)
    val guarded = new Engine(ctx.copy(rollups = Seq(10L -> poisonedRollup)))
      .groupAggregate(shortQ).collect().map(_.toSeq)
    assert(guarded.toSeq === direct.toSeq)
    assert(guarded.nonEmpty)
    // sanity: a wide range DOES read the (poisoned) rollup
    val wideQ = GroupAggregateQuery(Seq("test"), Seq(AggFunc.Min),
      step = 20, range = TimeRange(100, 200))
    val viaPoisoned = new Engine(ctx.copy(rollups = Seq(10L -> poisonedRollup)))
      .groupAggregate(wideQ).collect().map(_.toSeq)
    assert(viaPoisoned.exists(_.contains(-1e18)))
  }

  test("rollup round-trips through parquet") {
    val path = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    Rollup.write(ctx.samples, path, stepNs = 10)
    val back = spark.read.parquet(path)
    assert(back.count() === Rollup.build(ctx.samples, 10).count())
    assert(Rollup.groupAggregate(back, Seq(AggFunc.Mean), 50L).count() > 0)
  }
}
