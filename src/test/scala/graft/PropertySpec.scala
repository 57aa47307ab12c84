package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.series.SeriesName
import graft.sources.Resp
import graft.time.TimeUtil

/** Property tests for the pure kernels (SURVEY §5: bins partition the
  * range; canonicalization is idempotent; protocol render/parse
  * round-trips). Uses ScalaCheck generators with a fixed seed sweep (no
  * scalatest bridge artifact in the offline cache). */
class PropertySpec extends AnyFunSuite {

  /** Evaluate `f` on `n` deterministic samples of `gen`. */
  private def forAllN[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val nsGen = Gen.chooseNum(0L, 4102444800000000000L) // to year 2100
  private val stepGen = Gen.chooseNum(1L, TimeUtil.NsPerDay * 30)

  test("group-aggregate bins partition the range and align to begin") {
    forAllN(Gen.zip(nsGen, Gen.chooseNum(0L, Long.MaxValue / 4), stepGen)) {
      case (begin, off, step) =>
        val ts = begin + off % (step * 1000)
        // reference bin rule: begin + step*((ts-begin)/step)
        val bin = begin + ((ts - begin) / step) * step
        assert(bin <= ts && ts < bin + step)
        assert((bin - begin) % step === 0L)
    }
  }

  test("ISO-basic timestamps round-trip through render/parse at ns precision") {
    forAllN(nsGen)(ns => assert(TimeUtil.parseIsoBasic(TimeUtil.toIsoBasic(ns)) === ns))
  }

  test("duration grammar: parse(n + unit) = n * unit_ns") {
    val units = Seq("n" -> 1L, "us" -> 1000L, "ms" -> 1000000L,
      "s" -> TimeUtil.NsPerSec, "m" -> TimeUtil.NsPerMin,
      "min" -> TimeUtil.NsPerMin, "h" -> TimeUtil.NsPerHour,
      "d" -> TimeUtil.NsPerDay)
    forAllN(Gen.zip(Gen.chooseNum(1L, 100000L), Gen.oneOf(units))) {
      case (n, (u, k)) => assert(TimeUtil.parseDuration(s"$n$u") === n * k)
    }
  }

  private val tagKey = Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
  private val tagVal = Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
  private val seriesGen: Gen[(String, List[(String, String)])] = for {
    metric <- Gen.identifier.map("m_" + _.take(10))
    n <- Gen.chooseNum(1, 6)
    keys <- Gen.listOfN(n, tagKey)
    vals <- Gen.listOfN(n, tagVal)
  } yield (metric, keys.distinct.zip(vals))

  test("series canonicalization is idempotent and sorts tags") {
    forAllN(seriesGen) { case (metric, tags) =>
      val messy = metric + "  " +
        tags.reverse.map { case (k, v) => s"$k=$v" }.mkString("\t ")
      val c1 = SeriesName.canonicalize(messy)
      assert(SeriesName.canonicalize(c1) === c1)
      val parsed = SeriesName.parse(c1)
      assert(parsed.tags.keys.toSeq === parsed.tags.keys.toSeq.sorted)
    }
  }

  test("RESP render/parse round-trips samples") {
    val sampleGen = for {
      (metric, tags) <- seriesGen
      ts <- nsGen
      v <- Gen.chooseNum(-1000000000L, 1000000000L)
    } yield Resp.Sample(
      SeriesName(metric, scala.collection.immutable.SortedMap(tags: _*)).render,
      ts, v.toDouble)
    forAllN(Gen.listOfN(5, sampleGen), n = 50) { samples =>
      val payload = samples.map(s => s"+${s.name}\r\n:${s.ts}\r\n+${s.value}\r\n").mkString
      assert(Resp.parse(payload) === samples)
    }
  }
}

/** Spark-backed properties tying independent engine code paths together. */
class EnginePropertySpec extends AnyFunSuite with SparkTestBase {

  private def forAllN[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  /** group-aggregate-join over (m, m_copy) with a filter on m must equal
    * single-metric group-aggregate with the same HAVING: the two filter
    * code paths (Engine.groupAggregate's post-agg `where` vs
    * applyAggregateJoinFilters' null-out + presence combiner) implement
    * the same semantics and must stay tied together. */
  test("GAJ filter on a duplicated metric ≡ group-aggregate HAVING") {
    import graft.engine.Engine
    import graft.model.TsdbContext
    import graft.query.Ast._
    import org.apache.spark.sql.functions.lit
    import spark.implicits._

    val caseGen: Gen[(Seq[(String, Long, Double)], Long, Double)] = for {
      nRows <- Gen.chooseNum(10, 40)
      users <- Gen.listOfN(nRows, Gen.chooseNum(1, 3))
      tss <- Gen.listOfN(nRows, Gen.chooseNum(0L, 999L))
      vs <- Gen.listOfN(nRows, Gen.chooseNum(-100, 100))
      step <- Gen.chooseNum(1L, 300L)
      threshold <- Gen.chooseNum(-50, 50)
    } yield (users.lazyZip(tss).lazyZip(vs)
        .map((u, t, v) => (s"$u", t, v.toDouble)).toSeq,
      step, threshold.toDouble)

    forAllN(caseGen, n = 5) { case (rows, step, threshold) =>
      val wide = rows.toDF("user", "ts", "value")
      val both = wide.withColumn("metric", lit("m"))
        .unionByName(wide.withColumn("metric", lit("mc")))
      val ctx = TsdbContext.fromWide(spark, both, "metric", Seq("user"), "ts", "value")
      val eng = new Engine(ctx)
      val range = TimeRange(0, 1000)
      val having = eng.run(GroupAggregateQuery(Seq("m"), Seq(AggFunc.Max),
          step, range, filters = Map("" -> ValueFilter(gt = Some(threshold)))))
        .collect().map { r =>
          // series "m:max user=U" → key on the tag suffix
          (r.getString(0).dropWhile(_ != ' ').trim, r.getLong(1), r.getDouble(2))
        }.toSet
      val gaj = eng.run(GroupAggregateJoinQuery(Seq("m", "mc"), AggFunc.Max,
          step, range, filters = Map("m" -> ValueFilter(gt = Some(threshold)))))
        .collect()
      val gajKeys = gaj.map { r =>
        (r.getString(0).dropWhile(_ != ' ').trim, r.getLong(1), r.getDouble(2))
      }.toSet
      assert(gajKeys === having, s"step=$step threshold=$threshold")
      // the unfiltered duplicate column carries the identical downsample
      gaj.foreach(r => assert(r.getDouble(3) === r.getDouble(2)))
    }
  }
}
