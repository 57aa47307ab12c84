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
