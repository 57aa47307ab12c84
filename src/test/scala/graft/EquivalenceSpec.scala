package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.model.{TsdbContext, TsdbLayout}

/** Independent-implementation cross-checks: the same query must produce
  * identical rows over the flat context and over the partitioned
  * physical layout (different scan paths, partition pruning, extra
  * columns). Round-1 lesson: this class of equivalence test caught a
  * real ts-collapse bug the oracle missed. */
class EquivalenceSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val flatCtx = TsdbContext.fromTestdata(spark, sfDir)
  private lazy val layoutCtx = {
    val path = java.nio.file.Files.createTempDirectory("graft_equiv").toString
    TsdbLayout.writeSamples(flatCtx, s"$path/samples")
    TsdbLayout.contextOver(spark, s"$path/samples", flatCtx.series, flatCtx.events)
  }

  private val queries = Seq(
    "select scan" ->
      """{"select": "purchase",
          "range": {"from": "20240101T000000", "to": "20240401T000000"},
          "order-by": "series"}""",
    "group-aggregate" ->
      """{"group-aggregate": {"metric": "purchase", "step": "7d",
                              "func": ["min", "max", "cnt"]},
          "range": {"from": "20240101T000000", "to": "20240401T000000"}}""",
    "join" ->
      """{"join": ["click", "view"],
          "range": {"from": "20240101T000000", "to": "20240401T000000"}}""",
    "aggregate all funcs" ->
      """{"aggregate": {"purchase": ["min", "max", "sum", "cnt", "mean"]},
          "range": {"from": "20240101T000000", "to": "20240401T000000"}}""",
    "apply chain" ->
      """{"select": "purchase",
          "range": {"from": "20240101T000000", "to": "20240401T000000"},
          "apply": [{"name": "sma", "window-width": 3}, {"name": "cusum"}]}""",
    "where-location box" ->
      """{"select": "purchase",
          "range": {"from": "20240101T000000", "to": "20240401T000000"},
          "where-location": {"box": {"lon": [-60, 60], "lat": [-40, 40]}}}""",
    "where-location knn aggregate" ->
      """{"aggregate": {"purchase": "sum"},
          "range": {"from": "20240101T000000", "to": "20240401T000000"},
          "where-location": {"knn": {"lon": 10.0, "lat": 10.0, "k": 5}}}""",
    // relies on the fixture having no duplicate (series, ts) on the right
    // metric (true of the generated testdata): tied right rows make the
    // carried value implementation-defined, as the brute-force test below
    // documents by construction
    "asof-join" ->
      """{"asof-join": {"left": "click", "right": "view"},
          "range": {"from": "20240101T000000", "to": "20240401T000000"}}""")

  /** Doubles rounded to 6 decimals — the two layouts feed sums in
    * different row orders, so sum/mean differ in the last ulp (FP
    * addition is not associative); same tolerance as the oracle gate. */
  private def norm(row: Seq[Any]): Seq[Any] = row.map {
    case d: Double => BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_EVEN)
    case x => x
  }

  for ((name, json) <- queries)
    test(s"flat and partitioned layouts agree: $name") {
      val flat = new Engine(flatCtx).execute(json)
        .collect().map(r => norm(r.toSeq)).sortBy(_.toString)
      val layered = new Engine(layoutCtx).execute(json)
        .collect().map(r => norm(r.toSeq)).sortBy(_.toString)
      assert(flat.nonEmpty)
      assert(layered.toSeq === flat.toSeq)
    }

  test("bpe fold equals a reference Sennrich trainer on random corpora") {
    import spark.implicits._
    // literal textbook BPE: overlapping pair counts, (freq desc, pair
    // asc) argmax, left-to-right non-overlapping merge via index walk —
    // an implementation shaped nothing like the engine's fold
    def refBpe(words: Map[String, Long], rounds: Int): Map[String, Seq[String]] = {
      var vocab: Map[String, Seq[String]] =
        words.map { case (w, _) => w -> w.map(_.toString) }
      for (_ <- 0 until rounds) {
        val counts = scala.collection.mutable.Map
          .empty[(String, String), Long].withDefaultValue(0L)
        for ((w, f) <- words; s = vocab(w); i <- 0 until s.length - 1)
          counts((s(i), s(i + 1))) += f
        if (counts.nonEmpty) {
          val ((a, b), _) = counts.toSeq
            .minBy { case ((x, y), c) => (-c, s"$x $y") }
          vocab = vocab.map { case (w, s) =>
            val out = scala.collection.mutable.Buffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                out += a + b; i += 2
              } else { out += s(i); i += 1 }
            }
            w -> out.toSeq
          }
        }
      }
      vocab
    }
    val rnd = new scala.util.Random(13)
    for (round <- 1 to 4) {
      val alphabet = "ab c".filter(_ != ' ') // {a, b, c}: collisions likely
      def word() = Seq.fill(1 + rnd.nextInt(5))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val docs = Seq.tabulate(8)(i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(5))(word()).mkString(" ")))
        .toDF("doc_id", "text")
      val freqs = docs.as[(Long, String)].collect()
        .flatMap(_._2.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      val rounds = rnd.nextInt(5)
      val got = graft.pipeline.TextOps.bpeVocab(docs, "text", rounds)
        .select("word", "st").as[(String, String)].collect()
        .map { case (w, st) => w -> st.split(" ").toSeq }.toMap
      assert(got === refBpe(freqs, rounds), s"round $round (merges=$rounds)")
    }
  }

  test("incremental dedup: exact tier equals brute force; near tier never lies") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val vocabWords = Seq("aa", "bb", "cc", "dd", "ee", "ff")
    def text() = Seq.fill(4 + rnd.nextInt(4))(
      vocabWords(rnd.nextInt(vocabWords.length))).mkString(" ")
    def shingleSet(t: String): Set[String] =
      t.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    for (round <- 1 to 3) {
      val corpus = Seq.tabulate(20)(i => (i.toLong, text()))
      val batch = Seq.tabulate(10)(i => (100L + i,
        if (rnd.nextBoolean()) corpus(rnd.nextInt(20))._2 else text()))
      val out = graft.pipeline.Dedup.dedupAgainstCorpus(
          corpus.toDF("doc_id", "text"), batch.toDF("doc_id", "text"),
          "doc_id", "text", k = 3, numPerm = 32, bands = 8, threshold = 0.7)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3)))
      graft.pipeline.Dedup.releaseCaches()
      assert(out.map(_._1).sorted.toSeq === batch.map(_._1).sorted,
        "every batch doc gets exactly one verdict row")
      val byId = batch.toMap
      out.foreach { case (id, exact, near, status) =>
        // exact tier: no LSH involved, must equal brute force precisely
        val trueExact = corpus.filter(_._2 == byId(id)).map(_._1).sorted.headOption
        assert(exact === trueExact, s"doc $id exact tier")
        // near tier is LSH-recall-bounded, so it may MISS — but a
        // reported match must be genuinely >= threshold (the exact
        // verify step's no-false-positive guarantee), and the min-id
        // claim must hold among all true matches <= the reported one
        near.foreach { cid =>
          val bs = shingleSet(byId(id))
          val cs = shingleSet(corpus.toMap.apply(cid))
          val inter = (bs & cs).size.toDouble
          assert(inter / (bs.size + cs.size - inter) >= 0.7,
            s"doc $id reported a sub-threshold near dup $cid")
        }
        assert(status === (if (exact.isDefined) "exact"
          else if (near.isDefined) "near" else "new"), s"doc $id status")
      }
    }
  }

  test("asof-join equals a brute-force reference on random duplicate-heavy data") {
    import spark.implicits._
    import graft.query.Ast._
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      // left rows may share (tag, ts); right rows include deliberate
      // equal-(tag, ts) TIES — the pinned rule (TimeJoins.asof right
      // pre-aggregation) resolves them to the MAX value, so the model
      // below is deterministic
      val tags = Seq("T0", "T1", "T2")
      val lRows = Seq.fill(40)(("l", tags(rnd.nextInt(3)),
        rnd.nextInt(30).toLong, rnd.nextInt(1000).toDouble))
      val rRows = rnd.shuffle(
        (for (t <- tags; ts <- 0L to 30L) yield (t, ts)).toList)
        .take(25)
        .flatMap { case (t, ts) =>
          Seq.fill(1 + rnd.nextInt(2))(
            ("r", t, ts, rnd.nextInt(1000).toDouble))
        }
      val wide = (lRows ++ rRows).toDF("metric", "tag", "ts", "value")
      val eng = new Engine(TsdbContext.fromWide(
        spark, wide, "metric", Seq("tag"), "ts", "value"))
      val got = eng.asofJoin(AsofJoinQuery("l", "r", TimeRange(0, 100)))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .sortBy(_.toString).toSeq
      val expect = lRows.map { case (_, t, ts, v) =>
        val matches = rRows.filter(r => r._2 == t && r._3 <= ts)
        val carried =
          if (matches.isEmpty) None
          else {
            val latest = matches.map(_._3).max
            Some(matches.filter(_._3 == latest).map(_._4).max)
          }
        (s"l|r tag=$t", ts, v, carried)
      }.sortBy(_.toString)
      assert(got === expect, s"round $round")
    }
  }

  test("interpolationJoin: bracketing blend, exact hits, boundary nulls, tie max") {
    import spark.implicits._
    val right = Seq(("a", 100L, 10.0), ("a", 200L, 30.0), ("a", 200L, 20.0),
      ("a", 400L, 50.0)).toDF("name", "ts", "value")
    val left = Seq(
      ("a", 50L, 0.0),  // before the first right sample -> null
      ("a", 100L, 0.0), // exact hit -> v0 (t0 = t1 guard)
      ("a", 150L, 0.0), // halfway 100..200 -> 10 + (30-10)*0.5 = 20
      ("a", 300L, 0.0), // halfway 200..400, tie at 200 -> max 30 -> 40
      ("a", 450L, 0.0)) // past the last right sample -> null
      .toDF("name", "ts", "value")
    val out = graft.ops.TimeJoins.interpolationJoin(left, right,
        Seq("name"), "value", asCol = "vi")
      .select("ts", "vi").as[(Long, Option[Double])].collect().toSeq.sorted
    assert(out === Seq(50L -> None, 100L -> Some(10.0), 150L -> Some(20.0),
      300L -> Some(40.0), 450L -> None))
  }

  test("asof tie rule: batch carry and streaming index probe agree on ties") {
    import spark.implicits._
    // three right rows tied at ts=100 for series a — both forms must
    // resolve to the MAX value (5.0), never an arbitrary pick
    val right = Seq(("a", 100L, 1.0), ("a", 100L, 5.0), ("a", 100L, 3.0),
      ("a", 200L, 2.0), ("b", 100L, 7.0), ("b", 100L, 4.0))
      .toDF("name", "ts", "value")
    val left = Seq(("a", 99L, 10.0), ("a", 100L, 11.0), ("a", 250L, 12.0),
      ("b", 150L, 13.0)).toDF("name", "ts", "value")
    val batch = graft.ops.TimeJoins.asof(
        left.withColumnRenamed("value", "lv"),
        right.withColumnRenamed("value", "rv"), Seq("name"), Seq("rv"))
      .select("name", "ts", "rv")
      .as[(String, Long, Option[Double])].collect().toSeq.sorted
    val streamed = graft.streaming.TsdbStream.asofStatic(left,
        graft.streaming.TsdbStream.asofIndex(right))
      .select("name", "ts", "r_value")
      .as[(String, Long, Option[Double])].collect().toSeq.sorted
    val expect = Seq(("a", 99L, None), ("a", 100L, Some(5.0)),
      ("a", 250L, Some(2.0)), ("b", 150L, Some(7.0)))
    assert(batch === expect)
    assert(streamed === expect)
  }
}
