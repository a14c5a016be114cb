package graft

import graft.functions.CleanFns
import graft.operators.{AsOfJoin, Dedup, RangeJoin, Upsert}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Model-based fuzzing: scalacheck generators produce randomized inputs
  * (fixed seeds — reproducible), each operator runs ONCE over the whole
  * sample as a DataFrame, and the result is compared against a naive
  * in-memory Scala model. This catches semantic edge cases (ties, NULLs,
  * empty strings, boundary lengths) that a handful of hand-picked rows
  * misses, without paying a Spark job per sample.
  */
class FuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic sample of `n` values from a generator. */
  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  test("F1 priceClean recovers every rendered decimal (fuzz)") {
    val price = for {
      cents <- Gen.chooseNum(0L, 99999999L) // < 1e6 dollars, DECIMAL(10,2)-safe
      dollar <- Gen.oneOf("", "$")
      pad <- Gen.oneOf("", " ", "  ")
    } yield {
      val d = BigDecimal(cents, 2)
      // US-style rendering with thousands separators, like the raw feeds
      val s = f"$d%,.2f"
      (s"$pad$dollar$s$pad", d)
    }
    val cases = sample(price, 300, 1L)
    val got = cases.map(_._1).toDF("raw")
      .select(CleanFns.priceClean($"raw").as("p")).collect().map(_.getDecimal(0))
    cases.zip(got).foreach { case ((raw, want), gotD) =>
      assert(gotD != null && BigDecimal(gotD) == want, s"raw=<$raw>")
    }
  }

  test("F5 normBool matches the truth table under random case/whitespace (fuzz)") {
    val trues = Seq("t", "true", "1", "y", "yes")
    val falses = Seq("f", "false", "0", "n", "no")
    val wordExpect: Gen[(String, Option[Boolean])] = Gen.oneOf(
      Gen.oneOf(trues).map(w => (w, Option(true))),
      Gen.oneOf(falses).map(w => (w, Option(false))),
      Gen.oneOf(Seq("si", "oui", "2", "truthy", "nope", ""))
        .map(w => (w, Option.empty[Boolean])))
    val word = for {
      we <- wordExpect
      (w, expect) = we
      cased <- Gen.oneOf(Seq(w, w.toUpperCase, w.capitalize))
      pad <- Gen.oneOf("", " ", "\t", "\u00A0") // incl. Unicode NBSP padding
    } yield (s"$pad$cased$pad", expect)
    val cases = sample(word, 300, 2L)
    val got = cases.map(_._1).toDF("raw")
      .select(CleanFns.normBool($"raw").as("b")).collect()
      .map(r => if (r.isNullAt(0)) Option.empty[Boolean] else Option(r.getBoolean(0)))
    cases.zip(got).foreach { case ((raw, want), g) =>
      assert(g == want, s"raw=<$raw>")
    }
  }

  test("F6 idParts recomposes the original id for any length (fuzz)") {
    val id = Gen.chooseNum(0, 20).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
    val cases = sample(id, 200, 3L)
    val parts = CleanFns.idParts($"raw").toMap
    val got = cases.toDF("raw")
      .select(parts("part1"), parts("part2"), parts("part3")).collect()
      .map(r => Seq(0, 1, 2).map(i => Option(r.getString(i)).getOrElse("")).mkString)
    cases.zip(got).foreach { case (raw, g) =>
      assert(g == raw.take(18), s"raw=<$raw>")
    }
  }

  test("as-of join equals the naive per-row model (fuzz)") {
    // unique (k, rt) pairs on the right so the match is well-defined
    val leftG = for { k <- Gen.chooseNum(1L, 5L); t <- Gen.chooseNum(0L, 100L) } yield (k, t)
    val lefts = sample(leftG, 120, 4L)
    val rights = sample(
      for { k <- Gen.chooseNum(1L, 5L); t <- Gen.chooseNum(0L, 100L)
            v <- Gen.option(Gen.alphaStr.map(_.take(4))) } yield (k, t, v),
      80, 5L).groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val left = lefts.toDF("k", "lt")
    val right = rights.toDF("k", "rt", "v")
    val got = AsOfJoin.asof(left, right, "k", "lt", "rt", Seq("v"), inner = true)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(r.fieldIndex("asof_v"))))).toSeq.sorted
    val model = lefts.flatMap { case (k, lt) =>
      val matches = rights.filter(r => r._1 == k && r._2 <= lt)
      if (matches.isEmpty) None
      else {
        val m = matches.maxBy(_._2)
        Some((k, lt, m._3)) // the WHOLE matched row's value, NULL included
      }
    }.sorted
    assert(got == model)
  }

  test("upsert merge equals the per-key model (fuzz)") {
    val currents = sample(
      for { id <- Gen.chooseNum(1L, 40L); b <- Gen.chooseNum(0, 999) } yield (id, s"n$id", b.toDouble),
      30, 6L).groupBy(_._1).map(_._2.head).toSeq // unique keys (warehouse invariant)
    val stagings = sample(
      for { id <- Gen.chooseNum(1L, 60L); b <- Gen.chooseNum(0, 999) } yield (id, s"n$id", b.toDouble),
      40, 7L)
    val got = Upsert.merge(stagings.toDF("id", "name", "bal"),
        currents.toDF("id", "name", "bal"), Seq("id"))
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getString(3))).toSeq.sorted
    val curByKey = currents.map(c => c._1 -> c).toMap
    val stgByKey = stagings.groupBy(_._1)
    val model = (curByKey.keySet ++ stgByKey.keySet).toSeq.map { k =>
      (stgByKey.get(k), curByKey.get(k)) match {
        case (Some(st), Some(_)) =>
          val s = st.minBy(x => (x._2, x._3)); (k, s._3, "update")
        case (Some(st), None) =>
          val s = st.minBy(x => (x._2, x._3)); (k, s._3, "insert")
        case (None, Some(c)) => (k, c._3, "keep")
        case _ => sys.error("unreachable")
      }
    }.sorted
    assert(got == model)
  }

  test("banded range join equals the O(n·m) filter model (fuzz)") {
    def ts(day: Int, hour: Int) =
      java.sql.Timestamp.valueOf(f"2025-03-${day}%02d $hour%02d:00:00")
    val pts = sample(
      for { id <- Gen.chooseNum(1, 500); d <- Gen.chooseNum(1, 28); h <- Gen.chooseNum(0, 23) }
        yield (id.toLong, ts(d, h)),
      100, 8L)
    val ivs = sample(
      for { id <- Gen.chooseNum(1, 500); d <- Gen.chooseNum(1, 25); h <- Gen.chooseNum(0, 23)
            len <- Gen.chooseNum(0, 72) } yield {
        val start = ts(d, h)
        val end = new java.sql.Timestamp(start.getTime + len * 3600L * 1000L)
        (id.toLong + 1000L, start, end)
      },
      40, 9L)
    val got = RangeJoin.pointInInterval(
        pts.toDF("p_id", "pt"), "pt", ivs.toDF("i_id", "start", "end"), "start", "end")
      .select("p_id", "i_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val model = (for {
      (pid, pt) <- pts
      (iid, s, e) <- ivs
      if !pt.before(s) && !pt.after(e)
    } yield (pid, iid)).sorted
    assert(got == model)
  }

  test("exact dedup equals tuple-equality grouping incl. NULL vs empty (fuzz)") {
    val cell = Gen.option(Gen.oneOf(Seq("", "a", "b", "ab", "bc", "c")))
    val rows = sample(
      for { x <- cell; y <- cell } yield (x, y), 150, 10L)
      .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    val got = Dedup.exact(rows.toDF("id", "x", "y"), "id", Seq("x", "y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val model = rows.groupBy(r => (r._2, r._3)).values
      .map(g => (g.map(_._1).min, g.size.toLong)).toSeq.sorted
    assert(got == model)
  }

  test("polyhash kernels equal the HOF fold on arbitrary unicode text (fuzz)") {
    // Would have caught the empty-string 217 divergence: generators cover
    // '', whitespace runs, ASCII, Latin-1, CJK, and astral-plane emoji.
    val text: Gen[String] = Gen.oneOf(
      Gen.const(""),
      Gen.oneOf(" ", "  ", "\t"),
      Gen.listOf(Gen.alphaNumChar).map(_.mkString),
      Gen.listOf(Gen.oneOf('é', 'ü', 'ß', '中', '文', 'a', ' ')).map(_.mkString),
      Gen.listOf(Gen.oneOf("😀", "🚀", "x", " ")).map(_.mkString))
    val cases = sample(text, 400, 7L).distinct
    // kernel (scala) vs the HOF aggregate(split(s,''),…) fold — one job
    val got = cases.toDF("s")
      .select(col("s"), graft.functions.TextFns.polyHash("s").as("hof"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cases.foreach { s =>
      assert(graft.plans.PolyHash.hash(s) == got(s), s"PolyHash <$s>")
      assert(graft.plans.SketchKernels.polyHashCp(s) == got(s), s"polyHashCp <$s>")
    }
  }

  test("round-12 sketch kernels match HOF forms on hostile token arrays (fuzz)") {
    // generators cover empty arrays, empty-string tokens, whitespace-free
    // unicode (incl. astral plane), and degenerate one-token docs — the
    // input space the public Column API admits even though TextFns.tokens
    // never produces some of it
    val token: Gen[String] = Gen.oneOf(
      Gen.const(""),
      Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString),
      Gen.oneOf("é", "中文", "😀x", "ß"),
      Gen.listOf(Gen.alphaChar).map(_.mkString))
    val arr: Gen[List[String]] = Gen.chooseNum(0, 12).flatMap(Gen.listOfN(_, token))
    val cases = sample(arr, 250, 11L)
    import graft.functions.{SketchFns, TextFns}
    val df = cases.map(Tuple1(_)).toDF("t")
    val (k, w) = (3, 4)
    // winnowFingerprints == the HOF lattice, including short/empty docs
    val hof = df.filter(size(col("t")) >= k)
      .withColumn("sh", TextFns.shingleExpr("t", k))
      .withColumn("hs", TextFns.polyHashEach("sh"))
      .select(col("t"), TextFns.winnowExpr("hs", w).as("fp"))
      .collect().map(r => r.getSeq[String](0).toList -> r.getSeq[Long](1).toList).toMap
    val kern = df.select(col("t"), SketchFns.winnowFingerprints(col("t"), k, w).as("fp"))
      .collect().map(r => r.getSeq[String](0).toList -> r.getSeq[Long](1).toList).toMap
    cases.foreach { t =>
      if (t.length >= k) assert(kern(t) == hof(t), s"winnow mismatch on $t")
      else assert(kern(t).isEmpty, s"short doc must yield no fingerprints: $t")
    }
    // polyHashEach kernel == HOF per-token fold
    val phHof = df.select(col("t"), TextFns.polyHashEach("t").as("h"))
      .collect().map(r => r.getSeq[String](0).toList -> r.getSeq[Long](1).toList).toMap
    val phKern = df.select(col("t"), SketchFns.polyHashEach(col("t")).as("h"))
      .collect().map(r => r.getSeq[String](0).toList -> r.getSeq[Long](1).toList).toMap
    cases.foreach(t => assert(phKern(t) == phHof(t), s"polyHashEach mismatch on $t"))
    // null-element contract pin (SketchExpressions scaladoc): the kernel
    // hashes a null token like the empty string — containsNull=false
    // output — where the HOF yields a NULL element. Intentional divergence,
    // reachable only via hand-built arrays (TextFns.tokens never emits
    // null elements).
    val nullArr = Seq(Tuple1(Seq[String](null, "", "ab"))).toDF("t")
    val kernNull = nullArr.select(SketchFns.polyHashEach(col("t")).as("h"))
      .collect()(0).getSeq[Long](0).toList
    val hofEmpty = nullArr.select(TextFns.polyHashEach("t").as("h"))
      .collect()(0).getSeq[Any](0).toList
    assert(kernNull(0) == kernNull(1), "kernel: null must hash like ''")
    assert(hofEmpty(0) == null && hofEmpty(1) != null,
      "HOF contract changed: null element expected for null token")
    // chunkHashes: multiplicity == chunkExpr's chunk count; equal chunk
    // strings <=> equal hashes within a doc
    val ckHof = df.filter(size(col("t")) >= 1)
      .select(col("t"), TextFns.chunkExpr("t", k, k).as("c"))
      .collect().map(r => r.getSeq[String](0).toList -> r.getSeq[String](1).toList).toMap
    val ckKern = df.filter(size(col("t")) >= 1)
      .select(col("t"), SketchFns.chunkHashes(col("t"), k, k).as("c"))
      .collect().map(r => r.getSeq[String](0).toList -> r.getSeq[Long](1).toList).toMap
    ckHof.foreach { case (t, chunks) =>
      val hashes = ckKern(t)
      assert(hashes.length == chunks.length, s"chunk count mismatch on $t")
      // equality structure within the doc
      val strGroups = chunks.zipWithIndex.groupBy(_._1).values.map(_.map(_._2).toSet).toSet
      val hashGroups = hashes.zipWithIndex.groupBy(_._1).values.map(_.map(_._2).toSet).toSet
      assert(strGroups == hashGroups, s"chunk equality structure mismatch on $t")
    }
    // chunkHashStrings: chunk strings == the HOF form AND hashes == the
    // hash-only kernel, per position (the C4 removal's two sides must
    // join on identical keys) — including on hostile arrays with null and
    // empty tokens
    val chsKern = df.filter(size(col("t")) >= 1)
      .select(col("t"), SketchFns.chunkHashStrings(col("t"), k, k).as("c"))
      .collect().map(r => r.getSeq[String](0).toList ->
        r.getSeq[org.apache.spark.sql.Row](1).map(s => (s.getLong(0), s.getString(1))).toList)
      .toMap
    ckHof.foreach { case (t, chunks) =>
      val pairs = chsKern(t)
      assert(pairs.map(_._2) == chunks, s"chunkHashStrings text mismatch on $t")
      assert(pairs.map(_._1) == ckKern(t), s"chunkHashStrings key-space mismatch on $t")
    }
    val chsNull = Seq(Tuple1(Seq[String](null, "", "ab", null, "c")))
      .toDF("t").select(SketchFns.chunkHashStrings(col("t"), 3, 3).as("c"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(s => (s.getLong(0), s.getString(1)))
    // concat_ws semantics: null tokens skipped, separator only between
    // emitted tokens — chunk 1 of (null, "", "ab") is " ab"? no: "" then
    // "ab" joined by one space = " ab"; chunk 2 of (null, "c") is "c"
    assert(chsNull.map(_._2) == Seq(" ab", "c"), chsNull.toString)
    // shingleHashes: distinct-count parity with the string kernel
    val shStr = df.filter(size(col("t")) >= k)
      .select(col("t"), size(SketchFns.shinglesDistinct(col("t"), k)).as("n"))
      .collect().map(r => r.getSeq[String](0).toList -> r.getInt(1)).toMap
    val shHash = df.filter(size(col("t")) >= k)
      .select(col("t"), size(SketchFns.shingleHashes(col("t"), k)).as("n"))
      .collect().map(r => r.getSeq[String](0).toList -> r.getInt(1)).toMap
    shStr.foreach { case (t, n) => assert(shHash(t) == n, s"shingle distinct-count mismatch on $t") }
  }

  test("connected components equal a union-find model on random graphs (fuzz)") {
    // structurally a != b (no generator filter to exhaust): b = a + offset
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 60L)
      off <- Gen.chooseNum(1L, 30L)
    } yield (a, (a + off) % 61L) match {
      case (x, y) => (math.min(x, y), math.max(x, y))
    }
    val edges = sample(edgeGen, 120, 11L).distinct.filter(e => e._1 != e._2)
    // union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
    // both closure strategies against the model: default (local union-find
    // under the size threshold) and forced distributed label propagation
    val got = graft.operators.Components.connectedComponents(
        edges.toDF("a_id", "b_id"), "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    val gotDist = graft.operators.Components.connectedComponents(
        edges.toDF("a_id", "b_id"), "a_id", "b_id", localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDist == want)
  }

  test("BMP pixel roundtrip and nearest-neighbor floor model (fuzz)") {
    import graft.multimodal.MediaCodecs
    val img = for {
      w <- Gen.chooseNum(1, 24); h <- Gen.chooseNum(1, 24)
      bytes <- Gen.listOfN(w * h * 3, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield (w, h, bytes.toArray)
    sample(img, 60, 21L).foreach { case (w, h, rgb) =>
      val enc = MediaCodecs.encodeBmpRgb(w, h, rgb)
      val Some((w2, h2, back)) = MediaCodecs.parseBmpPixels(enc)
      assert(w2 == w && h2 == h && back.sameElements(rgb),
        s"roundtrip broke at ${w}x$h")
      val ow = w / 2 + 1; val oh = h / 2 + 1
      val rz = MediaCodecs.resizeNearestRgb(rgb, w, h, ow, oh)
      for (oy <- 0 until oh; ox <- 0 until ow; c <- 0 until 3)
        assert(rz((oy * ow + ox) * 3 + c) ==
          rgb(((oy * h / oh) * w + (ox * w / ow)) * 3 + c),
          s"floor mapping broke at ${w}x$h -> ${ow}x$oh ($ox,$oy,$c)")
    }
  }

  test("PCM WAV roundtrip and audio features vs a naive model (fuzz)") {
    import graft.multimodal.{MediaCodecs, Multimodal}
    val sig = for {
      n <- Gen.chooseNum(1, 64)
      s <- Gen.listOfN(n,
        Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt).map(_.toShort))
    } yield s.toArray
    val cases = sample(sig, 80, 22L)
    cases.foreach { s =>
      val Some((m, back)) =
        MediaCodecs.parseWavPcm16(MediaCodecs.encodeWavPcm16(44100, s))
      assert(m.n_samples == s.length && back.sameElements(s))
    }
    // one Spark pass over the whole sample; naive model on the originals
    val rows = Multimodal.audioFeatures(
        cases.zipWithIndex.map { case (s, i) =>
          Multimodal.MediaRow(i.toLong, MediaCodecs.encodeWavPcm16(8000, s))
        }.toDS())
      .collect().map(r => r.doc_id -> r).toMap
    cases.zipWithIndex.foreach { case (s, i) =>
      val r = rows(i.toLong)
      val peak = s.map(v => math.abs(v.toLong)).max
      val sumSq = s.map(v => v.toLong * v).sum
      val zc = s.toSeq.sliding(2).count {
        case Seq(a, b) => (a >= 0) != (b >= 0)
        case _ => false
      }
      assert(r.n_samples == s.length && r.peak == peak &&
        r.sum_sq == sumSq && r.zero_crossings == zc, s"sample $i")
    }
  }

  test("TopKPerGroup equals the window formulation for random data and k (fuzz)") {
    val rows = sample(
      for { g <- Gen.chooseNum(1L, 8L); v <- Gen.chooseNum(0, 1000) } yield (g, v.toDouble),
      300, 11L).zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
    val df = rows.toDF("g", "id", "v")
    for (k <- Seq(1, 3, 7)) {
      val got = graft.plans.TopKPerGroup.topK(df, Seq("g"), Seq(("v", true), ("id", false)), k)
        .select($"g", $"id", $"rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val model = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex
          .map { case (r, i) => (g, r._2, (i + 1).toLong) }
      }.toSet
      assert(got == model, s"k=$k")
    }
  }

  test("robots longest-match agrees with an in-memory RFC model (fuzz)") {
    val prefixPool = Seq("", "/", "/a", "/ab", "/a/b", "/priv", "/priv/ok", "/x")
    val ruleGen = for {
      kind <- Gen.oneOf("Disallow", "Allow")
      p <- Gen.oneOf(prefixPool)
    } yield (kind, p)
    val caseGen = for {
      n <- Gen.chooseNum(0, 6)
      rules <- Gen.listOfN(n, ruleGen)
      path <- Gen.oneOf("/a", "/ab", "/abc", "/a/b", "/priv", "/priv/ok",
        "/priv/okx", "/priv/ok/deep", "/x/y", "/")
    } yield (rules, path)
    val cases = sample(caseGen, 400, 17L)
    def model(rules: List[(String, String)], path: String)
        : (Option[Long], Option[Long], Boolean) = {
      val dm = rules.collect { case ("Disallow", p) if p.nonEmpty && path.startsWith(p) => p.length.toLong }
        .maxOption
      val am = rules.collect { case ("Allow", p) if p.nonEmpty && path.startsWith(p) => p.length.toLong }
        .maxOption
      (dm, am, dm.isEmpty || am.getOrElse(-1L) >= dm.get)
    }
    val df = cases.map { case (rules, path) =>
      (rules.map { case (k, p) => s"$k: $p" }.mkString("\n"), path)
    }.toDF("robots", "path")
    val got = df.select(
        graft.functions.UrlFns.robotsMatchLen($"path",
          graft.functions.UrlFns.robotsPrefixes($"robots", "Disallow")).as("d"),
        graft.functions.UrlFns.robotsMatchLen($"path",
          graft.functions.UrlFns.robotsPrefixes($"robots", "Allow")).as("a"),
        graft.functions.UrlFns.robotsAllowed($"path", $"robots").as("f"))
      .collect().map(r => (
        if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
    cases.zip(got).foreach { case ((rules, path), g) =>
      assert(g == model(rules, path), s"rules=$rules path=$path")
    }
  }

  test("winnowAnchors: value/coverage/minimality properties on random arrays (fuzz)") {
    import graft.functions.SketchFns
    val (k, w) = (3, 4)
    // small alphabet → plenty of repeated k-grams (ties exercise the
    // rightmost-min rule); lengths straddle every branch: < k (empty),
    // k <= n < k+w-1 (short-document rule), and full windows
    val tokG: Gen[Seq[String]] = for {
      n <- Gen.chooseNum(0, 30)
      ts <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", ""))
    } yield ts
    val docs = sample(tokG, 300, 77L).distinct.map(Tuple1(_))
    val df = docs.toDF("t")
    val rows = df.select(col("t"),
        SketchFns.chunkHashes(col("t"), k, 1).as("dense"),
        SketchFns.winnowAnchors(col("t"), k, w).as("an"))
      .collect().map(r => (r.getSeq[String](0).toList,
        r.getSeq[Long](1).toList,
        r.getSeq[org.apache.spark.sql.Row](2).map(s => (s.getLong(0), s.getLong(1))).toList))
    rows.foreach { case (t, denseAll, anchors) =>
      val n = t.length
      if (n < k) assert(anchors.isEmpty, s"below k must be empty: $t")
      else {
        val m = n - k + 1
        val dense = denseAll.take(m) // cut the short tail chunks
        // every anchor carries the dense hash of its position
        anchors.foreach { case (p, h) =>
          assert(p >= 0 && p < m && dense(p.toInt) == h, s"bad anchor ($p,$h) on $t")
        }
        // anchors strictly increase in position (selection order)
        assert(anchors.map(_._1) == anchors.map(_._1).sorted.distinct)
        if (m < w) {
          // short-document rule: exactly the rightmost global minimum
          val mn = dense.min
          val want = dense.lastIndexOf(mn).toLong
          assert(anchors == List((want, mn)), s"short rule on $t: $anchors")
        } else {
          (0 to m - w).foreach { j =>
            val win = dense.slice(j, j + w)
            // coverage: some anchor inside the window...
            val inWin = anchors.filter { case (p, _) => p >= j && p < j + w }
            assert(inWin.nonEmpty, s"window $j uncovered on $t")
            // ...and the window's rightmost MINIMUM is among the selected
            val mn = win.min
            val wantP = (j + win.lastIndexOf(mn)).toLong
            assert(anchors.exists(_._1 == wantP),
              s"window $j rightmost-min $wantP unselected on $t")
          }
        }
      }
    }
    assert(rows.exists(_._1.length >= k + w), "fuzz must reach full windows")
  }

  test("anchorRows: one kernel pass equals dense chunkHashes + winnowAnchors (fuzz)") {
    import graft.functions.SketchFns
    val (k, w) = (3, 4)
    val tokG: Gen[Seq[String]] = for {
      n <- Gen.chooseNum(0, 30)
      ts <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", ""))
    } yield ts
    val docs = sample(tokG, 300, 78L).distinct.map(Tuple1(_))
    val rows = docs.toDF("t").select(col("t"),
        SketchFns.chunkHashes(col("t"), k, 1).as("dense"),
        SketchFns.winnowAnchors(col("t"), k, w).as("an"),
        SketchFns.anchorRows(col("t"), k, w).as("ar"))
      .collect().map(r => (r.getSeq[String](0).toList,
        r.getSeq[Long](1).toList,
        r.getSeq[org.apache.spark.sql.Row](2).map(s => (s.getLong(0), s.getLong(1))).toList,
        r.getSeq[org.apache.spark.sql.Row](3)
          .map(s => (s.getLong(0), s.getLong(1), s.getBoolean(2))).toList))
    var sparseSeen = false
    rows.foreach { case (t, denseAll, anchors, ar) =>
      val n = t.length
      if (n < k) assert(ar.isEmpty, s"below k must be empty: $t")
      else {
        val m = n - k + 1
        // the dense half IS chunkHashes stride 1 (full-length positions)
        assert(ar.map(_._1) == (0L until m.toLong).toList &&
          ar.map(_._2) == denseAll.take(m), s"dense half diverges on $t")
        // the flagged subset IS winnowAnchors, bit for bit
        assert(ar.filter(_._3).map(a => (a._1, a._2)) == anchors,
          s"sparse flags diverge on $t")
        sparseSeen ||= ar.exists(_._3)
      }
    }
    assert(sparseSeen, "fuzz must reach selected anchors")
  }

  test("percentileGate equals the sort-and-cut model under heavy ties (fuzz)") {
    // small score range forces boundary ties; several permilles exercise
    // the quota floor (including quota 0 for tiny groups)
    val gen = for {
      id <- Gen.choose(0L, 400L)
      grp <- Gen.oneOf("a", "b", "c", "d")
      score <- Gen.choose(-3L, 3L)
    } yield (id, grp, score)
    val rows = sample(gen, 300, seed = 1504L)
      .groupBy(_._1).map(_._2.head).toSeq // unique ids (the operator contract)
    val df = rows.toDF("id", "grp", "score")
    for (permille <- Seq(0, 137, 400, 500, 999, 1000)) {
      val got = graft.operators.Curation
        .percentileGate(df, "id", "grp", "score", permille)
        .collect().map(r => (r.getLong(1), r.getBoolean(3))).toMap
      assert(got.size == rows.size, s"row count at p=$permille")
      // model: per group, sort (score DESC, id ASC), keep the first
      // (n * permille) / 1000
      val want = rows.groupBy(_._2).flatMap { case (_, members) =>
        val quota = (members.size.toLong * permille) / 1000L
        val sorted = members.sortBy(m => (-m._3, m._1))
        sorted.zipWithIndex.map { case (m, ix) => m._1 -> (ix < quota) }
      }
      assert(got == want, s"gate mismatch at p=$permille")
    }
  }

  test("tokenBudgetPerGroup equals the per-group prefix model under ties (fuzz)") {
    val gen = for {
      id <- Gen.choose(0L, 400L)
      grp <- Gen.oneOf("a", "b", "c")
      score <- Gen.choose(-2L, 2L)
      ntok <- Gen.choose(0L, 9L) // zeros exercise the cumsum-unchanged edge
    } yield (id, grp, score, ntok)
    val rows = sample(gen, 260, seed = 1505L)
      .groupBy(_._1).map(_._2.head).toSeq
    val df = rows.toDF("id", "grp", "score", "ntok")
    for (permille <- Seq(0, 219, 500, 1000)) {
      val got = graft.operators.Curation
        .tokenBudgetPerGroup(df, "id", "grp", "score", "ntok", permille)
        .collect().map(r => (r.getLong(1), r.getBoolean(4))).toMap
      assert(got.size == rows.size, s"row count at p=$permille")
      val want = rows.groupBy(_._2).flatMap { case (_, members) =>
        val quota = (members.map(_._4).sum * permille) / 1000L
        var cum = 0L
        members.sortBy(m => (-m._3, m._1)).map { m =>
          cum += m._4
          m._1 -> (cum <= quota)
        }
      }
      assert(got == want, s"budget mismatch at p=$permille")
    }
  }

  test("budgetSpendPlan equals the per-group prefix model incl. null/unbudgeted groups (fuzz)") {
    // the streaming gate's pure decision half: remaining budgets per group
    // (one group null-keyed, one group deliberately absent), batch rows
    // with colliding scores; the model is sort (-score, id) + prefix
    // cumsum <= remaining, unbudgeted -> rejected
    val remaining = Seq((Option("a"), 15L), (Option("b"), 0L),
        (Option.empty[String], 7L))
      .toDF("grp", "__remaining") // group "c" has no row at all
    val gen = for {
      id <- Gen.choose(0L, 300L)
      grp <- Gen.oneOf(Some("a"), Some("b"), Some("c"), None)
      n <- Gen.choose(1, 4)
    } yield (id, grp, n)
    val rows = sample(gen, 160, seed = 1506L)
      .groupBy(_._1).map(_._2.head).toSeq
    // text with n distinct tokens → score 1000n + 500000, ntok n (the
    // deterministic scoring the gate actually runs)
    val df = rows.map { case (id, g, n) =>
      (id, (1 to n).map(i => s"t$id$i").mkString(" "), g.orNull)
    }.toDF("doc_id", "text", "grp")
    val got = graft.streaming.Streams
      .budgetSpendPlan(df, remaining, "doc_id", "text", "grp", Seq("a", "the"))
      .select(col("doc_id"), col("__selected"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(got.size == rows.size)
    val budget = Map(Some("a") -> 15L, Some("b") -> 0L, (None: Option[String]) -> 7L)
    val want = rows.groupBy(_._2).flatMap { case (g, members) =>
      budget.get(g) match {
        case None => members.map(m => m._1 -> false)
        case Some(b) =>
          var cum = 0L
          // score = 1000n + 500000 → order (-n, id)
          members.sortBy(m => (-m._3, m._1)).map { m =>
            cum += m._3
            m._1 -> (cum <= b)
          }
      }
    }
    assert(got == want)
    // the LITERAL decide (the batch-unrolled rows' zero-extra-job shape)
    // makes identical decisions: same null-group branch, same
    // absent-group-rejects semantics as the null-safe left join
    def litDecide() = graft.streaming.Streams.budgetDecidePlanLiteral(
        graft.streaming.Streams.budgetScorePlan(df, "text", Seq("a", "the")),
        Seq("a" -> 15L, "b" -> 0L, (null: String) -> 7L), "doc_id", "grp")
      .select(col("doc_id"), col("__selected"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(litDecide() == want)
    // group "c" is ABSENT from the map: under ANSI mode a plain element_at
    // would throw MAP_KEY_DOES_NOT_EXIST instead of rejecting the
    // unbudgeted group — the literal decide must use try_element_at
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled", "false")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      assert(litDecide() == want)
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }
}
