package graft

import graft.operators.{Curation, Scd2}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("boilerplate accounting flags cross-document repeated chunks only") {
    // 2-token chunks: "dup dup" appears in docs 1 and 2 → boilerplate at
    // maxDocFreq=1; "solo text"/"uniq here" appear once → kept. A chunk
    // repeated WITHIN one doc only (doc 3) has dfreq 1 → NOT boilerplate.
    val df = Seq(
      (1L, "dup dup solo text"),
      (2L, "dup dup uniq here"),
      (3L, "same same same same")).toDF("doc_id", "text")
    val acct = Curation.boilerplateAccounting(df, "doc_id", "text", 2, 1L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(acct.toSeq == Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 2L)))
  }

  test("boilerplate removal reassembles survivors in order; empty text kept") {
    val df = Seq(
      (1L, "dup dup solo text"),
      (2L, "dup dup uniq here"),
      (3L, "same same same same"),  // within-doc repeat: df=1, both kept
      (4L, "dup dup")).toDF("doc_id", "text") // all boilerplate → empty text
    val rows = Curation.removeBoilerplate(df, "doc_id", "text", 2, 1L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, "solo text", 2L, 1L),
      (2L, "uniq here", 2L, 1L),
      (3L, "same same same same", 2L, 2L),
      (4L, "", 1L, 0L)))
  }

  test("decontamination finds exactly the planted overlap") {
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon"),
      (11L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val test = Seq(
      (90L, "xx alpha beta gamma delta yy"),
      (91L, "nothing shared at all here")).toDF("doc_id", "text")
    val hits = Curation.decontaminate(train, test, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // train 10 shares 4-grams "alpha beta gamma delta" with test 90 — one
    // shared shingle, one test doc; train 11 is clean
    assert(hits.toSeq == Seq((10L, 1L, 1L)))
  }

  test("bloom-prefiltered decontamination returns exactly the exact result") {
    // the sketch path may pass false positives into the join, never false
    // negatives — so its output must be IDENTICAL to the exact operator's,
    // here on a corpus large enough that fpp would surface a discrepancy
    val train = (0L until 300L).map(i =>
      (i, s"tok${i} tok${i + 1} tok${i + 2} tok${i + 3} tok${i + 4} filler$i"))
      .toDF("doc_id", "text")
    val test = Seq(
      (900L, "tok7 tok8 tok9 tok10 tok11"),
      (901L, "unshared words only in eval")).toDF("doc_id", "text")
    val exact = Curation.decontaminate(train, test, "doc_id", "text", 4)
      .orderBy("train_id").collect().map(_.toSeq)
    val bloomed = Curation.decontaminateBloom(train, test, "doc_id", "text", 4)
      .orderBy("train_id").collect().map(_.toSeq)
    assert(bloomed.toSeq == exact.toSeq)
    assert(exact.nonEmpty) // sanity: the planted overlap was found at all
  }

  test("token-budget selection is the exact greedy prefix at every budget") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select($"doc_id", $"text").filter($"doc_id" < 100)
    // brute-force greedy reference on the driver
    val scored = Curation
      .qualityScore(docs, "text", Seq("a", "the"), Long.MinValue)
      .withColumn("ntok", graft.functions.TextFns.tokenCount($"text").cast("long"))
      .select($"doc_id", $"score", $"ntok")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (-t._2, t._1))
    for (budget <- Seq(0L, 500L, 5000L, Long.MaxValue / 2)) {
      var cum = 0L
      val expect = scored.filter { case (_, _, ntok) =>
        cum += ntok; cum <= budget
      }.map(_._1).toSet
      val got = Curation
        .selectByTokenBudget(docs, "doc_id", "text", Seq("a", "the"), budget)
        .filter($"selected").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(got == expect, s"budget=$budget")
    }
  }

  test("token-budget sharded tie cumsum matches the single-window path") {
    // one-score-value corpus: EVERY doc ties at the boundary — the shape
    // that makes an unsharded tie window data-dependent (r10 verdict #4).
    // tieWindowMaxRows=1 forces the monotone id-bucket shard path; it must
    // agree with the single-window path and with the greedy id-prefix.
    // 5000 rows over a 5000-id span → bucket width 2: buckets hold MORE
    // than one row, so the within-bucket running sum composes with the
    // broadcast exclusive-prefix offset (an off-by-one in either part, or
    // in their sum, moves the cut id and fails the prefix assert).
    val docs = (1L to 5000L).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    for (budget <- Seq(0L, 30L, 9999L, 100000L)) {
      def selected(maxRows: Long): Set[Long] = Curation
        .selectByTokenBudget(docs, "doc_id", "text", Seq("a", "the"), budget,
          tieWindowMaxRows = maxRows)
        .filter($"selected").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      val single = selected(Long.MaxValue)
      val sharded = selected(1L)
      assert(sharded == single, s"budget=$budget")
      // identical 4-token docs: the greedy prefix is the first budget/4 ids
      val expectN = math.min(5000L, budget / 4)
      assert(single == (1L to expectN).toSet, s"budget=$budget")
    }
    // non-integral ids stay legal and take the single-window path (the
    // shard arithmetic needs integral ids; a cast would reorder or drop)
    val sdocs = Seq(("doc-b", "alpha beta gamma delta"),
      ("doc-a", "alpha beta gamma delta"), ("doc-c", "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val got = Curation
      .selectByTokenBudget(sdocs, "doc_id", "text", Seq("a", "the"), 8L,
        tieWindowMaxRows = 1L)
      .filter($"selected").select($"doc_id").collect().map(_.getString(0)).toSet
    assert(got == Set("doc-a", "doc-b")) // lexicographic id order, 2 fit
  }

  test("sequence packing: per-shard offsets, bins, and no global window") {
    val df = Seq(
      ("a", 1L, "w1 w2 w3"), ("a", 2L, "w1 w2"), ("a", 3L, "w1 w2 w3 w4"),
      ("b", 9L, "w1 w2 w3 w4 w5")).toDF("source", "doc_id", "text")
    val packed = Curation.packSequences(df, "doc_id", "text", "source", 4)
      .orderBy("source", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(packed.toSeq == Seq(
      ("a", 1L, 3L, 0L, 0L),   // starts at 0 → bin 0
      ("a", 2L, 2L, 3L, 0L),   // starts at 3 → bin 0
      ("a", 3L, 4L, 5L, 1L),   // starts at 5 → bin 1
      ("b", 9L, 5L, 0L, 0L)))  // fresh shard restarts at 0
    // plan lint: the window must be partitioned (no single-partition sort)
    val plan = Curation.packSequences(df, "doc_id", "text", "source", 4)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition()"),
      "packing window lost its partition spec")
  }

  test("stratified keep is deterministic and respects per-stratum rates") {
    val rates = Map("a" -> 100, "b" -> 0)
    val df = (1L to 50L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    val kept = df.filter(Curation.stratifiedKeep("doc_id", "source", rates))
      .collect().map(_.getLong(0)).toSet
    assert(kept == (2L to 50L by 2).toSet)       // all of a, none of b
    // absent stratum keeps nothing
    val none = df.withColumn("source", lit("zzz"))
      .filter(Curation.stratifiedKeep("doc_id", "source", rates)).count()
    assert(none == 0L)
  }

  test("repetition signals: hand-computed dup-line and top-bigram ppm") {
    // doc 1: 2-token lines; "a b" appears twice of 3 lines -> dup 1/3;
    //        bigrams of [a b c d a b]: "a b"x2, "b c", "c d", "d a" -> top 2/5
    // doc 2: no repetition at all
    // doc 3: one token — no bigrams, one line
    val df = Seq(
      (1L, "a b c d a b"),
      (2L, "p q r s t u"),
      (3L, "solo")).toDF("doc_id", "text")
    val got = graft.operators.Curation
      .repetitionSignals(df, "doc_id", "text", lineLen = 2,
        maxDupLinePpm = 300000L, maxTopBigramPpm = 350000L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_lines", "dup_line_ppm",
        "dup_line_char_ppm", "top_bigram_ppm", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    // doc 1: dup_line = 1*1e6/3 = 333333; dup chars: "a b" repeats once ->
    // 3 extra chars of 9 total line chars = 333333; top bigram 2/5 = 400000
    assert(got(0) == (1L, 6L, 3L, 333333L, 333333L, 400000L, false))
    assert(got(1) == (2L, 6L, 3L, 0L, 0L, 200000L, true))
    assert(got(2) == (3L, 1L, 1L, 0L, 0L, 0L, true))
  }

  test("gopher quality signals: every structural rule fires on its own doc") {
    val df = Seq(
      // clean prose: passes everything (token floor relaxed to 5 below)
      (1L, "the quick brown fox jumps over that lazy dog with zeal"),
      // bullet list: 2 of 3 lines bullet-led -> 666666 ppm > 500000
      (2L, "- first item\n- second item\nthe closing line of that list with prose"),
      // ellipsis spam: 2 of 3 lines end '...' -> 666666 ppm > 300000;
      // the two '...'-bearing TOKENS also trip the symbol rule (2/10)
      (3L, "the opening line\nto be continued...\nread more of that..."),
      // symbol soup: 3 '#' of 8 tokens -> symbol, alpha AND word-length fail
      (4L, "# # # tag1 tag2 tag3 42 99"),
      // numerals only: alpha_ppm 0, stop_hits 0
      (5L, "1 2 3 4 5 6 7 8 9 10")).toDF("doc_id", "text")
    val got = Curation.gopherQualitySignals(df, "doc_id", "text", minTokens = 5L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_lines", "mean_word_len_milli",
        "symbol_ppm", "alpha_ppm", "bullet_ppm", "ellipsis_ppm", "stop_hits", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getBoolean(9)))
    assert(got(0) == (1L, 11L, 1L, 4000L, 0L, 1000000L, 0L, 0L, 3L, true))
    assert(got(1) == (2L, 14L, 3L, 3857L, 0L, 857142L, 666666L, 0L, 4L, false))
    assert(got(2) == (3L, 10L, 3L, 4700L, 200000L, 1000000L, 0L, 666666L, 4L, false))
    assert(got(3) == (4L, 8L, 1L, 2375L, 375000L, 375000L, 0L, 0L, 0L, false))
    assert(got(4) == (5L, 10L, 1L, 1100L, 0L, 0L, 0L, 0L, 0L, false))
  }

  test("connected components: chains merge transitively, islands stay apart") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val cc = graft.operators.Components.connectedComponents(pairs, "a_id", "b_id")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    val surv = graft.operators.Components.survivors(
        graft.operators.Components.connectedComponents(pairs, "a_id", "b_id"))
      .orderBy("survivor_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(surv.toSeq == Seq((1L, 3L), (10L, 2L)))
  }

  test("connected components: long path needs multiple propagation rounds") {
    // diameter-7 path: labels must walk the whole chain — catches any
    // one-round-only implementation. localThreshold = 0 forces the
    // distributed loop (the default would take the union-find path here).
    val pairs = (1L to 7L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val cc = graft.operators.Components
      .connectedComponents(pairs, "a_id", "b_id", localThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.length == 8 && cc.forall(_._2 == 1L))
  }

  test("connected components: local union-find and distributed loop agree") {
    // A mix of chains, stars and islands, plus duplicate + self-referencing
    // shaped input; both strategies must produce identical labelings.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (9L, 4L),            // chain + tail merge
      (20L, 21L), (20L, 22L), (20L, 23L),                  // star
      (30L, 31L), (31L, 30L),                              // duplicate both ways
      (40L, 41L)).toDF("a_id", "b_id")
    val local = graft.operators.Components
      .connectedComponents(edges, "a_id", "b_id")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dist = graft.operators.Components
      .connectedComponents(edges, "a_id", "b_id", localThreshold = 0L)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(local == dist)
    assert(local.filter(_._2 == 1L).map(_._1) == Seq(1L, 2L, 3L, 4L, 9L))
  }

  test("connected components: distributed convergence detects fixpoint mid-batch") {
    // Diameter 1 (single edge): converges on round 1 of a 3-round batch —
    // the batched-checkpoint loop must still terminate and label correctly.
    val pairs = Seq((5L, 6L)).toDF("a_id", "b_id")
    val cc = graft.operators.Components
      .connectedComponents(pairs, "a_id", "b_id", localThreshold = 0L)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.toSeq == Seq((5L, 5L), (6L, 5L)))
  }

  test("connected components: reliable-checkpoint mode when a checkpoint dir is set") {
    // Cluster posture: with sparkContext.setCheckpointDir the loop switches
    // to reliable checkpoints (survive executor loss). Same answers.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val pairs = (1L to 5L).map(i => (i, i + 1)).toDF("a_id", "b_id")
      val cc = graft.operators.Components
        .connectedComponents(pairs, "a_id", "b_id", localThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(cc.length == 6 && cc.forall(_._2 == 1L))
      // reliable checkpoint files actually landed
      assert(new java.io.File(dir).listFiles().nonEmpty)
    } finally {
      // Option(null) → None in setCheckpointDir: restores local-checkpoint
      // behavior for the other suites sharing this session.
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("salient terms: rarity beats frequency, rank is dense per group") {
    // "rare" occurs once in one doc (df=1, tf=1 → score 1,000,000);
    // "common" occurs in every doc (df=3) with tf=2 in g1 → 2e6 DIV 3 =
    // 666,666. Equal-ish frequency, rarer term ranks first.
    val df = Seq(
      (1L, "g1", "common rare"),
      (2L, "g1", "common filler"),
      (3L, "g2", "common only here")).toDF("doc_id", "source", "text")
    val top = Curation.salientTerms(df, "doc_id", "text", "source", 2, minDf = 1)
      .filter(col("source") === "g1").orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(5)))
    assert(top.toSeq == Seq(
      (1L, "filler", 1000000L),         // tf=1, df=1; ties with rare → term asc
      (2L, "rare", 1000000L)))          // tf=1, df=1
    // default minDf=2 pre-filters the hapax BEFORE the tf⋈df join: the
    // df>=2 survivors are all that remain ("common" df=3, "here"/"only" df=1
    // die with the rest)
    val dflt = Curation.salientTerms(df, "doc_id", "text", "source", 2)
      .filter(col("source") === "g1").orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(5)))
    assert(dflt.toSeq == Seq((1L, "common", 666666L))) // tf=2, df=3
  }

  test("quality score: length cap, diversity credit, stopword penalty, exact ints") {
    val df = Seq(
      (1L, "the the the the the the the the the the the the the the the the the the the the"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val rows = Curation.qualityScore(df, "text", Seq("a", "the"), 100000L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    // doc 1: n=20, nd=1, ns=20 → 20000 + (500*50000) DIV 1000 − (300*1000000) DIV 1000
    //      = 20000 + 25000 − 300000 = −255000 → dropped
    // doc 2: n=10, nd=10, ns=0 → 10000 + (500*1000000) DIV 1000 − 0 = 510000 → kept
    assert(rows.toSeq == Seq((1L, -255000L, false), (2L, 510000L, true)))
  }

  test("rarity score: hand-computed ints; rare vocabulary outranks common prose") {
    // corpus: "the" ×6, "cat" ×2, "qzx" ×1, "wvk" ×1 → n_total = 10
    // inv: the → 10 DIV 6 = 1; cat → 10 DIV 2 = 5; qzx/wvk → 10
    val df = Seq(
      (1L, "the the the cat"),          // (1+1+1+5) DIV 4 = 2
      (2L, "the the the cat"),          // same again
      (3L, "qzx wvk")).toDF("doc_id", "text") // (10+10) DIV 2 = 10
    val rows = Curation.rarityScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 4L, 2L), (2L, 4L, 2L), (3L, 2L, 10L)))
    // the garbage doc (unique junk vocabulary) outranks the prose docs
    assert(rows.maxBy(_._3)._1 == 3L)
  }

  test("collocations: hand-computed lift, minCount kills the noise tail") {
    // tokens: x2 y2 z1, N=5; pairs: "x y"x2, "y x"x1, "y z"x1.
    // minCount=2 keeps only "x y": lift = 1e6*2*5 / (2*2) = 2500000
    val df = Seq((1L, "x y x y z")).toDF("doc_id", "text")
    val rows = Curation.collocations(df, "text", k = 5, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("x y", 2L, 2500000L)))
    // minCount=1 admits the singletons; "y z" pairs a bigram with a hapax:
    // lift = 1e6*1*5 / (2*1) = 2500000; "y x" = 1e6*5/(2*2) = 1250000
    val all = Curation.collocations(df, "text", k = 5, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(all == Seq(("x y", 2500000L), ("y z", 2500000L), ("y x", 1250000L)))
    // hostile text: a bare U+0001 token must not masquerade as the
    // terminal sentinel — it is filtered before pair construction, so the
    // mined pairs equal those of the same text with the token removed
    // (here "x " and " y" vanish, "x y" pairs survive)
    val hostile = Seq((1L, "x  y x y")).toDF("doc_id", "text")
    val hp = Curation.collocations(hostile, "text", k = 5, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val strippedEq = Curation.collocations(
        Seq((1L, "x y x y")).toDF("doc_id", "text"), "text", k = 5, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hp == strippedEq, s"sentinel token leaked into pairs: $hp")
    assert(hp.forall(!_._1.contains("")))
  }

  test("survivorsByQuality: per-component argmax with deterministic low-id tiebreak") {
    // components: {1,2,3} (id 1), {10,11} (id 10); scores make 3 the best
    // in the first and 10/11 TIE in the second → tie keeps the LOWER id
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("node", "component_id")
    val scored = Seq((1L, 5L), (2L, 9L), (3L, 12L), (10L, 7L), (11L, 7L))
      .toDF("doc_id", "score")
    val got = graft.operators.Components
      .survivorsByQuality(comp, scored, "doc_id", "score")
      .orderBy("component_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, 12L, 3L), (10L, 10L, 7L, 2L)))
  }

  test("survivorsByQuality: unscored members still count and lose via the sentinel") {
    // {1,2,3}: member 3 UNSCORED → n_members stays 3, best scored (2) wins;
    // {10,11}: NO member scored → sentinel tie, lowest id survives
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("node", "component_id")
    val scored = Seq((1L, 5L), (2L, 9L)).toDF("doc_id", "score")
    val got = graft.operators.Components
      .survivorsByQuality(comp, scored, "doc_id", "score")
      .orderBy("component_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 9L, 3L), (10L, 10L, Long.MinValue, 2L)))
  }

  test("containment pairs catch subsumption that symmetric Jaccard misses") {
    // A is quoted wholesale inside B (plus 50 tokens of wrapper): every
    // shingle of A is in B, so cont(A in B) = 1.0 while J = |A|/|B| is
    // tiny — the asymmetric signal the operator exists for
    val a = (1 to 10).map(i => s"quote$i").mkString(" ")
    val b = a + " " + (1 to 50).map(i => s"wrap$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, "unrelated other words entirely"))
      .toDF("doc_id", "text")
    val cont = graft.operators.Dedup
      .ngramContainmentPairs(docs, "doc_id", "text", 4, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(cont.toSeq == Seq((1L, 2L, 1.0, 7.0 / 57.0)),
      s"containment mismatch: ${cont.toSeq}")
    // the SAME pair is invisible to Jaccard at any threshold above |A|/|B|
    val jac = graft.operators.Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", 4, 0.4).count()
    assert(jac == 0L, "Jaccard at 0.4 should miss the subsumed pair")
  }

  test("lshRecallEval: full recall on identical pairs, vacuous 10^6 on empty exact set") {
    // two near-identical long docs: exact J = 56/58 > 0.85 AND all 8
    // signature mins agree... not guaranteed a priori — assert consistency
    // with the two underlying operators instead of hard-coding
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base + " tail"), (3L, "unrelated words here now"))
      .toDF("doc_id", "text")
    val r = graft.operators.Dedup
      .lshRecallEval(docs, "doc_id", "text", 4, 0.85).collect()(0)
    val nExact = graft.operators.Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", 4, 0.85).count()
    val nLsh = graft.operators.Dedup
      .minhashLshPairs(docs, "doc_id", "text", 4, 0.85).count()
    assert(nExact == 1L, "fixture must produce exactly one exact pair")
    assert(r.getLong(0) == nExact && r.getLong(1) == nLsh)
    assert(r.getLong(2) <= math.min(r.getLong(0), r.getLong(1)))
    assert(r.getLong(3) == 1000000L * r.getLong(2) / r.getLong(0))
    // disjoint corpora → empty exact set → vacuous full recall
    val solo = Seq((1L, "completely distinct alpha beta gamma delta epsilon zeta"),
        (2L, "another unrelated set of words with nothing shared at all"))
      .toDF("doc_id", "text")
    val v = graft.operators.Dedup
      .lshRecallEval(solo, "doc_id", "text", 4, 0.85).collect()(0)
    assert(v.getLong(0) == 0L && v.getLong(3) == 1000000L)
    // sampleMod keeps only doc_id % mod == 0 — with both pair members
    // sampled out, all counts drop to zero (vacuous recall again)
    val s = graft.operators.Dedup
      .lshRecallEval(docs, "doc_id", "text", 4, 0.85, sampleMod = 3L).collect()(0)
    assert(s.getLong(0) == 0L && s.getLong(1) == 0L)
  }

  test("incremental-pipeline capstone: leg counts obey the gate chain invariants") {
    // The oracle hash-gates exact values; this spec pins the WIRING
    // invariants that must hold on any fixture: the batch is fresh docs +
    // re-keyed re-crawls, legs only shrink, every gated re-crawl is caught
    // by the fingerprint probe (its text is in history by construction),
    // and the merged corpus is history + accepted.
    val spark2 = TestSpark.spark
    val dir = TestSpark.sfDir
    val docs = Tables.load(spark2, dir, "documents")
    val mid = docs.agg(expr("coalesce(MAX(doc_id) DIV 2, 0)"))
      .collect()(0).getLong(0)
    val nHist = docs.filter(col("doc_id") < mid).count()
    val nFresh = docs.filter(col("doc_id") >= mid).count()
    val nRecrawl = docs.filter(col("doc_id") < mid && col("doc_id") % 5 === 0).count()
    val nRecrawlGated = docs.filter(col("doc_id") < mid && col("doc_id") % 5 === 0)
      .filter(size(graft.functions.TextFns.tokens(col("text"))) >= 20).count()
    val out = SparkEntry.registry.find(_.name == "q_incremental_pipeline").get
      .run(spark2, dir).collect()
    def sumCol(i: Int) = out.map(_.getLong(i)).sum
    val (batch, gated, novel, accepted, merged) =
      (sumCol(1), sumCol(2), sumCol(3), sumCol(4), sumCol(5))
    assert(batch == nFresh + nRecrawl, s"batch=$batch fresh=$nFresh recrawl=$nRecrawl")
    assert(gated <= batch && novel <= gated && accepted <= novel,
      s"legs must only shrink: $batch -> $gated -> $novel -> $accepted")
    // every gated re-crawl is an exact dup of history → dropped at the
    // fingerprint probe (fresh docs may also collide, so >=)
    assert(gated - novel >= nRecrawlGated,
      s"fp probe caught ${gated - novel} < $nRecrawlGated gated recrawls")
    assert(merged == nHist + accepted, s"merged=$merged hist=$nHist acc=$accepted")
    assert(nRecrawlGated > 0, "fixture exercise check: no recrawl passed the gate")
  }

  test("source cap keeps the best-scored docs per source, heap-ranked") {
    // all-distinct tokens, no stopwords → score = 1000·ntok + 500000, so
    // ordering is by token count; ties break on doc_id ascending
    val df = Seq(
      (1L, "one", "A"), (2L, "one two three", "A"), (3L, "x y z q r", "A"),
      (4L, "u v", "B"), (5L, "m n o p", "B"), (6L, "k", "B"))
      .toDF("doc_id", "text", "source")
    val rows = Curation.sourceCap(df, "doc_id", "text", "source",
        Seq("a", "the"), perSource = 2)
      .orderBy("source", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("A", 3L, 1L), ("A", 2L, 2L),   // 5-token then 3-token doc; 1-token cut
      ("B", 5L, 1L), ("B", 4L, 2L)))  // 4-token then 2-token doc; 1-token cut
  }

  test("bigram LM score: hand-computed conditional ppm, garbage scores low") {
    // bigrams: doc 1 = (a b)(b a)(a b), doc 2 = (a c); doc 3 has no bigram.
    // c(a b)=2 c(b a)=1 c(a c)=1; prefixes: c(a ·)=3, c(b ·)=1.
    // ppm: a b → 2000000 DIV 3 = 666666; b a → 1000000; a c → 333333.
    val df = Seq(
      (1L, "a b a b"), (2L, "a c"), (3L, "z")).toDF("doc_id", "text")
    val rows = Curation.bigramLmScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      (1L, 3L, (666666L + 1000000L + 666666L) / 3),  // 777777
      (2L, 1L, 333333L)))
    // the doc made of the corpus's common transition outranks the one-off
    assert(rows.maxBy(_._3)._1 == 1L)
  }

  test("DSIR importance scores match a local replay; target=raw is the unit weight") {
    // Local replay of the operator's exact arithmetic (polyHash mod 64):
    // alpha→55, beta→55 (same bucket), gamma→0, delta→17. rc = {55:6, 0:1,
    // 17:1}, tc(target="alpha beta") = {55:2} → w(55) = 3e6/7 = 428571,
    // w(0) = w(17) = 1e6/2 = 500000. Buckets COLLIDE (alpha/beta) and the
    // smoothed rare-bucket boost wins for the disjoint doc — the replay
    // reproduces both, so the assert pins the real DSIR mechanics, not a
    // convenient no-collision case.
    val raw = Seq((1L, "alpha beta alpha"), (2L, "gamma delta"),
      (3L, "alpha alpha alpha")).toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta")).toDF("doc_id", "text")
    val got = Curation.importanceScores(raw, target, "doc_id", "text", nBuckets = 64)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 3L * 428571L, 428571L),
      (2L, 2L, 1000000L, 500000L),
      (3L, 3L, 3L * 428571L, 428571L)))
    // selection: top-2 by (mean_w DESC, id) = doc 2 then doc 1
    val sel = Curation.importanceSelect(raw, target, "doc_id", "text",
        nBuckets = 64, keep = 2)
      .collect().map(_.getLong(0)).toSet
    assert(sel == Set(2L, 1L))
    // target == raw: every bucket weight is exactly (c+1)e6/(c+1) = 1e6,
    // so mean_w is the unit 1000000 for every document
    val unit = Curation.importanceScores(raw, raw, "doc_id", "text", nBuckets = 64)
      .select("mean_w").collect().map(_.getLong(0)).toSet
    assert(unit == Set(1000000L))
  }

  test("DSIR weight table roundtrips through a frame and scores batches identically") {
    val raw = Seq((1L, "alpha beta alpha"), (2L, "gamma delta"),
      (3L, "alpha alpha alpha")).toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta")).toDF("doc_id", "text")
    // train once → persistable frame → reload → score: must equal the
    // single-shot path exactly (the operational daily-crawl shape, where
    // training never reruns per batch)
    val trained = Curation.importanceWeights(raw, target, "text", nBuckets = 64)
    val reloaded = Curation.weightsFromDf(Curation.weightsToDf(spark, trained))
    assert(reloaded.toSeq == trained.toSeq)
    val viaTable = Curation.scoreWithWeights(raw, "doc_id", "text", reloaded)
      .orderBy("doc_id").collect().map(_.toSeq)
    val direct = Curation.importanceScores(raw, target, "doc_id", "text", 64)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(viaTable.toSeq == direct.toSeq)
    // a table with a hole fails loudly instead of mis-scoring
    val holed = Curation.weightsToDf(spark, trained).filter(col("bucket") =!= 7L)
    intercept[IllegalArgumentException](Curation.weightsFromDf(holed))
    // ... including a TRAILING hole (bucket 63 of 64), which max(bucket)+1
    // cannot see — it would silently shrink the scoring modulus 64 → 63
    val tail = Curation.weightsToDf(spark, trained).filter(col("bucket") =!= 63L)
    intercept[IllegalArgumentException](Curation.weightsFromDf(tail))
    // an explicit expectedSize overrides and also catches it on a legacy
    // frame that never persisted n_buckets
    val legacyTail = tail.drop("n_buckets")
    intercept[IllegalArgumentException](Curation.weightsFromDf(legacyTail, expectedSize = 64))
  }

  test("BPE training learns the hand-computed merge table and stops when pairs exhaust") {
    // vocab: aaab×2, ab×1 (x1/a9 fail the alphabetic gate). Round 1:
    // 'a a' = 4 (two overlapping pairs per aaab) beats 'a b' = 3 → merge
    // (a,a); aaab becomes (aa)(a)(b). Round 2: 'a b' = 3 beats 'aa a' = 2
    // → merge (a,b). Round 3: only 'aa ab' = 2 remains. Round 4 finds no
    // pairs (both words are single symbols) → early stop at 3 merges.
    val df = Seq((1L, "aaab aaab ab"), (2L, "x1 A9")).toDF("doc_id", "text")
    val got = Curation.trainBpe(df, "text", nMerges = 4)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "ab", 2L)))
  }

  test("SCD2: consecutive duplicates collapse, intervals chain, current open") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val log = Seq(
      (1L, ts(1), 101L, "new"), (1L, ts(2), 102L, "new"),
      (1L, ts(3), 103L, "active"), (1L, ts(4), 104L, "new"),
      (2L, ts(5), 201L, "active")).toDF("user_id", "ts", "event_id", "event_type")
    val hist = Scd2.fromChangeLog(log, "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(hist.toSeq == Seq(
      (1L, "new", ts(1), Some(ts(3)), false),     // ts(2) duplicate collapsed
      (1L, "active", ts(3), Some(ts(4)), false),
      (1L, "new", ts(4), None, true),             // state can recur as new version
      (2L, "active", ts(5), None, true)))
    assert(ts0 != null) // silence unused warning on helper anchor
  }

  test("curriculumSchedule: phases are quality-monotone, ties never split, deterministic") {
    // 40 docs with 4 distinct quality tiers (10 docs each): tier t repeats a
    // vocabulary of size 2+3t, so lexical diversity — and the score — rises
    // with t. Every doc in one tier scores IDENTICALLY (same token multiset).
    val docs = (0 until 40).map { i =>
      val tier = i / 10
      val words = (0 until 40).map(j => s"w${j % (2 + 3 * tier)}")
      (i.toLong, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val sched = Curation.curriculumSchedule(df, "doc_id", "text", Seq("a"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sched.length == 40)
    // equal scores → one phase (ties never split): each tier lands whole
    val phaseOfTier = sched.groupBy(_._1 / 10).map { case (t, rows) =>
      val ph = rows.map(_._3).distinct
      assert(ph.size == 1, s"tier $t split across phases $ph")
      t -> ph.head
    }
    // higher tier = higher score = EARLIER phase
    assert(phaseOfTier.toSeq.sortBy(_._1).map(_._2) == Seq(3L, 2L, 1L, 0L))
    // deterministic: a second run is bit-identical
    val again = Curation.curriculumSchedule(df, "doc_id", "text", Seq("a"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sched.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("epochAllocation: budget shares convert to capped epochs with exact arithmetic") {
    // src a: 100 tokens, src b: 400 tokens (docs of 10 tokens each).
    // weights = isqrt: 10, 20; tw = 30; tt = 500; budget = 3*500 = 1500.
    // alloc_a = 1500*10/30 = 500 → cap 3*100 = 300 binds: eff 300, left 200.
    // alloc_b = 1500*20/30 = 1000 → under cap 1200: 2 epochs + 200 partial.
    val docs = (0 until 10).map(i => (i.toLong, "a", ("t " * 10).trim)) ++
      (10 until 50).map(i => (i.toLong, "b", ("t " * 10).trim))
    val df = docs.toDF("doc_id", "source", "text")
    val got = Curation.epochAllocation(df, "source", "text", 3L, 1L, 3L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == Seq(
      ("a", 100L, 10L, 500L, 300L, 3L, 0L, 200L),
      ("b", 400L, 20L, 1000L, 1000L, 2L, 200L, 0L)), s"got ${got.toSeq}")
    // conservation: alloc = eff + leftover; eff = full*tokens + partial
    got.foreach { case (_, tk, _, alloc, eff, full, part, left) =>
      assert(alloc == eff + left && eff == full * tk + part)
    }
  }

  test("shardBalance: conserves totals and decorrelates from id patterns") {
    // ids are all multiples of 8 — `id mod 8` would land EVERY doc in shard
    // 0; the Knuth hash must still spread them
    val df = (0 until 64).map(i => ((i * 8).toLong, "w x y z"))
      .toDF("doc_id", "text")
    val got = Curation.shardBalance(df, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._2).sum == 64L)
    assert(got.map(_._3).sum == 64L * 4)
    assert(got.length >= 6, s"hash sharding collapsed to ${got.length} shards")
    // ppm shares sum to ~1e6 (integer floor loses < nShards ppm)
    val ppm = got.map(_._4).sum
    assert(ppm > 1000000L - 8 && ppm <= 1000000L)
  }

  test("distillPerceptron learns a separable teacher and is deterministic") {
    // teacher = qualityScore >= 150000: long diverse docs score far above,
    // short repetitive ones far below — linearly separable through the
    // length/diversity feature buckets, so the pocket model should imitate
    // the gate (far above the 50% base rate; typically perfectly)
    val docs = (0 until 10).map { i =>
      (i.toLong, (0 until 180).map(j => s"u${i}w$j").mkString(" "))
    } ++ (10 until 20).map { i => (i.toLong, "x y " * 8) }
    val df = docs.toDF("doc_id", "text")
    val got = Curation.distillPerceptron(df, "doc_id", "text", Seq("a"),
        teacherThreshold = 150000L, nBuckets = 64, epochs = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 81) // 64 hash + bias + 8 length + 8 diversity
    val acc = got.head._3
    assert(acc >= 900000L, s"pocket model failed to learn: acc_ppm=$acc")
    // length-bucket weights must separate: the longest bucket positive,
    // the shortest negative
    val wByBucket = got.map(t => t._1 -> t._2).toMap
    assert(wByBucket(65L + 3L) > 0L, "long-doc length bucket should be positive")
    assert(wByBucket(65L) < 0L, "short-doc length bucket should be negative")
    // deterministic end-to-end
    val again = Curation.distillPerceptron(df, "doc_id", "text", Seq("a"),
        150000L, 64, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("weightedBernoulli: max-weight rows always kept, inclusion scales with weight") {
    // keep iff h·wmax < P·w — at w = wmax that is h < P, always true
    val n = 2000
    val df = (0 until n).map { i =>
      (i.toLong, if (i % 2 == 0) 1000L else 100L)
    }.toDF("id", "w")
    val kept = Curation.weightedBernoulli(df, "w", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val keptHigh = kept.count(_._2 == 1000L)
    val keptLow = kept.count(_._2 == 100L)
    assert(keptHigh == n / 2, s"w = wmax must ALWAYS keep: $keptHigh of ${n / 2}")
    // low-weight rows keep with p = 0.1 — Knuth-hash uniformity puts the
    // realized rate within a generous band around 100 of 1000
    assert(keptLow > 50 && keptLow < 200, s"p=0.1 stratum kept $keptLow of ${n / 2}")
    // deterministic: same input → same sample
    val again = Curation.weightedBernoulli(df, "w", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("percentileGate: per-group quota, boundary tie by lowest id, floor quota") {
    // group a: 5 docs, permille 400 → quota 2: the lone 50 plus the
    // LOWEST-id 40 of the tie trio. group b: 2 docs → quota 0 (floor of
    // 0.8): keeps nothing. group c: 3 docs → quota 1, no tie at boundary.
    val df = Seq(
      (1L, "a", 40L), (2L, "a", 50L), (3L, "a", 40L), (4L, "a", 40L),
      (5L, "a", 10L),
      (6L, "b", 99L), (7L, "b", 98L),
      (8L, "c", 7L), (9L, "c", 9L), (10L, "c", 8L)
    ).toDF("id", "grp", "score")
    val out = Curation.percentileGate(df, "id", "grp", "score", 400)
      .collect().map(r => (r.getLong(1), r.getBoolean(3))).toMap
    assert(out.size == 10)
    assert(out.filter(_._2).keySet == Set(1L, 2L, 9L))
  }

  test("tokenBudgetPerGroup: greedy prefix per group, overflow cuts mid-tie, zero-token edge") {
    // group a: tokens 10+10+10+10+0 = 40, permille 500 → quota 20. Order
    // (score desc, id): doc 1 (cum 10, fits); boundary tie at score 5 with
    // budget 10: id 2 (tie cumsum 10 <= 10, selected), id 3 (20 > 10,
    // rejected), id 5 zero-token AFTER the overflow (cumsum stays 20 > 10,
    // rejected); doc 4 below the boundary rejected. group b: quota 5,
    // boundary at score 2 with budget 5: doc 6 (7 > 5) rejected, doc 7
    // below the boundary rejected.
    val df = Seq(
      (1L, "a", 9L, 10L), (2L, "a", 5L, 10L), (3L, "a", 5L, 10L),
      (4L, "a", 1L, 10L), (5L, "a", 5L, 0L),
      (6L, "b", 2L, 7L), (7L, "b", 1L, 3L)
    ).toDF("id", "grp", "score", "ntok")
    val out = Curation.tokenBudgetPerGroup(df, "id", "grp", "score", "ntok", 500)
      .collect().map(r => (r.getLong(1), r.getBoolean(4))).toMap
    assert(out.size == 7)
    assert(out.filter(_._2).keySet == Set(1L, 2L))
    // permille 1000: everything fits, everyone selected
    val all = Curation.tokenBudgetPerGroup(df, "id", "grp", "score", "ntok", 1000)
      .collect().map(r => r.getBoolean(4))
    assert(all.forall(identity))
  }

  test("percentileGate and tokenBudgetPerGroup: NULL group is its own group") {
    // a null group key must neither crash nor leak into a named group —
    // groupBy and the boundary join both treat null as one group (Spark's
    // null-grouping semantics; the equi-join on the null key never matches
    // the broadcast boundary, so percentileGate's LEFT join path decides
    // those rows… the contract this spec pins is the one the operators
    // actually have: null-group rows survive with a deterministic verdict
    // and named groups are unaffected.
    val df = Seq(
      (1L, Some("a"), 9L, 4L), (2L, Some("a"), 5L, 4L),
      (3L, None, 7L, 4L), (4L, None, 6L, 4L)
    ).toDF("id", "grp", "score", "ntok")
    val pg = Curation.percentileGate(df, "id", "grp", "score", 500)
      .collect().map(r => (r.getLong(1), r.getBoolean(3))).toMap
    assert(pg.size == 4)
    assert(pg(1L) && !pg(2L)) // named group cut unaffected: quota 1 of 2
    // null group gets ITS OWN boundary via the null-safe join: quota 1 of
    // 2, so the higher-scored null-group doc survives — the first draft's
    // equi-join never matched the null key and silently kept NONE here
    assert(pg(3L) && !pg(4L))
    val tb = Curation.tokenBudgetPerGroup(df, "id", "grp", "score", "ntok", 500)
      .collect().map(r => (r.getLong(1), r.getBoolean(4))).toMap
    assert(tb.size == 4)
    assert(tb(1L) && !tb(2L)) // 8-token group, budget 4: first doc only
    // null group: 8 tokens, budget 4 — WITHOUT the null-safe join these
    // rows took the whole-group-fits default and BYPASSED the budget
    assert(tb(3L) && !tb(4L))
  }

  test("selection family: empty input degrades to empty output, never throws") {
    // the empty-corpus contract the incremental-minhash NPE fix
    // established, applied to the continuation family: a scheduler
    // running these on an empty partition must get an empty frame back
    val empty = Seq.empty[(Long, String, Long, Long)]
      .toDF("id", "grp", "score", "ntok")
    assert(Curation.percentileGate(empty, "id", "grp", "score", 400)
      .collect().isEmpty)
    assert(Curation.tokenBudgetPerGroup(empty, "id", "grp", "score", "ntok", 400)
      .collect().isEmpty)
    assert(Curation.percentileThresholds(empty, "grp", "score", 400)
      .collect().isEmpty)
    // the trainer's contract is the opposite — loud failure beats a model
    // silently fit on nothing
    val emptyVec = Seq.empty[(Long, Array[Float])].toDF("c_id", "embedding")
    intercept[IllegalArgumentException](
      graft.operators.Similarity.ivfpqTrainUnits(
        emptyVec.select(col("c_id"), col("embedding")), "c_id", "embedding",
        nLists = 8, m = 8, kCent = 16))
  }

  test("percentileGate: permille 1000 keeps every row, 0 keeps none") {
    val df = Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "b", 1L))
      .toDF("id", "grp", "score")
    val all = Curation.percentileGate(df, "id", "grp", "score", 1000)
      .collect().map(r => r.getBoolean(3))
    assert(all.forall(identity) && all.length == 3)
    val none = Curation.percentileGate(df, "id", "grp", "score", 0)
      .collect().map(r => r.getBoolean(3))
    assert(none.forall(!_) && none.length == 3)
  }

  test("gates: NULL score comes back selected=false and consumes no quota/budget") {
    // three-valued logic made a null score fail BOTH the off-boundary and
    // tie filters, so the row vanished — the every-input-row contract now
    // pins it to an explicit selected=false branch, excluded from the
    // histogram (it neither shifts the boundary nor eats quota)
    val df = Seq(
      (1L, "a", Some(9L), 4L), (2L, "a", Some(5L), 4L),
      (3L, "a", Option.empty[Long], 4L), (4L, "a", Some(7L), 4L)
    ).toDF("id", "grp", "score", "ntok")
    // percentile 667: quota = floor(3 * 0.667) = 2 over the three SCORED
    // docs → 9 and 7 selected, 5 not, null not — and the row count is 4
    val pg = Curation.percentileGate(df, "id", "grp", "score", 667)
      .collect().map(r => (r.getLong(1), r.getBoolean(3))).toMap
    assert(pg.size == 4, s"null-score row vanished: ${pg.keySet}")
    assert(pg.filter(_._2).keySet == Set(1L, 4L))
    // token budget 500: 12 scored tokens → budget 6 admits only doc 1;
    // the null-score doc must NOT ride the whole-group-fits branch
    val tb = Curation.tokenBudgetPerGroup(df, "id", "grp", "score", "ntok", 500)
      .collect().map(r => (r.getLong(1), r.getBoolean(4))).toMap
    assert(tb.size == 4, s"null-score row vanished: ${tb.keySet}")
    assert(tb.filter(_._2).keySet == Set(1L))
  }

  test("weightedBernoulli enforces its weight preconditions at runtime") {
    // a non-positive weight would silently never be kept; a weight >= 2^32
    // would overflow the Long keep product into sign-dependent noise —
    // both now fail loudly instead of relying on a scaladoc contract
    val zero = Seq((1L, 10L), (2L, 0L)).toDF("id", "w")
    val eZero = intercept[IllegalArgumentException](
      Curation.weightedBernoulli(zero, "w", "id"))
    assert(eZero.getMessage.contains("positive"))
    val huge = Seq((1L, 10L), (2L, 1L << 32)).toDF("id", "w")
    val eHuge = intercept[IllegalArgumentException](
      Curation.weightedBernoulli(huge, "w", "id"))
    assert(eHuge.getMessage.contains("overflow"))
    // empty input short-circuits (no weights to validate, nothing to keep)
    val empty = Seq.empty[(Long, Long)].toDF("id", "w")
    assert(Curation.weightedBernoulli(empty, "w", "id").collect().isEmpty)
  }
}
