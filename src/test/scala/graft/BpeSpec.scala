package graft

import graft.functions.TextFns
import graft.plans.BpeKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent CLASSIC BPE encoder: repeatedly find the lowest-rank pair
    * present anywhere, merge its leftmost occurrence, repeat to fixpoint.
    * The kernel applies each rule once in rank order instead; for a
    * training-consistent merge table the two must agree exactly — this spec
    * is the empirical check of that equivalence argument.
    */
  private def classicBpe(word: String): Seq[String] = {
    val rank = TextFns.bpeMerges.zipWithIndex.toMap
    var seq = word.map(_.toString).toVector
    var done = false
    while (!done) {
      val cand = seq.zip(seq.drop(1)).zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
      if (cand.isEmpty) done = true
      else {
        val best = cand.minBy { case (r, i) => (r, i) }
        val (a, b) = TextFns.bpeMerges(best._1)
        seq = seq.patch(best._2, Seq(a + b), 2)
      }
    }
    seq
  }

  test("merges table is training-consistent (composites created before use)") {
    val created = scala.collection.mutable.Set[String]()
    TextFns.bpeMerges.foreach { case (a, b) =>
      for (side <- Seq(a, b) if side.length > 1)
        assert(created.contains(side), s"rule ($a,$b) uses un-created token '$side'")
      created += (a + b)
    }
    assert(TextFns.bpeMerges.distinct.size == TextFns.bpeMerges.size, "duplicate rule")
  }

  test("kernel equals classic BPE on dictionary words and random strings") {
    val words = Seq("the", "and", "another", "interesting", "that", "question",
      "weather", "chills", "data", "tokenization", "a", "zz", "qqq",
      "theatre", "understanding", "mismatched", "searches")
    val rnd = new scala.util.Random(42)
    val randoms = (1 to 300).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    (words ++ randoms).foreach { w =>
      val got = BpeKernel.bpeWord(w).toSeq
      assert(got == classicBpe(w), s"word '$w': kernel $got vs classic ${classicBpe(w)}")
      assert(got.mkString == w, s"BPE('$w') does not recompose")
      assert(got.forall(_.nonEmpty))
    }
  }

  test("known merges compose: 'the' is one token, digits split, symbols count 1") {
    assert(BpeKernel.bpeWord("the").toSeq == Seq("the"))
    assert(BpeKernel.bpeWord("that").toSeq == Seq("th", "at"))
    val df = Seq((1L, "The cat, 42 thermos!")).toDF("doc_id", "text")
      .withColumn("pre", TextFns.preTokens(col("text")))
      .withColumn("toks", TextFns.bpeTokens(col("pre")))
      .withColumn("n", TextFns.bpeCount(col("pre")))
    val row = df.select("toks", "n").head()
    val toks = row.getSeq[String](0)
    // "the" → [the]; "cat" → [c, at]; "," → 1; "42" → [4, 2]; "thermos" →
    // BPE'd; "!" → 1. Count must equal the token sequence length.
    assert(toks.take(4) == Seq("the", "c", "at", ","), toks.toString)
    assert(toks.contains("4") && toks.contains("2"))
    assert(row.getLong(1) == toks.length.toLong)
  }

  test("count kernel equals size(tokens kernel) on fixture documents") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").limit(300)
      .withColumn("pre", TextFns.preTokens(col("text")))
    val bad = docs
      .withColumn("n1", TextFns.bpeCount(col("pre")))
      .withColumn("n2", size(TextFns.bpeTokens(col("pre"))).cast("long"))
      .filter(col("n1") =!= col("n2")).count()
    assert(bad == 0L)
  }
}
