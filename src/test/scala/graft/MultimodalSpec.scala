package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("binary media column round-trips through the batch decode seam") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").limit(50)
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val decoded = Multimodal.decode(media).collect()
    assert(decoded.length == 50)
    decoded.foreach { d =>
      assert(d.n_bytes > 0)
      assert(d.meta.width == (d.n_bytes % 640).toInt)
      assert(d.features.length == 16)
      assert(math.abs(d.features.sum - 1.0f) < 1e-3) // L1-normalized histogram
    }
  }

  test("decode is deterministic (same bytes, same metadata and features)") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").limit(10)
    val m = Multimodal.asMedia(docs, "doc_id", "text")
    val a = Multimodal.decode(m).collect().map(d => (d.doc_id, d.meta, d.features.toSeq)).toSet
    val b = Multimodal.decode(m).collect().map(d => (d.doc_id, d.meta, d.features.toSeq)).toSet
    assert(a == b)
  }

  test("frame sampling yields ceil(len/stride) frames") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").limit(5)
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val lens = media.collect().map(r => r.doc_id -> r.media.length).toMap
    Multimodal.frameSample(media, 10).collect().foreach { r =>
      val id = r.getLong(0)
      val frames = r.getSeq[Int](1)
      assert(frames.length == (lens(id) + 9) / 10)
    }
  }
}
