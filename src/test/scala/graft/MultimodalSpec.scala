package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abc", "en", "s0"),
    (1L, "", "en", "s0"),
    (2L, "A" * 200, "de", "s1"))
    .toDF("doc_id", "text", "lang", "source")

  test("textAsMedia carries bytes + mime + metadata") {
    val m = Multimodal.textAsMedia(docs).collect().sortBy(_.media_id)
    assert(m(0).bytes.toSeq == "abc".getBytes("UTF-8").toSeq)
    assert(m(0).mime == "text/plain")
    assert(m(0).meta == Map("lang" -> "en", "source" -> "s0"))
  }

  test("extractFeatures computes deterministic byte features per partition") {
    val f = Multimodal.extractFeatures(Multimodal.textAsMedia(docs))
      .collect().sortBy(_.media_id)
    assert(f(0) == Multimodal.MediaFeatures(0L, 3, 'a'.toInt, 'c'.toInt, 'a' + 'b' + 'c'))
    assert(f(1) == Multimodal.MediaFeatures(1L, 0, -1, -1, 0))
    assert(f(2).n_bytes == 200 && f(2).byte_sum == 200L * 'A')
  }

  test("resizeStub truncates oversized payloads and flags metadata") {
    val r = Multimodal.resizeStub(Multimodal.textAsMedia(docs), 100)
      .collect().sortBy(_.media_id)
    assert(r(0).bytes.length == 3 && !r(0).meta.contains("truncated"))
    assert(r(2).bytes.length == 100 && r(2).meta("truncated") == "true")
  }

  test("frameSampleStub emits every k-th fixed-size frame") {
    val frames = Multimodal.frameSampleStub(Multimodal.textAsMedia(docs), 64, 2)
      .select("media_id", "frame_idx", "frame_len")
      .as[(Long, Int, Int)].collect().toSet
    // 200 bytes -> frames 0..3 (64,64,64,8); keep idx 0 and 2
    assert(frames.filter(_._1 == 2L) == Set((2L, 0, 64), (2L, 2, 64)))
    assert(frames.filter(_._1 == 0L) == Set((0L, 0, 3)))
  }
}
