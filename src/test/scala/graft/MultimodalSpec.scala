package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abc", "en", "s0"),
    (1L, "", "en", "s0"),
    (2L, "A" * 200, "de", "s1"))
    .toDF("doc_id", "text", "lang", "source")

  test("filesAsMedia ingests a binary dir with mime, id, and metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "a.png").toPath,
        Array[Byte](137.toByte, 80, 78, 71, 1, 2, 3))
      java.nio.file.Files.write(new java.io.File(dir, "b.wav").toPath,
        Array[Byte](82, 73, 70, 70))
      java.nio.file.Files.write(new java.io.File(dir, "skip.txt").toPath,
        Array[Byte](120))
      java.nio.file.Files.write(new java.io.File(dir, "c.JPEG").toPath,
        Array[Byte](255.toByte, 216.toByte))
      val media = Multimodal.filesAsMedia(spark, dir.getAbsolutePath, "*.{png,wav,JPEG}")
        .collect().sortBy(m => m.meta("path"))
      assert(media.length == 3) // glob pruned the .txt
      // extension sniffing is case-insensitive and knows .jpeg
      assert(media.count(_.mime == "image/jpeg") == 1)
      val png = media.find(_.mime == "image/png").get
      assert(png.bytes.length == 7 && png.meta("length") == "7")
      assert(media.map(_.media_id).distinct.length == 3)
      // deterministic ids: re-reading yields the same ids
      val again = Multimodal.filesAsMedia(spark, dir.getAbsolutePath, "*.{png,wav,JPEG}")
        .collect().map(_.media_id).toSet
      assert(again == media.map(_.media_id).toSet)
      // the decode path runs unchanged on file-sourced media
      val feats = Multimodal.extractFeatures(
        Multimodal.filesAsMedia(spark, dir.getAbsolutePath, "*.{png,wav,JPEG}"))
        .collect()
      assert(feats.map(_.n_bytes).sorted.toSeq == Seq(2L, 4L, 7L))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete(); ()
    }
  }

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
