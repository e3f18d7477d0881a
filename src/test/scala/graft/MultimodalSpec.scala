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

  test("decodeImage reads a real PNG: dimensions, bands, exact gradient luma") {
    // synthPng writes through the real encoder; decoding must recover the
    // exact gradient (PNG is lossless): pixel (x,y) = (7x+13y+seed)%256
    val media = Seq(
      Multimodal.Media(1L, Multimodal.synthPng(5L, 16, 8), "image/png", Map.empty),
      Multimodal.Media(2L, Multimodal.synthPng(0L, 1, 1), "image/png", Map.empty),
      // corrupt payload must degrade, not throw
      Multimodal.Media(3L, Array[Byte](1, 2, 3), "image/png", Map.empty),
      // non-image mimes are not decoded at all
      Multimodal.Media(4L, Array[Byte](9), "audio/wav", Map.empty))
    val feats = Multimodal.extractImageFeatures(
      spark.createDataset(media)(org.apache.spark.sql.Encoders.product[Multimodal.Media]))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L, 3L)) // wav filtered out
    val grad = feats(0)
    assert((grad.width, grad.height, grad.channels, grad.n_pixels) == (16, 8, 3, 128L))
    val expected = (for (y <- 0 until 8; x <- 0 until 16)
      yield (7 * x + 13 * y + 5) % 256).sum.toDouble / 128.0
    assert(grad.mean_luma == expected, s"${grad.mean_luma} != $expected")
    assert((feats(1).width, feats(1).height, feats(1).n_pixels) == (1, 1, 1L))
    assert(feats(1).mean_luma == 0.0) // seed 0, single black pixel
    assert(feats(2).width == -1 && feats(2).mean_luma.isNaN)
  }

  test("decodeImage: grayscale luma is the STORED sample, corrupt magic degrades") {
    javax.imageio.ImageIO.setUseCache(false)
    // grayscale PNG with every pixel stored as 128: mean_luma must be 128
    // (the getRGB path would convert linear gray -> sRGB and report ~186)
    val gray = new java.awt.image.BufferedImage(6, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val wr = gray.getRaster
    (0 until 4).foreach(y => (0 until 6).foreach(x => wr.setSample(x, y, 0, 128)))
    val gBytes = { val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(gray, "png", b); b.toByteArray }
    // valid PNG magic, garbage body: plugins throw RuntimeExceptions here,
    // which must degrade to the -1/NaN row, not kill the task
    val corrupt = gBytes.take(16) ++ Array.fill[Byte](32)(0x5a)
    val feats = Multimodal.extractImageFeatures(spark.createDataset(Seq(
      Multimodal.Media(1L, gBytes, "image/png", Map.empty),
      Multimodal.Media(2L, corrupt, "image/png", Map.empty)))(
      org.apache.spark.sql.Encoders.product[Multimodal.Media]))
      .collect().sortBy(_.media_id)
    assert((feats(0).width, feats(0).height, feats(0).channels) == (6, 4, 1))
    assert(feats(0).mean_luma == 128.0, s"stored-gray luma, got ${feats(0).mean_luma}")
    assert(feats(1).width == -1 && feats(1).mean_luma.isNaN)
  }

  test("resizeImages keeps alpha for PNG and stays JPEG for JPEG") {
    javax.imageio.ImageIO.setUseCache(false)
    // RGBA source: transparency must survive the resize
    val argb = new java.awt.image.BufferedImage(64, 32,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    (0 until 32).foreach(y => (0 until 64).foreach(x =>
      argb.setRGB(x, y, if (x < 32) 0x00000000 else 0xffff0000.toInt)))
    val argbBytes = { val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(argb, "png", b); b.toByteArray }
    val jpg = new java.awt.image.BufferedImage(80, 40,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jpgBytes = { val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(jpg, "jpg", b); b.toByteArray }
    val out = Multimodal.resizeImages(spark.createDataset(Seq(
      Multimodal.Media(1L, argbBytes, "image/png", Map.empty),
      Multimodal.Media(2L, jpgBytes, "image/jpeg", Map.empty)))(
      org.apache.spark.sql.Encoders.product[Multimodal.Media]), 32)
      .collect().sortBy(_.media_id)
    val backPng = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).bytes))
    assert((backPng.getWidth, backPng.getHeight) == (32, 16))
    assert(backPng.getColorModel.hasAlpha, "alpha channel must survive")
    assert((backPng.getRGB(0, 8) >>> 24) == 0, "left half stays transparent")
    assert(out(1).mime == "image/jpeg" && out(1).meta("resized") == "32x16")
    val backJpg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1).bytes))
    assert((backJpg.getWidth, backJpg.getHeight) == (32, 16))
  }

  test("decodeImage reads a real JPEG (lossy: dimensions and bands only)") {
    // encode a JPEG with the same JDK codec, decode through the kernel
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(20, 10,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 10).foreach(y => (0 until 20).foreach(x => img.setRGB(x, y, 0x808080)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val feats = Multimodal.extractImageFeatures(spark.createDataset(Seq(
      Multimodal.Media(7L, baos.toByteArray, "image/jpeg", Map.empty)))(
      org.apache.spark.sql.Encoders.product[Multimodal.Media])).collect()
    assert(feats.length == 1)
    assert((feats(0).width, feats(0).height, feats(0).channels) == (20, 10, 3))
    // lossy but near-flat gray: luma within 2 of the encoded 128
    assert(math.abs(feats(0).mean_luma - 128.0) < 2.0)
  }

  test("resizeImages scales the long edge down, re-encodes decodable PNG") {
    val media = Seq(
      Multimodal.Media(1L, Multimodal.synthPng(3L, 64, 16), "image/png", Map.empty),
      Multimodal.Media(2L, Multimodal.synthPng(3L, 8, 4), "image/png", Map.empty),
      Multimodal.Media(3L, "not an image".getBytes, "text/plain", Map.empty))
    val resized = Multimodal.resizeImages(spark.createDataset(media)(
      org.apache.spark.sql.Encoders.product[Multimodal.Media]), 32)
      .collect().sortBy(_.media_id)
    // 64x16 -> 32x8, re-encoded as a REAL png the kernel can re-decode
    val back = Multimodal.extractImageFeatures(spark.createDataset(
      Seq(resized(0)))(org.apache.spark.sql.Encoders.product[Multimodal.Media]))
      .collect()(0)
    assert((back.width, back.height) == (32, 8))
    assert(resized(0).meta("resized") == "32x8")
    // small image and non-image payloads pass through untouched
    assert(resized(1).bytes.toSeq == media(1).bytes.toSeq)
    assert(resized(2).bytes.toSeq == media(2).bytes.toSeq)
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

  test("decodeAudio reads a real WAV: header, exact abs-sum and peak") {
    // synthWav writes through the real AudioSystem encoder; the parser
    // must recover the exact sawtooth: sample i = (2731*i+seed)%65536-32768
    val media = Seq(
      Multimodal.Media(1L, Multimodal.synthWav(5L, 100), "audio/wav", Map.empty),
      Multimodal.Media(2L, Multimodal.synthWav(0L, 1), "audio/wav", Map.empty),
      // corrupt payload must degrade, not throw
      Multimodal.Media(3L, Array[Byte](1, 2, 3, 4), "audio/wav", Map.empty),
      // non-audio mimes are not decoded at all
      Multimodal.Media(4L, Array[Byte](9), "image/png", Map.empty))
    val feats = Multimodal.extractAudioFeatures(
      spark.createDataset(media)(org.apache.spark.sql.Encoders.product[Multimodal.Media]))
      .collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(1L, 2L, 3L)) // png filtered out
    val saw = feats(0)
    assert((saw.sample_rate, saw.channels, saw.bits, saw.n_frames) == (8000, 1, 16, 100L))
    val samples = (0 until 100).map(i => ((2731L * i + 5) % 65536).toInt - 32768)
    assert(saw.abs_sum == samples.map(s => math.abs(s).toLong).sum)
    assert(saw.peak == samples.map(math.abs).max)
    // seed 0, one frame: sample 0 = -32768
    assert((feats(1).n_frames, feats(1).abs_sum, feats(1).peak) == (1L, 32768L, 32768))
    assert(feats(2).sample_rate == -1 && feats(2).abs_sum == -1L)
  }

  test("decodeAudio: stereo interleaved and big-endian AIFF decode exactly") {
    // stereo: L = i, R = -i, interleaved 16-bit LE — abs_sum covers both
    // channels, frames count frame PAIRS once
    val n = 64
    val pcm = new Array[Byte](n * 4)
    (0 until n).foreach { i =>
      val l = i.toShort; val r = (-i).toShort
      pcm(4 * i) = (l & 0xff).toByte; pcm(4 * i + 1) = ((l >> 8) & 0xff).toByte
      pcm(4 * i + 2) = (r & 0xff).toByte; pcm(4 * i + 3) = ((r >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val wav = { val b = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, b); b.toByteArray }
    // same samples as mono big-endian AIFF: the decoder must honor byte order
    val bePcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      bePcm(2 * i) = ((i >> 8) & 0xff).toByte; bePcm(2 * i + 1) = (i & 0xff).toByte }
    val beFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val aiff = { val b = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(bePcm), beFmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.AIFF, b); b.toByteArray }
    val feats = Multimodal.extractAudioFeatures(spark.createDataset(Seq(
      Multimodal.Media(1L, wav, "audio/wav", Map.empty),
      Multimodal.Media(2L, aiff, "audio/aiff", Map.empty)))(
      org.apache.spark.sql.Encoders.product[Multimodal.Media]))
      .collect().sortBy(_.media_id)
    val absN = (0 until n).map(_.toLong).sum
    assert((feats(0).channels, feats(0).n_frames, feats(0).abs_sum, feats(0).peak)
      == (2, n.toLong, 2 * absN, n - 1))
    assert((feats(1).channels, feats(1).n_frames, feats(1).abs_sum, feats(1).peak)
      == (1, n.toLong, absN, n - 1))
  }

  private def mediaDs(ms: Multimodal.Media*) =
    spark.createDataset(ms)(org.apache.spark.sql.Encoders.product[Multimodal.Media])

  test("external frame extraction: identity decoder matches the stub slicing") {
    // /bin/cat as the decoder = raw frames are the payload itself, so the
    // external-subprocess path must slice exactly like frameSampleStub
    val payloadA = Array.tabulate[Byte](120)(i => (i % 97).toByte) // 3 x 40
    val payloadB = Array.tabulate[Byte](40)(i => (i + 7).toByte)   // 1 x 40
    val ds = mediaDs(
      Multimodal.Media(1L, payloadA, "video/raw", Map.empty),
      Multimodal.Media(2L, payloadB, "video/raw", Map.empty))
    val ext = Multimodal.frameExtractExternal(ds, Seq("/bin/cat"), frameBytes = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getAs[Array[Byte]](3).toSeq, r.getString(4))).sortBy(x => (x._1, x._2))
    assert(ext.forall(_._5 == null), s"no errors expected: ${ext.toSeq}")
    val stub = Multimodal.frameSampleStub(ds, frameBytes = 40, everyK = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getAs[Array[Byte]](3).toSeq)).sortBy(x => (x._1, x._2))
    assert(ext.map(x => (x._1, x._2, x._3, x._4)).toSeq == stub.toSeq)
    // everyK keeps original indices and still drains the pipe
    val k2 = Multimodal.frameExtractExternal(ds, Seq("/bin/cat"),
      frameBytes = 40, everyK = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(k2.toSeq == Seq((1L, 0), (1L, 2), (2L, 0)))
  }

  test("external frame extraction: failures degrade to error rows, not task death") {
    val ds = mediaDs(
      Multimodal.Media(1L, Array.tabulate[Byte](80)(_.toByte), "video/raw", Map.empty),
      Multimodal.Media(2L, Array.tabulate[Byte](30)(_.toByte), "video/raw", Map.empty))
    // decoder that exits non-zero with no output: one error row per media
    val dead = Multimodal.frameExtractExternal(ds, Seq("/bin/false"), frameBytes = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(4)))
    assert(dead.length == 2 && dead.forall { case (_, i, e) => i == -1 && e != null })
    // nonexistent binary: same degradation, message names the failure
    val missing = Multimodal.frameExtractExternal(ds,
      Seq("/no/such/decoder_binary"), frameBytes = 40)
      .collect().map(_.getString(4))
    assert(missing.length == 2 && missing.forall(_ != null))
    // a truncated tail is corruption, not a short frame: emitted frames
    // survive, then an error row flags the truncation (media 2: 30 < 40)
    val trunc = Multimodal.frameExtractExternal(ds, Seq("/bin/cat"), frameBytes = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(4)))
      .sortBy(x => (x._1, x._2))
    assert(trunc.filter(_._1 == 1L).map(x => (x._2, x._3)).toSeq
      == Seq((0, null), (1, null)))
    val m2 = trunc.filter(_._1 == 2L)
    assert(m2.length == 1 && m2.head._2 == -1 && m2.head._3.contains("truncated"))
  }
}
