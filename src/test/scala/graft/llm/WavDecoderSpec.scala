package graft.llm

import graft.SparkSpec

/** Pins the REAL RIFF/WAVE parser ([[Multimodal.WavDecoder]]) on
  * hand-built containers: exact header fields and amplitude stats on a
  * known sample run, word-aligned unknown-chunk skipping (a LIST chunk
  * before fmt/data), and the malformed fallbacks a content-sniffing
  * decode stage must take (wrong magic, truncated data, 16-bit or
  * stereo refusal for the 8-bit amplitude math). */
class WavDecoderSpec extends SparkSpec {

  private def le32(x: Int): Array[Byte] =
    Array[Byte]((x & 0xff).toByte, ((x >> 8) & 0xff).toByte,
      ((x >> 16) & 0xff).toByte, ((x >> 24) & 0xff).toByte)

  test("canonical container parses to exact header fields and stats") {
    // payload bytes 10, 20, 30, 40: mean 25, rms sqrt(750)
    val payload = Array[Byte](10, 20, 30, 40)
    val wav = Multimodal.wavContainer(payload)
    val f = Multimodal.WavDecoder.decode(7L, wav).get
    assert(f.media_id == 7L && f.kind == "audio/wav")
    assert(f.n_bytes == 48L && f.riff_size.contains(40L))
    assert(f.sample_rate.contains(Multimodal.WavSampleRate))
    assert(f.n_channels.contains(1L) && f.bits.contains(8L))
    assert(f.n_samples.contains(4L))
    assert(f.mean_amp.contains(25.0))
    val rms = BigDecimal(math.sqrt((100 + 400 + 900 + 1600) / 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(f.rms_amp.contains(rms))
  }

  test("unknown chunks are skipped word-aligned; odd data sizes pad") {
    // hand-assemble: RIFF size | WAVE | LIST(3 bytes -> padded to 4) |
    // fmt | data(3 samples)
    val payload = Array[Byte](1, 2, 3)
    val canon = Multimodal.wavContainer(payload)
    val fmt = java.util.Arrays.copyOfRange(canon, 12, 36) // "fmt " chunk
    val list = "LIST".getBytes("US-ASCII") ++ le32(3) ++
      Array[Byte]('a', 'b', 'c', 0) // 3-byte body + pad byte
    val data = "data".getBytes("US-ASCII") ++ le32(3) ++ payload
    val body = list ++ fmt ++ data
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(4 + body.length) ++
      "WAVE".getBytes("US-ASCII") ++ body
    val f = Multimodal.WavDecoder.decode(1L, wav).get
    assert(f.n_samples.contains(3L))
    assert(f.mean_amp.contains(2.0))
  }

  test("malformed containers fall back to None") {
    val ok = Multimodal.wavContainer(Array[Byte](5, 5, 5, 5))
    // wrong magic
    val magic = ok.clone(); magic(0) = 'X'
    assert(Multimodal.WavDecoder.decode(1L, magic).isEmpty)
    // truncated data chunk (declared 4, only 2 present)
    assert(Multimodal.WavDecoder.decode(1L,
      java.util.Arrays.copyOfRange(ok, 0, ok.length - 2)).isEmpty)
    // 16-bit refusal: flip the bits field
    val b16 = ok.clone(); b16(34) = 16
    assert(Multimodal.WavDecoder.decode(1L, b16).isEmpty)
    // stereo refusal
    val st = ok.clone(); st(22) = 2
    assert(Multimodal.WavDecoder.decode(1L, st).isEmpty)
    // not even RIFF-sized
    assert(Multimodal.WavDecoder.decode(1L, Array[Byte](1, 2, 3)).isEmpty)
  }

  test("hostile chunk sizes terminate: unsigned-32 overflow returns None") {
    // A declared chunk size near 2^32 used to truncate negative through
    // .toInt (0xFFFFFFF8 -> step 0) and spin the chunk walk forever; the
    // decoder must bail out on any size that exceeds the remaining
    // buffer, in bounded time. Run under a watchdog so a regression
    // fails the test instead of hanging the suite.
    def decodesToNoneQuickly(wav: Array[Byte]): Unit = {
      val task = new java.util.concurrent.FutureTask(
        () => Multimodal.WavDecoder.decode(1L, wav))
      val t = new Thread(task); t.setDaemon(true); t.start()
      val res = task.get(10, java.util.concurrent.TimeUnit.SECONDS)
      assert(res.isEmpty)
    }
    val ok = Multimodal.wavContainer(Array[Byte](5, 5, 5, 5))
    // first chunk declares size 0xFFFFFFF8 (negative as Int, step 0)
    val spin = ok.clone()
    spin(16) = 0xf8.toByte; spin(17) = 0xff.toByte
    spin(18) = 0xff.toByte; spin(19) = 0xff.toByte
    decodesToNoneQuickly(spin)
    // size 0xFFFFFFFF (odd -> pad, step would still be <= 0 as Int)
    val spin2 = ok.clone()
    spin2(16) = 0xff.toByte; spin2(17) = 0xff.toByte
    spin2(18) = 0xff.toByte; spin2(19) = 0xff.toByte
    decodesToNoneQuickly(spin2)
    // a merely-too-large (but positive-Int) declared size also bails
    val big = ok.clone()
    big(16) = 0x00.toByte; big(17) = 0x00.toByte
    big(18) = 0x00.toByte; big(19) = 0x7f.toByte
    decodesToNoneQuickly(big)
  }

  test("entry plumbing: wav quarter parses, the rest stays opaque") {
    val out = Multimodal.audioFeatures(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      if (id % 4 == 1) {
        assert(r.getAs[String]("kind") == "audio/wav", s"id $id")
        assert(!r.isNullAt(r.fieldIndex("mean_amp")), s"id $id")
        assert(r.getAs[Long]("n_bytes") ==
          r.getAs[Long]("n_samples") + 44L, s"id $id")
      } else {
        assert(r.isNullAt(r.fieldIndex("sample_rate")), s"id $id")
        assert(r.isNullAt(r.fieldIndex("mean_amp")), s"id $id")
      }
    }
  }
}
