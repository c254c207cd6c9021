package graft.llm

import graft.SparkSpec
import graft.llm.Multimodal.{DecodeStub, MediaBlob, PpmDecoder}

/** Pins the REAL P6 decoder on hand-built images: header parse (dims,
  * maxval, single whitespace before pixels), exact channel means,
  * malformed-container fallback to the stub, and the content-sniffing
  * dispatch in [[Multimodal.decode]]. */
class PpmDecoderSpec extends SparkSpec {

  private def blob(bytes: Array[Byte]) = MediaBlob(7L, bytes, "image/ppm")

  /** 2×2 P6: pixels (R,G,B) = (10,20,30) (40,50,60) (70,80,90)
    * (100,110,120). */
  private val tiny: Array[Byte] =
    "P6\n2 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)

  test("hand-built 2x2 image: dims, digest source, exact channel means") {
    val f = PpmDecoder.decode(blob(tiny)).get
    assert(f.width === 2)
    assert(f.height === 2)
    assert(f.n_frames === 1)
    assert(f.n_bytes === tiny.length)
    assert(f.mean_r === Some((10 + 40 + 70 + 100) / 4.0)) // 55.0
    assert(f.mean_g === Some((20 + 50 + 80 + 110) / 4.0)) // 65.0
    assert(f.mean_b === Some((30 + 60 + 90 + 120) / 4.0)) // 75.0
  }

  test("high bytes read unsigned (pixel values 128..255)") {
    val img = "P6\n1 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](-1, -128, 0) // 255, 128, 0 unsigned
    val f = PpmDecoder.decode(blob(img)).get
    assert(f.mean_r === Some(255.0))
    assert(f.mean_g === Some(128.0))
    assert(f.mean_b === Some(0.0))
  }

  test("malformed containers fall back to the stub") {
    // wrong magic; non-255 maxval; truncated pixel data; empty dims
    val wrongMagic = "P5\n2 2\n255\n".getBytes("US-ASCII") ++ new Array[Byte](12)
    val maxval = "P6\n2 2\n65535\n".getBytes("US-ASCII") ++ new Array[Byte](12)
    val truncated = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ new Array[Byte](11)
    val zeroDim = "P6\n0 2\n255\n".getBytes("US-ASCII")
    for (bad <- Seq(wrongMagic, maxval, truncated, zeroDim)) {
      assert(PpmDecoder.decode(blob(bad)).isEmpty)
      val f = Multimodal.decode(blob(bad))
      assert(f.mean_r.isEmpty) // stub path: no channel stats
      assert(f === DecodeStub.decode(blob(bad)))
    }
  }

  test("content-sniffing dispatch: valid image decodes, text stubs") {
    assert(Multimodal.decode(blob(tiny)).mean_r.isDefined)
    val text = MediaBlob(3L, "plain words only".getBytes("US-ASCII"), "src1")
    val f = Multimodal.decode(text)
    assert(f.mean_r.isEmpty)
    assert(f.width === 320 + text.blob.length % 320) // stub formula
  }
}
