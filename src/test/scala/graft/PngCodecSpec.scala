package graft

import graft.mm.{MultimodalOps, PngGray}
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 codec optimization pins (OPTIMIZATION_r12.md): the fast
  * PNG container writer and the reused-reader decode must be
  * value-identical to the ImageIO-writer + per-pixel-extraction path
  * they replaced — the v7 family's outputs are functions of the
  * DECODED raster, so raster equality is the whole contract. */
class PngCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, dx: Int, dy: Int, a: Int): Array[Byte] = {
    val r = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r(y * w + x) = ((dx * x + dy * y) % 100 + 1 + a).toByte; x += 1 }
      y += 1
    }
    r
  }

  private val shapes = Seq(
    (8, 8), (71, 55), (16, 47), (63, 16), (1, 1), (1, 40), (40, 1),
    (128, 96), (13, 29))

  test("fast encode decodes (via a PLAIN independent ImageIO.read) to the source raster") {
    for ((w, h) <- shapes; (dx, dy, a) <- Seq((3, 5, 0), (13, 11, 26), (1, 1, 7))) {
      val src = gradient(w, h, dx, dy, a)
      val png = PngGray.encode(w, h, src)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null, s"ImageIO cannot decode fast-encoded $w x $h")
      assert(img.getWidth == w && img.getHeight == h)
      val got = new Array[Byte](w * h)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { got(i) = img.getRaster.getSample(x, y, 0).toByte; i += 1; x += 1 }
        y += 1
      }
      assert(java.util.Arrays.equals(got, src), s"raster drift at $w x $h dx=$dx dy=$dy a=$a")
    }
  }

  test("fast decode of an ImageIO-WRITTEN png equals the source raster (old-world payloads)") {
    for ((w, h) <- shapes) {
      val src = gradient(w, h, 7, 3, 12)
      val oldPng = PngGray.encodeViaImageIO(w, h, src)
      val (gw, gh, got) = PngGray.decode(oldPng)
      assert(gw == w && gh == h)
      assert(java.util.Arrays.equals(got, src), s"decode drift at $w x $h")
    }
  }

  test("round-trip through the registered synth paths matches the pre-round-12 encode") {
    // MediaSynth: two-band raster — dims/grays over a representative grid
    for (docId <- Seq(0L, 5L, 96L, 97L, 1234L); n <- Seq(0, 17, 200, 977)) {
      val (w, h) = MultimodalOps.MediaSynth.dims(n)
      val (g1, g2) = MultimodalOps.MediaSynth.grays(docId)
      val expected = new Array[Byte](w * h)
      java.util.Arrays.fill(expected, 0, w * (h / 2), g1.toByte)
      java.util.Arrays.fill(expected, w * (h / 2), w * h, g2.toByte)
      val (dw, dh, raster) =
        PngGray.decode(MultimodalOps.MediaSynth.pngBytes(docId, n))
      assert((dw, dh) == (w, h))
      assert(java.util.Arrays.equals(raster, expected),
        s"MediaSynth drift doc=$docId n=$n")
    }
    // PhashSynth: gradient raster keyed by a content hex
    for (hex <- Seq("00112233445566778899aabbccddeeff",
        "fedcba98765432100123456789abcdef"); docId <- Seq(1L, 2L, 28L)) {
      val p = MultimodalOps.PhashSynth.params(hex, docId)
      val expected = gradient(p.w, p.h, p.dx, p.dy, p.a)
      val (dw, dh, raster) =
        PngGray.decode(MultimodalOps.PhashSynth.pngBytes(hex, docId))
      assert((dw, dh) == (p.w, p.h))
      assert(java.util.Arrays.equals(raster, expected),
        s"PhashSynth drift hex=$hex doc=$docId")
    }
  }
}
