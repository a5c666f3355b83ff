package graft.mm

import java.awt.image.{BufferedImage, ComponentSampleModel, DataBufferByte}
import java.io.ByteArrayInputStream
import java.util.zip.{CRC32, Deflater}
import javax.imageio.ImageIO
import javax.imageio.stream.MemoryCacheImageInputStream

/** Fast 8-bit-grayscale PNG encode/decode for the v7 media family.
  *
  * Round-12 optimization (guide §1.2 step 2 — per-task work): the v7
  * entries' cost is one synth-encode plus one decode per document, and
  * `ImageIO.write`/`ImageIO.read` pay per CALL for writer/reader
  * lookup, `ImageInputStream` plumbing and per-pixel `get/setSample`
  * raster marshalling — measured ~2× the arithmetic they wrap. Both
  * directions here amortize that state per THREAD (tasks are
  * thread-confined, so a worker thread's codec state is reused across
  * every row of every partition it runs):
  *
  *  - [[encode]] writes the PNG container directly (signature,
  *    IHDR/IDAT/IEND, zlib via a reused [[Deflater]], filter 0 rows) —
  *    a byte-exact-decodable, spec-conformant grayscale PNG. The
  *    PAYLOAD bytes may differ from ImageIO's encoder output (chunking
  *    and deflate choices are encoder-private); every registered v7
  *    output is a function of the DECODED raster only, and
  *    PngCodecSpec pins decode(encode(r)) ≡ r through a plain
  *    independent `ImageIO.read`.
  *  - [[decode]] is still a genuine ImageIO PNG decode (the operator's
  *    realism claim), but through a reused per-thread `ImageReader`
  *    and a bulk raster copy out of the decoded `DataBufferByte`
  *    (row-major, scanline-stride-aware) instead of w·h `getSample`
  *    calls; any non-gray/exotic layout falls back to the per-pixel
  *    loop with identical semantics.
  */
object PngGray {

  private val PngSig =
    Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private final class EncState {
    val defl = new Deflater(Deflater.BEST_SPEED)
    val crc = new CRC32
    var filtered: Array[Byte] = new Array[Byte](0)
    var deflated: Array[Byte] = new Array[Byte](0)
  }

  private val encState = new ThreadLocal[EncState] {
    override def initialValue(): EncState = new EncState
  }

  /** Encode a row-major 8-bit grayscale raster as a PNG (color type 0,
    * bit depth 8, filter 0 on every scanline, one IDAT chunk). */
  def encode(w: Int, h: Int, raster: Array[Byte]): Array[Byte] = {
    require(raster.length == w * h, s"raster ${raster.length} != $w*$h")
    val st = encState.get()
    // filter byte 0 + w raster bytes per scanline
    val flen = h * (w + 1)
    if (st.filtered.length < flen) st.filtered = new Array[Byte](flen)
    val f = st.filtered
    var y = 0
    while (y < h) {
      f(y * (w + 1)) = 0
      System.arraycopy(raster, y * w, f, y * (w + 1) + 1, w)
      y += 1
    }
    val defl = st.defl
    defl.reset()
    defl.setInput(f, 0, flen)
    defl.finish()
    if (st.deflated.length < flen + 64) st.deflated = new Array[Byte](flen + 64)
    var dlen = 0
    while (!defl.finished()) {
      if (dlen == st.deflated.length)
        st.deflated = java.util.Arrays.copyOf(st.deflated, dlen * 2)
      dlen += defl.deflate(st.deflated, dlen, st.deflated.length - dlen)
    }
    // signature + IHDR(25) + IDAT(12 + dlen) + IEND(12)
    val out = new Array[Byte](8 + 25 + 12 + dlen + 12)
    var p = 0
    def put4(v: Int): Unit = {
      out(p) = (v >>> 24).toByte; out(p + 1) = (v >>> 16).toByte
      out(p + 2) = (v >>> 8).toByte; out(p + 3) = v.toByte; p += 4
    }
    def chunk(typ: String, body: Array[Byte], blen: Int): Unit = {
      put4(blen)
      val t0 = p
      var i = 0
      while (i < 4) { out(p) = typ.charAt(i).toByte; p += 1; i += 1 }
      System.arraycopy(body, 0, out, p, blen); p += blen
      val crc = st.crc
      crc.reset()
      crc.update(out, t0, 4 + blen)
      put4(crc.getValue.toInt)
    }
    System.arraycopy(PngSig, 0, out, 0, 8); p = 8
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    // 10..12: compression 0, filter 0, interlace 0
    chunk("IHDR", ihdr, 13)
    chunk("IDAT", st.deflated, dlen)
    chunk("IEND", new Array[Byte](0), 0)
    out
  }

  private val reader = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader =
      ImageIO.getImageReadersByFormatName("png").next()
  }

  /** Genuine ImageIO PNG decode (reused per-thread reader) returning
    * (width, height, row-major raster bytes) — value-identical to the
    * original per-pixel `getSample` extraction (PngCodecSpec). */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val r = reader.get()
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(payload))
    val img =
      try { r.setInput(iis, true, true); r.read(0) }
      finally iis.close()
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val bytes = new Array[Byte](w * h)
    raster.getSampleModel match {
      // the PNG reader's 8-bit grayscale layout: one byte bank, pixel
      // stride 1 — copy scanlines out of the backing array directly
      case sm: ComponentSampleModel
          if sm.getNumBands == 1 && sm.getPixelStride == 1 &&
            raster.getDataBuffer.isInstanceOf[DataBufferByte] &&
            raster.getDataBuffer.asInstanceOf[DataBufferByte]
              .getNumBanks == 1 =>
        val db = raster.getDataBuffer.asInstanceOf[DataBufferByte]
        val data = db.getData
        val stride = sm.getScanlineStride
        // offset of sample (x=0, y) exactly as getSample computes it
        val x0 = -raster.getSampleModelTranslateX
        val y0 = -raster.getSampleModelTranslateY
        val base = db.getOffset + sm.getOffset(x0, y0)
        var y = 0
        while (y < h) {
          System.arraycopy(data, base + y * stride, bytes, y * w, w)
          y += 1
        }
      case _ =>
        // generic fallback: identical to the original extraction loop
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            bytes(i) = raster.getSample(x, y, 0).toByte
            i += 1; x += 1
          }
          y += 1
        }
    }
    (w, h, bytes)
  }

  /** The pre-round-12 encode path (BufferedImage + `ImageIO.write`),
    * kept as the spec witness that [[encode]] is decode-equivalent. */
  private[graft] def encodeViaImageIO(w: Int, h: Int,
      raster: Array[Byte]): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        r.setSample(x, y, 0, raster(y * w + x) & 0xff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(1024)
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
