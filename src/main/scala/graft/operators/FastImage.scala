package graft.operators

import java.util.zip.{CRC32, DataFormatException, Inflater}

/** Direct decoders for the two image formats the media corpus carries
  * (PNG, BMP), bypassing ImageIO's SPI-registry / ImageInputStream /
  * BufferedImage machinery whose per-call constant (~tens of µs) costs
  * more than the pixel work for the corpus's tiny rasters (4–19 px
  * stills, 4×3 video frames at n_frames × corpus fan-out).
  *
  * Scope is a fast PATH, not a replacement: anything outside the
  * supported envelope (interlaced PNG, palette/16-bit channels, RLE or
  * <24-bit BMP, malformed chunks, bad CRCs) returns None and the caller
  * falls back to ImageIO — so the fast path can never change WHAT
  * decodes, only how fast the common layouts do. PNG chunk CRCs are
  * verified (the JDK reader rejects CRC-corrupt chunks; a corrupt blob
  * must keep quarantining identically). Pixels are produced exactly as
  * `BufferedImage.getRGB` renders them (0xFF000000 | r<<16 | g<<8 | b
  * for opaque rasters), so every downstream integer fold (dHash grids,
  * luminance embeddings) is bit-identical to the ImageIO path.
  */
private[graft] object FastImage {

  /** Row-major ARGB raster — the `BufferedImage.getRGB` view of the
    * image without the BufferedImage.
    */
  final class Raster(val w: Int, val h: Int, val argb: Array[Int]) {
    @inline def rgb(x: Int, y: Int): Int = argb(y * w + x)
  }

  def decode(blob: Array[Byte]): Option[Raster] =
    decode(blob, 0, blob.length)

  /** Decode from a byte RANGE — the mp4 per-frame path hands (mdat,
    * frame·slot, slot) slices without copying them out.
    */
  def decode(buf: Array[Byte], off: Int, len: Int): Option[Raster] = {
    if (len >= 8 && isPngSig(buf, off)) decodePng(buf, off, len)
    else if (len >= 54 && buf(off) == 'B' && buf(off + 1) == 'M')
      decodeBmp(buf, off, len)
    else None
  }

  // ---- PNG ----

  private def isPngSig(b: Array[Byte], o: Int): Boolean =
    b(o) == 0x89.toByte && b(o + 1) == 'P' && b(o + 2) == 'N' &&
      b(o + 3) == 'G' && b(o + 4) == 0x0d && b(o + 5) == 0x0a &&
      b(o + 6) == 0x1a && b(o + 7) == 0x0a

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  /** Raster cap: a spec-valid header can declare dimensions whose
    * buffers don't fit the corpus envelope by orders of magnitude; such
    * rows take the ImageIO path (which streams rows) instead of a giant
    * eager allocation here.
    */
  private val MaxPixels = 1 << 24

  private def decodePng(buf: Array[Byte], off: Int, len: Int): Option[Raster] = {
    val end = off + len
    var p = off + 8
    // IHDR must be first (spec); 25 = 4 len + 4 type + 13 data + 4 crc
    if (p + 25 > end || be32(buf, p) != 13 ||
      buf(p + 4) != 'I' || buf(p + 5) != 'H' || buf(p + 6) != 'D' ||
      buf(p + 7) != 'R') return None
    if (!crcOk(buf, p + 4, 17, be32(buf, p + 21))) return None
    val w = be32(buf, p + 8)
    val h = be32(buf, p + 12)
    val bitDepth = buf(p + 16) & 0xff
    val colorType = buf(p + 17) & 0xff
    val compression = buf(p + 18) & 0xff
    val filterMethod = buf(p + 19) & 0xff
    val interlace = buf(p + 20) & 0xff
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    if (bitDepth != 8 || compression != 0 || filterMethod != 0 ||
      interlace != 0) return None
    // grayscale (0) is deliberately EXCLUDED: ImageIO surfaces it as
    // TYPE_BYTE_GRAY whose getRGB runs a linear-gray→sRGB color-space
    // conversion, so an identity (v,v,v) fast path would produce
    // different pixels than the ImageIO path it must be bit-equal to
    val bpp = colorType match {
      case 2 => 3 // truecolor
      case 6 => 4 // truecolor + alpha (sRGB ARGB: getRGB is identity)
      case _ => return None // palette / grayscale / gray+alpha → ImageIO
    }
    p += 25
    // walk chunks: gather IDAT ranges (CRC-checked), stop at IEND
    var idatLen = 0
    var nIdat = 0
    // two passes over the chunk list (cheap: header walks, no data copy)
    // so the concatenated-IDAT buffer allocates exactly once
    val firstIdat = p
    var sawEnd = false
    while (!sawEnd && p + 12 <= end) {
      val clen = be32(buf, p)
      if (clen < 0 || p + 12 + clen > end) return None
      val tag = be32(buf, p + 4)
      if (tag == 0x49444154) { idatLen += clen; nIdat += 1 } // "IDAT"
      else if (tag == 0x49454e44) sawEnd = true // "IEND"
      p += 12 + clen
    }
    if (!sawEnd || idatLen == 0) return None
    val stride = 1 + w * bpp
    val raw = new Array[Byte](h * stride)
    val inf = new Inflater()
    try {
      var q = firstIdat
      var done = 0
      var ended = false
      while (!ended && q + 12 <= end && done < raw.length) {
        val clen = be32(buf, q)
        val tag = be32(buf, q + 4)
        if (tag == 0x49444154) {
          if (!crcOk(buf, q + 4, clen + 4, be32(buf, q + 8 + clen)))
            return None
          inf.setInput(buf, q + 8, clen)
          var n = 1
          while (n > 0 && done < raw.length) {
            n = try inf.inflate(raw, done, raw.length - done)
            catch { case _: DataFormatException => return None }
            done += n
          }
        } else if (tag == 0x49454e44) ended = true
        q += 12 + clen
      }
      if (done < raw.length) return None
    } finally inf.end()
    if (!unfilter(raw, h, stride, bpp)) return None // corrupt filter byte
    // raw rows → ARGB exactly as getRGB renders each color type
    val argb = new Array[Int](w * h)
    var y = 0
    var o = 0
    colorType match {
      case 2 =>
        while (y < h) {
          var r = y * stride + 1
          var x = 0
          while (x < w) {
            argb(o) = 0xff000000 | ((raw(r) & 0xff) << 16) |
              ((raw(r + 1) & 0xff) << 8) | (raw(r + 2) & 0xff)
            r += 3; o += 1; x += 1
          }
          y += 1
        }
      // no colorType-0 arm: grayscale already returned None at the bpp
      // match above (an identity (v,v,v) conversion would diverge from
      // ImageIO's linear-gray→sRGB getRGB), so only 2 and 6 reach here
      case _ => // 6
        while (y < h) {
          var r = y * stride + 1
          var x = 0
          while (x < w) {
            argb(o) = ((raw(r + 3) & 0xff) << 24) | ((raw(r) & 0xff) << 16) |
              ((raw(r + 1) & 0xff) << 8) | (raw(r + 2) & 0xff)
            r += 4; o += 1; x += 1
          }
          y += 1
        }
    }
    Some(new Raster(w, h, argb))
  }

  private def crcOk(buf: Array[Byte], off: Int, len: Int, expect: Int): Boolean = {
    val crc = new CRC32()
    crc.update(buf, off, len)
    crc.getValue.toInt == expect
  }

  /** In-place PNG unfilter (spec filters 0–4) over `h` rows of
    * `stride = 1 + w·bpp` bytes each; after this the filter bytes are
    * dead and each row's pixel bytes start at `y·stride + 1`. False on
    * an out-of-spec filter byte — corrupt input that must quarantine
    * exactly as the (also-rejecting) ImageIO path would.
    */
  private def unfilter(raw: Array[Byte], h: Int, stride: Int, bpp: Int): Boolean = {
    var y = 0
    while (y < h) {
      val rs = y * stride
      val ps = rs - stride // previous row start (same offsets)
      val f = raw(rs) & 0xff
      var i = 1
      f match {
        case 0 => // None
        case 1 => // Sub
          i = 1 + bpp
          while (i < stride) {
            raw(rs + i) = (raw(rs + i) + raw(rs + i - bpp)).toByte
            i += 1
          }
        case 2 => // Up
          if (y > 0) while (i < stride) {
            raw(rs + i) = (raw(rs + i) + raw(ps + i)).toByte
            i += 1
          }
        case 3 => // Average
          while (i < stride) {
            val a = if (i > bpp) raw(rs + i - bpp) & 0xff else 0
            val b = if (y > 0) raw(ps + i) & 0xff else 0
            raw(rs + i) = (raw(rs + i) + ((a + b) >> 1)).toByte
            i += 1
          }
        case 4 => // Paeth
          while (i < stride) {
            val a = if (i > bpp) raw(rs + i - bpp) & 0xff else 0
            val b = if (y > 0) raw(ps + i) & 0xff else 0
            val c = if (i > bpp && y > 0) raw(ps + i - bpp) & 0xff else 0
            val pp = a + b - c
            val pa = math.abs(pp - a)
            val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            raw(rs + i) = (raw(rs + i) + pred).toByte
            i += 1
          }
        case _ => return false // invalid filter byte: corrupt input
      }
      y += 1
    }
    true
  }

  // ---- BMP ----

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** 24-bit uncompressed BI_RGB with a BITMAPINFOHEADER-or-later header
    * — exactly what the JDK's BMP writer emits for TYPE_INT_RGB and the
    * overwhelmingly common layout in the wild. Anything else (palette,
    * 16/32-bit, RLE, OS/2 core headers) → None → ImageIO.
    */
  private def decodeBmp(buf: Array[Byte], off: Int, len: Int): Option[Raster] = {
    val end = off + len
    val dataOffset = le32(buf, off + 10)
    val hdrSize = le32(buf, off + 14)
    if (hdrSize < 40 || off + 14 + hdrSize > end) return None
    val w = le32(buf, off + 18)
    val hRaw = le32(buf, off + 22)
    val topDown = hRaw < 0
    val h = if (topDown) -hRaw else hRaw
    val bitCount = le16(buf, off + 28)
    val compression = le32(buf, off + 30)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
    if (bitCount != 24 || compression != 0) return None
    val stride = ((w * 3 + 3) / 4) * 4
    val base = off + dataOffset
    if (dataOffset < 14 + hdrSize || base + stride.toLong * h > end) return None
    val argb = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var s = base + srcRow * stride
      var o = y * w
      var x = 0
      while (x < w) {
        argb(o) = 0xff000000 | ((buf(s + 2) & 0xff) << 16) |
          ((buf(s + 1) & 0xff) << 8) | (buf(s) & 0xff)
        s += 3; o += 1; x += 1
      }
      y += 1
    }
    Some(new Raster(w, h, argb))
  }
}
