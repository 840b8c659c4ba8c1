package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** The FastImage direct PNG/BMP decoders exist to bypass ImageIO's
  * per-call machinery on the media hot path; their contract is BIT-EQUAL
  * pixels (the `BufferedImage.getRGB` view) wherever they accept an
  * input, and None (→ ImageIO fallback) everywhere else. These
  * properties pin that contract against ImageIO itself as ground truth:
  * over the corpus encoders (ImageIO-written PNG/BMP stills, the tiny
  * stored-block PNG frames), over hand-built PNGs exercising every
  * filter type 0–4 and the alpha color type, and over corrupt payloads
  * which must keep quarantining (None), never decode to garbage.
  */
object FastImageProperties extends Properties("graft.fastimage") {

  private def imageIoPixels(blob: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      Some((w, h, img.getRGB(0, 0, w, h, null, 0, w)))
    }
  }

  private def agreesWithImageIo(blob: Array[Byte]): Prop = {
    val fast = FastImage.decode(blob)
    val ref = imageIoPixels(blob)
    (fast, ref) match {
      case (Some(f), Some((w, h, px))) =>
        Prop(f.w == w && f.h == h &&
          java.util.Arrays.equals(f.argb, px)) :| "pixel mismatch"
      case (None, _) =>
        Prop.falsified :| "fast path declined a corpus-encoder blob"
      case (Some(_), None) =>
        Prop.falsified :| "fast path accepted what ImageIO rejects"
    }
  }

  private val seeds = Gen.choose(Long.MinValue, Long.MaxValue)
  private val dims = Gen.choose(4, 19)

  property("PNG stills (ImageIO-written) decode bit-equal") =
    Prop.forAll(seeds, dims, dims) { (seed, w, h) =>
      agreesWithImageIo(Multimodal.encodeImage(seed, w, h, "png"))
    }

  property("BMP stills (ImageIO-written) decode bit-equal") =
    Prop.forAll(seeds, dims, dims) { (seed, w, h) =>
      agreesWithImageIo(Multimodal.encodeImage(seed, w, h, "bmp"))
    }

  property("tiny stored-block PNG frames decode bit-equal") =
    Prop.forAll(seeds, Gen.oneOf((4, 3), (8, 6))) { case (seed, (w, h)) =>
      agreesWithImageIo(Multimodal.encodeTinyPng(seed, w, h))
    }

  property("mp4 frame slices decode bit-equal from their slot ranges") =
    Prop.forAll(seeds, Gen.choose(1, 5)) { (seed, nFrames) =>
      val blob = Multimodal.encodeMp4(seed, nFrames)
      Multimodal.demuxMp4(blob) match {
        case None => Prop.falsified :| "demux failed on own encoder"
        case Some((slot, n, mdat)) =>
          Prop.all((0 until n).map { f =>
            val slice = java.util.Arrays.copyOfRange(mdat, f * slot, (f + 1) * slot)
            val fast = FastImage.decode(mdat, f * slot, slot)
            val ref = imageIoPixels(slice)
            (fast, ref) match {
              case (Some(a), Some((w, h, px))) =>
                Prop(a.w == w && a.h == h &&
                  java.util.Arrays.equals(a.argb, px))
              case _ => Prop.falsified :| s"frame $f decode disagreement"
            }
          }: _*)
      }
    }

  /** Reference PNG builder with an EXPLICIT filter byte per row (the
    * encode inverse of the decoder's unfilter), real deflate — drives
    * every filter branch 0–4 with ImageIO as ground truth.
    */
  private def pngWithFilters(seed: Long, w: Int, h: Int, bpp: Int,
      filterOf: Int => Int): Array[Byte] = {
    val stride = 1 + w * bpp
    // raw (unfiltered) pixel bytes from a deterministic chain
    val plain = new Array[Byte](h * stride)
    var s = seed
    for (y <- 0 until h) {
      plain(y * stride) = 0
      for (i <- 1 until stride) {
        s += 0x9e3779b97f4a7c15L
        plain(y * stride + i) = (Multimodal.mix64(s) & 0xff).toByte
      }
    }
    // apply the chosen filter per row (operating on the plain bytes)
    val filt = new Array[Byte](h * stride)
    def pl(y: Int, i: Int): Int =
      if (i < 1) 0 else if (y < 0) 0 else plain(y * stride + i) & 0xff
    for (y <- 0 until h) {
      val f = filterOf(y)
      filt(y * stride) = f.toByte
      for (i <- 1 until stride) {
        val x = pl(y, i)
        val a = if (i > bpp) pl(y, i - bpp) else 0
        val b = pl(y - 1, i)
        val c = if (i > bpp) pl(y - 1, i - bpp) else 0
        val out = f match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - ((a + b) >> 1)
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            x - pred
        }
        filt(y * stride + i) = out.toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filt); defl.finish()
    val zbuf = new Array[Byte](filt.length + 64)
    val zlen = defl.deflate(zbuf)
    defl.end()
    val idat = java.util.Arrays.copyOf(zbuf, zlen)
    val colorType = if (bpp == 3) 2 else 6
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(tag: String, data: Array[Byte]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      bos.write(bb)
      bos.write(tag.getBytes("US-ASCII"))
      bos.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tag.getBytes("US-ASCII")); crc.update(data)
      bos.write(java.nio.ByteBuffer.allocate(4)
        .putInt(crc.getValue.toInt).array())
    }
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  property("all five PNG filter types decode bit-equal (RGB + RGBA)") =
    Prop.forAll(seeds, Gen.choose(5, 24), Gen.choose(5, 24),
      Gen.oneOf(3, 4)) { (seed, w, h, bpp) =>
      // cycle filters so every row boundary case (y = 0 included) is hit
      agreesWithImageIo(pngWithFilters(seed, w, h, bpp, y => (y + seed.toInt & 0x7fffffff) % 5))
    }

  property("corrupt and truncated payloads stay quarantined (None)") = {
    val okPng = Multimodal.encodeImage(7L, 9, 9, "png")
    val crcFlipped = okPng.clone()
    crcFlipped(crcFlipped.length - 5) = (crcFlipped(crcFlipped.length - 5) ^ 0x01).toByte
    Prop.all(
      Prop(FastImage.decode(Array.fill[Byte](64)(7)).isEmpty) :| "junk",
      Prop(FastImage.decode(java.util.Arrays.copyOf(okPng, okPng.length / 2)).isEmpty) :| "truncated",
      Prop(FastImage.decode(Array.emptyByteArray).isEmpty) :| "empty",
      Prop(FastImage.decode(crcFlipped).isEmpty) :| "IEND crc flipped")
  }

  property("decode-path results are unchanged: dHashOf + embed folds") =
    Prop.forAll(seeds, dims, dims, Gen.oneOf("png", "bmp")) { (seed, w, h, fmt) =>
      val blob = Multimodal.encodeImage(seed, w, h, fmt)
      // ImageIO-only reference for the same blob
      val ref = imageIoPixels(blob).map { case (rw, rh, px) =>
        val sums = new Array[Long](16)
        var i = 0
        while (i < px.length) {
          val rgb = px(i)
          sums(i % 16) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          i += 1
        }
        sums.map(s => (s / 765.0).toFloat)
      }
      val got = Multimodal.decodeAndEmbedImage(blob, 16)
      Prop((got, ref) match {
        case (Some(a), Some(b)) => java.util.Arrays.equals(a, b)
        case _ => false
      })
    }
}
