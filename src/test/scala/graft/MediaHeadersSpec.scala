package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MediaHeaders
import graft.functions.MediaHeaders.{AudioInfo, ImageInfo, Unsupported}

/** Pins the header-level media decoder against the FORMAT SPECS, not
  * just our own writers: one BMP fixture is byte-for-byte hand-encoded
  * from the BITMAPINFOHEADER layout, and the chunk-walk test splices a
  * foreign LIST chunk the way real recorders do. Pure byte functions —
  * no SparkSession, runs in milliseconds.
  */
class MediaHeadersSpec extends AnyFunSuite {

  test("hand-encoded 2x3 24-bit BMP parses to its spec values") {
    // BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40) + pixel array.
    // rowSize = ceil(2*3/4)*4 = 8 bytes, 3 rows -> 24 pixel bytes,
    // fileSize = 54 + 24 = 78. Little-endian throughout.
    val bb = java.nio.ByteBuffer.allocate(78)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(78).putInt(0).putInt(54)      // bfSize, reserved, bfOffBits
    bb.putInt(40).putInt(2).putInt(3)       // biSize, width=2, height=3
    bb.putShort(1).putShort(24)             // planes, bpp
    bb.putInt(0).putInt(24)                 // BI_RGB, biSizeImage
    bb.putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until 24).foreach(i => bb.put(i.toByte))
    assert(MediaHeaders.probe(bb.array()) === ImageInfo("bmp", 2, 3, 24))
  }

  test("top-down BMP (negative biHeight) yields the height magnitude") {
    val img = MediaHeaders.bmpWrap(Array[Byte](1, 2, 3), 7, 5)
    // negate biHeight in place: 5 -> -5 at offset 22, little-endian
    val bb = java.nio.ByteBuffer.wrap(img)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -5)
    assert(MediaHeaders.probe(img) === ImageInfo("bmp", 7, 5, 3))
  }

  test("BI_RGB with biSizeImage=0 falls back to fileSize - offset") {
    val img = MediaHeaders.bmpWrap(Array.fill[Byte](10)(9), 4, 4)
    java.nio.ByteBuffer.wrap(img).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(34, 0) // zero out biSizeImage, as BI_RGB writers may
    assert(MediaHeaders.probe(img) === ImageInfo("bmp", 4, 4, 10))
  }

  test("bmpWrap/probe round trip at the operator's dimension formulas") {
    val payload = "the quick brown fox".getBytes("UTF-8")
    val n = payload.length
    val img = MediaHeaders.bmpWrap(payload, 64 + n % 577, 64 + (n * 31) % 353)
    assert(MediaHeaders.probe(img) ===
      ImageInfo("bmp", 64 + n % 577, 64 + (n * 31) % 353, n))
  }

  test("wavWrap/probe round trip: sample geometry and frame count") {
    // 16 bytes of 16-bit stereo = 16 / (2ch * 2B) = 4 frames
    val wav = MediaHeaders.wavWrap(Array.fill[Byte](16)(3), 44100, 2, 16)
    assert(MediaHeaders.probe(wav) === AudioInfo("wav", 44100, 2, 16, 4L))
  }

  test("chunk walk skips a foreign LIST chunk before fmt/data") {
    val base = MediaHeaders.wavWrap(Array.fill[Byte](8)(1), 8000, 1, 8)
    // splice a 6-byte LIST chunk right after the 12-byte RIFF/WAVE
    // preamble (odd size exercises the even-padding rule too)
    val foreign = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ Array.fill[Byte](5)(7) ++ Array[Byte](0)
    val spliced = base.take(12) ++ foreign ++ base.drop(12)
    // patch the RIFF size for the inserted bytes (spec-consistent file)
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, java.nio.ByteBuffer.wrap(spliced)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(4) + foreign.length)
    assert(MediaHeaders.probe(spliced) === AudioInfo("wav", 8000, 1, 8, 8L))
  }

  test("hand-encoded PNG parses IHDR geometry and sums IDAT lengths") {
    // magic(8) + IHDR(25) + two IDAT chunks (7 and 5 data bytes) + IEND,
    // all big-endian per the PNG spec
    val bb = java.nio.ByteBuffer.allocate(8 + 25 + (12 + 7) + (12 + 5) + 12)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte))
    bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
    bb.putInt(640).putInt(480)
    bb.put(8.toByte).put(2.toByte)          // depth 8, truecolor
    bb.put(0.toByte).put(0.toByte).put(0.toByte)
    bb.putInt(0)                            // CRC
    bb.putInt(7).put("IDAT".getBytes("US-ASCII"))
    (0 until 7).foreach(i => bb.put(i.toByte)); bb.putInt(0)
    bb.putInt(5).put("IDAT".getBytes("US-ASCII"))
    (0 until 5).foreach(i => bb.put(i.toByte)); bb.putInt(0)
    bb.putInt(0).put("IEND".getBytes("US-ASCII")); bb.putInt(0)
    assert(MediaHeaders.probe(bb.array()) === ImageInfo("png", 640, 480, 12))
  }

  test("pngWrap round-trips through the parser") {
    val png = MediaHeaders.pngWrap(Array.fill[Byte](100)(7), 132, 49)
    assert(MediaHeaders.probe(png) === ImageInfo("png", 132, 49, 100))
  }

  test("malformed PNGs quarantine, never throw") {
    // chunk length overruns the payload
    val good = MediaHeaders.pngWrap(Array.fill[Byte](10)(1), 5, 5)
    assert(MediaHeaders.probe(good.take(good.length - 20))
      .isInstanceOf[Unsupported])
    // magic only, no IHDR
    assert(MediaHeaders.probe(Array(0x89.toByte, 'P'.toByte, 'N'.toByte,
      'G'.toByte, 0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte,
      0, 0, 0, 0)).isInstanceOf[Unsupported])
  }

  test("gifWrap round-trips through the parser") {
    val gif = MediaHeaders.gifWrap(Array.fill[Byte](77)(3), 320, 200)
    assert(MediaHeaders.probe(gif) === ImageInfo("gif", 320, 200, 77))
    // LE uint16 dims: values past the int16 sign bit must read unsigned
    val wide = MediaHeaders.gifWrap(Array.fill[Byte](5)(1), 40000, 33000)
    assert(MediaHeaders.probe(wide) === ImageInfo("gif", 40000, 33000, 5))
    // hand-built GIF87a variant parses too
    val bb = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF87a".getBytes("US-ASCII"))
    bb.putShort(12.toShort).putShort(34.toShort)
    bb.put(0.toByte).put(0.toByte).put(0.toByte)
    assert(MediaHeaders.probe(bb.array()) === ImageInfo("gif", 12, 34, 0))
  }

  test("malformed GIFs quarantine, never throw") {
    // GIF magic, bogus version
    assert(MediaHeaders.probe("GIF99a0123456789".getBytes("US-ASCII"))
      .isInstanceOf[Unsupported])
    // truncated before the screen descriptor completes
    val gif = MediaHeaders.gifWrap(Array.fill[Byte](4)(1), 10, 10)
    assert(MediaHeaders.probe(gif.take(12)).isInstanceOf[Unsupported])
    // zero dims are implausible geometry
    assert(MediaHeaders.probe(MediaHeaders.gifWrap(Array.empty[Byte], 0, 5))
      .isInstanceOf[Unsupported])
  }

  test("jpegWrap round-trips through the marker walk at the operator formulas") {
    val payload = "the quick brown fox jumps over".getBytes("UTF-8")
    val n = payload.length
    val jpg = MediaHeaders.jpegWrap(payload,
      16 + n % 1021, 16 + (n * 7) % 739, n % 23)
    assert(MediaHeaders.probe(jpg) ===
      ImageInfo("jpeg", 16 + n % 1021, 16 + (n * 7) % 739, n))
    // zero-length comment (COM len=2) still walks: the SOF offset
    // contracts by the comment bytes and the walk must not care
    val jpg0 = MediaHeaders.jpegWrap(payload, 100, 50, 0)
    assert(MediaHeaders.probe(jpg0) === ImageInfo("jpeg", 100, 50, n))
    // empty entropy stream: EOI directly after SOS
    val empty = MediaHeaders.jpegWrap(Array.empty[Byte], 8, 8, 5)
    assert(MediaHeaders.probe(empty) === ImageInfo("jpeg", 8, 8, 0))
  }

  test("progressive SOF2 carries geometry like SOF0; DHT (C4) does not") {
    val jpg = MediaHeaders.jpegWrap(Array.fill[Byte](9)(1), 30, 20, 3)
    // rewrite the SOF0 marker byte to SOF2 (progressive) in place: the
    // SOF sits after SOI(2) + APP0(18) + COM(4+3) + DQT(69)
    val sofAt = 2 + 18 + 7 + 69
    assert((jpg(sofAt + 1) & 0xff) === 0xc0)
    jpg(sofAt + 1) = 0xc2.toByte
    assert(MediaHeaders.probe(jpg) === ImageInfo("jpeg", 30, 20, 9))
    // a DHT (0xC4) in the C-row is NOT a frame header: retagging the
    // SOF as DHT leaves no geometry, so SOS must quarantine the stream
    val noSof = MediaHeaders.jpegWrap(Array.fill[Byte](9)(1), 30, 20, 3)
    noSof(sofAt + 1) = 0xc4.toByte
    assert(MediaHeaders.probe(noSof).isInstanceOf[Unsupported])
  }

  test("malformed JPEGs quarantine, never throw") {
    val jpg = MediaHeaders.jpegWrap(Array.fill[Byte](40)(1), 25, 25, 7)
    // truncation mid-segment: the declared length overruns the payload
    assert(MediaHeaders.probe(jpg.take(15)).isInstanceOf[Unsupported])
    // marker sync lost: a non-FF byte where a marker must start
    val desynced = jpg.clone(); desynced(2) = 0x00.toByte
    assert(MediaHeaders.probe(desynced).isInstanceOf[Unsupported])
    // EOI immediately after SOI: no scan ever starts
    assert(MediaHeaders.probe(Array(0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)).isInstanceOf[Unsupported])
    // missing trailing EOI: dataBytes would be silently wrong, so the
    // stream must quarantine, not report a corrupted count
    assert(MediaHeaders.probe(jpg.dropRight(1)).isInstanceOf[Unsupported])
    assert(MediaHeaders.probe(jpg.dropRight(2)).isInstanceOf[Unsupported])
    // trailing garbage after EOI: same rule — the count is not the scan
    assert(MediaHeaders.probe(jpg ++ Array[Byte](0, 0, 0))
      .isInstanceOf[Unsupported])
  }

  test("bmpWrapRaster stores bottom-up padded rows; bmpRaster undoes them") {
    // 3x2 logical raster, content bytes 0..17 (row 0 = 0..8, row 1 = 9..17)
    val content = Array.tabulate[Byte](18)(_.toByte)
    val bmp = MediaHeaders.bmpWrapRaster(3, 2, content)
    // stride: 3*3=9 -> padded to 12, so 3 pad bytes of 0xAA per row
    assert(MediaHeaders.bmpStride(3) === 12)
    assert(bmp.length === 54 + 24)
    // storage row 0 (file offset 54) must be LOGICAL row 1 (bottom-up)
    assert(bmp.slice(54, 63).toSeq === (9 to 17).map(_.toByte))
    assert(bmp.slice(63, 66).toSeq === Seq.fill(3)(0xaa.toByte))
    assert(bmp.slice(66, 75).toSeq === (0 to 8).map(_.toByte))
    assert(bmp.slice(75, 78).toSeq === Seq.fill(3)(0xaa.toByte))
    // the parser walks it back into logical order
    val rst = MediaHeaders.bmpRaster(bmp).toOption.get
    assert(rst.width === 3 && rst.height === 2)
    assert(rst.content.toSeq === content.toSeq)
    // header-level probe agrees on the geometry
    assert(MediaHeaders.probe(bmp) ===
      ImageInfo("bmp", 3, 2, 24))
  }

  test("bmpRaster honors top-down (negative height) storage") {
    val content = Array.tabulate[Byte](18)(_.toByte)
    val bmp = MediaHeaders.bmpWrapRaster(3, 2, content)
    // flip biHeight to -2 and swap the two storage rows: same logical image
    val neg = bmp.clone()
    val bb = java.nio.ByteBuffer.wrap(neg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(22, -2)
    val row0 = bmp.slice(54, 66); val row1 = bmp.slice(66, 78)
    System.arraycopy(row1, 0, neg, 54, 12)
    System.arraycopy(row0, 0, neg, 66, 12)
    val rst = MediaHeaders.bmpRaster(neg).toOption.get
    assert(rst.content.toSeq === content.toSeq)
  }

  test("bmpRaster quarantines what content decode cannot honor") {
    val content = Array.tabulate[Byte](18)(_.toByte)
    val bmp = MediaHeaders.bmpWrapRaster(3, 2, content)
    // truncated pixel array
    assert(MediaHeaders.bmpRaster(bmp.take(bmp.length - 1)).isLeft)
    // 8-bit palette form: header-level probe would still read geometry,
    // content decode must refuse (no palette logic without a codec)
    val pal = bmp.clone()
    java.nio.ByteBuffer.wrap(pal).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(28, 8.toShort)
    assert(MediaHeaders.bmpRaster(pal).isLeft)
    // compressed form
    val rle = bmp.clone()
    java.nio.ByteBuffer.wrap(rle).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(30, 1)
    assert(MediaHeaders.bmpRaster(rle).isLeft)
    assert(MediaHeaders.bmpRaster(null).isLeft)
  }

  test("wavSamples parses LE int16 PCM — sign, order, and quarantine") {
    // hand-built samples covering both signs and the int16 extremes
    val vals = Array[Short](0, 1, -1, 1000, -1000, 32767, -32768, 255, -256)
    val pcm = new Array[Byte](vals.length * 2)
    vals.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val wav = MediaHeaders.wavWrap(pcm, 16000, 1, 16)
    val (rate, ch, s) = MediaHeaders.wavSamples(wav)
      .fold(e => fail(s"decode failed: $e"), identity)
    assert(rate === 16000 && ch === 1)
    assert(s.toSeq === vals.toSeq)
    // 8-bit PCM is outside the sample-decode subset (header probe still
    // reads it; content decode quarantines)
    val wav8 = MediaHeaders.wavWrap(Array[Byte](1, 2, 3, 4), 8000, 1, 8)
    assert(MediaHeaders.wavSamples(wav8).isLeft)
    assert(MediaHeaders.probe(wav8).isInstanceOf[AudioInfo])
    // truncated data chunk quarantines
    assert(MediaHeaders.wavSamples(wav.dropRight(3)).isLeft)
    assert(MediaHeaders.wavSamples(null).isLeft)
  }

  test("exifProbe: two nested endianness regimes, offsets vary per row") {
    import graft.operators.Multimodal2
    // both parities: the embedded TIFF flips byte order while the JPEG
    // framing stays big-endian
    Seq(0L, 1L).foreach { id =>
      val payload = Multimodal2.exifContainer(id,
        s"sample text $id for exif".getBytes("UTF-8"))
      val n = s"sample text $id for exif".getBytes("UTF-8").length
      val (tiff, w, h) = MediaHeaders.exifProbe(payload)
        .fold(e => fail(s"parity $id: $e"), identity)
      assert(w === 20 + n % 800 && h === 20 + (n * 3) % 600)
      val t = graft.functions.TiffHeader.tiffInfo(tiff)
        .fold(e => fail(s"tiff $id: $e"), identity)
      assert(t.byteOrder === (if (id % 2 == 0) "II" else "MM"))
      assert(t.width === 32 + id % 100 && t.height === 24 + id % 50)
      assert(t.bits === 8 + (id % 2) * 8)
    }
    // quarantine classes: no APP1 at all; only a non-Exif APP1
    val plain = MediaHeaders.jpegWrap("x".getBytes, 10, 10, 3)
    assert(MediaHeaders.exifProbe(plain).isLeft, "no APP1")
    val bad = Multimodal2.exifContainer(2L, "y".getBytes)
    bad(24) = 'X' // inside the 'Exif' tag of the spliced APP1
    assert(MediaHeaders.exifProbe(bad).isLeft, "wrong-tag APP1 skipped, no Exif left")
    // a NON-Exif APP1 (XMP, as real camera JPEGs carry) BEFORE the Exif
    // one is skipped and the walk continues to the real segment
    val withExif = Multimodal2.exifContainer(3L, "z".getBytes)
    val xmpBody = "http://ns.adobe.com/xap/1.0/ <x/>".getBytes("US-ASCII")
    val xmp = new Array[Byte](4 + xmpBody.length)
    xmp(0) = 0xff.toByte; xmp(1) = 0xe1.toByte
    val xl = 2 + xmpBody.length
    xmp(2) = (xl >>> 8).toByte; xmp(3) = xl.toByte
    System.arraycopy(xmpBody, 0, xmp, 4, xmpBody.length)
    val spliceAt = 20 // SOI (2) + APP0 (18), before the Exif APP1
    val both = new Array[Byte](withExif.length + xmp.length)
    System.arraycopy(withExif, 0, both, 0, spliceAt)
    System.arraycopy(xmp, 0, both, spliceAt, xmp.length)
    System.arraycopy(withExif, spliceAt, both, spliceAt + xmp.length,
      withExif.length - spliceAt)
    val viaXmp = MediaHeaders.exifProbe(both)
      .fold(e => fail(s"XMP-then-Exif should parse: $e"), identity)
    assert(graft.functions.TiffHeader.tiffInfo(viaXmp._1).isRight,
      "Exif TIFF after a skipped XMP APP1")
    // corrupting the TIFF order mark quarantines at the inner layer
    val badTiff = Multimodal2.exifContainer(2L, "y".getBytes)
    badTiff(30) = 'Q' // first byte of the embedded TIFF ('II'/'MM')
    val inner = MediaHeaders.exifProbe(badTiff)
    assert(inner.isRight && graft.functions.TiffHeader
      .tiffInfo(inner.toOption.get._1).isLeft, "inner quarantine")
  }

  test("poison payloads are data, not exceptions") {
    assert(MediaHeaders.probe(null).isInstanceOf[Unsupported])
    assert(MediaHeaders.probe(Array[Byte](1, 2, 3)).isInstanceOf[Unsupported])
    assert(MediaHeaders.probe("PK not a bmp or wav xxxxxx"
      .getBytes("US-ASCII")).isInstanceOf[Unsupported])
    // BMP magic but truncated before the DIB header completes
    assert(MediaHeaders.probe("BM0123456789012345678901234567890123456789"
      .getBytes("US-ASCII").take(40)).isInstanceOf[Unsupported])
    // WAV whose declared data chunk overruns the actual bytes
    val wav = MediaHeaders.wavWrap(Array.fill[Byte](8)(1), 8000, 1, 8)
    val truncated = wav.take(wav.length - 4)
    assert(MediaHeaders.probe(truncated).isInstanceOf[Unsupported])
    // fmt chunk truncated ONE byte short of its declared 16-byte body:
    // must quarantine via the strict content bound, not throw on the
    // bits-per-sample field read past the array end
    val fmtCut = wav.take(12 + 8 + 15)
    assert(MediaHeaders.probe(fmtCut).isInstanceOf[Unsupported])
  }
}
