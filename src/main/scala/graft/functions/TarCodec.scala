package graft.functions

import java.nio.charset.StandardCharsets.US_ASCII

/** POSIX ustar tar codec — the container the WebDataset training-shard
  * layout rides in (samples are files named `<key>.<ext>`, stored
  * CONTIGUOUSLY so a sequential reader reassembles each sample without
  * an index). Both sides are hand-written (the JDK ships no tar): the
  * writer emits ustar headers with real octal fields and checksums;
  * the reader re-parses octal sizes, VERIFIES the header checksum (sum
  * of header bytes with the chksum field read as spaces), walks the
  * 512-byte block grammar, and quarantines malformed headers. The
  * codec spec pins the byte layout (field offsets, octal forms,
  * padding, the two-zero-block terminator) so writer and reader cannot
  * drift in lockstep unnoticed.
  */
object TarCodec {

  final case class TarEntry(name: String, data: Array[Byte])

  private val Block = 512

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL-terminated (the POSIX form)
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes(US_ASCII)
  }

  /** Unsigned-byte sum with the chksum field (148..155) as spaces. */
  private def checksum(h: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < Block) {
      s += (if (i >= 148 && i < 156) 32 else h(i) & 0xff)
      i += 1
    }
    s
  }

  /** ustar writer: regular files only, mtime pinned to 0 (the corpus
    * carries no wall-clock — the repo-wide determinism rule).
    */
  def tarWrap(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      require(name.getBytes(US_ASCII).length <= 100, s"name too long: $name")
      val h = new Array[Byte](Block)
      val nb = name.getBytes(US_ASCII)
      System.arraycopy(nb, 0, h, 0, nb.length)
      System.arraycopy(octal(420L, 8), 0, h, 100, 8)   // mode 0644
      System.arraycopy(octal(0L, 8), 0, h, 108, 8)     // uid
      System.arraycopy(octal(0L, 8), 0, h, 116, 8)     // gid
      System.arraycopy(octal(data.length.toLong, 12), 0, h, 124, 12)
      System.arraycopy(octal(0L, 12), 0, h, 136, 12)   // mtime
      h(156) = '0'                                     // typeflag: regular
      System.arraycopy("ustar\u000000".getBytes(US_ASCII), 0, h, 257, 8)
      // chksum: 6 octal digits, NUL, space
      val c = checksum(h)
      val cs = java.lang.Long.toOctalString(c)
      val cp = "0" * (6 - cs.length) + cs
      System.arraycopy((cp + "\u0000 ").getBytes(US_ASCII), 0, h, 148, 8)
      out.write(h, 0, Block)
      out.write(data, 0, data.length)
      val pad = (Block - data.length % Block) % Block
      if (pad > 0) out.write(new Array[Byte](pad), 0, pad)
    }
    out.write(new Array[Byte](2 * Block), 0, 2 * Block) // terminator
    out.toByteArray
  }

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = off
    val end = off + Block
    while (i < end) {
      if (b(i) != 0) return false
      i += 1
    }
    true
  }

  /** Octal field parse: leading spaces/zeros, digits, terminated by
    * NUL or space (both appear in the wild).
    */
  private def parseOctal(b: Array[Byte], off: Int,
      len: Int): Either[String, Long] = {
    var i = off
    val end = off + len
    while (i < end && b(i) == ' ') i += 1
    var v = 0L
    var seen = false
    while (i < end && b(i) != 0 && b(i) != ' ') {
      val c = b(i)
      if (c < '0' || c > '7') return Left("non-octal digit in size field")
      v = v * 8 + (c - '0')
      if (v < 0) return Left("octal field overflow")
      seen = true
      i += 1
    }
    if (!seen) Left("empty octal field") else Right(v)
  }

  /** Walk every entry, verifying header checksums and the block
    * grammar. Left on the first malformed header — like gzip members,
    * later entries are unreachable past a corrupt size field.
    */
  def tarEntries(b: Array[Byte]): Either[String, Vector[TarEntry]] = {
    val acc = Vector.newBuilder[TarEntry]
    var p = 0
    while (p + Block <= b.length) {
      if (isZeroBlock(b, p)) {
        if (p + 2 * Block > b.length || !isZeroBlock(b, p + Block))
          return Left("single zero block — truncated terminator")
        return Right(acc.result())
      }
      val magic = new String(b, p + 257, 5, US_ASCII)
      if (magic != "ustar") return Left(s"bad tar magic '$magic'")
      val stored = parseOctal(b, p + 148, 8) match {
        case Left(e) => return Left(s"chksum: $e")
        case Right(v) => v
      }
      val h = java.util.Arrays.copyOfRange(b, p, p + Block)
      if (checksum(h) != stored) return Left("tar header checksum mismatch")
      val size = parseOctal(b, p + 124, 12) match {
        case Left(e) => return Left(e)
        case Right(v) =>
          if (v > Int.MaxValue - 2L * Block) return Left("entry size overflow")
          v.toInt
      }
      var nEnd = p
      while (nEnd < p + 100 && b(nEnd) != 0) nEnd += 1
      val name = new String(b, p, nEnd - p, US_ASCII)
      val dataStart = p + Block
      if (dataStart.toLong + size > b.length) // Long: hostile size fields
        return Left("entry overruns archive")
      // regular files only; others skipped. POSIX ustar: typeflag NUL
      // is the pre-ustar spelling of "regular file" and external
      // writers still emit it ([[tarWrap]] always writes '0', so only
      // foreign archives exercise the second arm)
      if (b(p + 156) == '0' || b(p + 156) == 0)
        acc += TarEntry(name,
          java.util.Arrays.copyOfRange(b, dataStart, dataStart + size))
      p = dataStart + size + (Block - size % Block) % Block
    }
    Left("archive ended without terminator blocks")
  }
}
