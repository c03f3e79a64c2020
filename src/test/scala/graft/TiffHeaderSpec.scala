package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TiffHeader

/** The TIFF header walk's contract: both byte orders parse to the same
  * logical values, byte-level pins prove the orders genuinely differ
  * on disk, malformed streams quarantine, and the operator matches a
  * driver-side formula replay.
  */
class TiffHeaderSpec extends AnyFunSuite with SparkTestBase {

  test("round trip: identical logical values under both byte orders") {
    val payload = Array.tabulate(32)(_.toByte)
    for (le <- Seq(true, false)) {
      val t = TiffHeader.tiffInfo(
        TiffHeader.tiffWrap(le, 640, 480, 8, payload))
        .fold(e => fail(s"decode failed: $e"), identity)
      assert(t.byteOrder === (if (le) "II" else "MM"))
      assert(t.width === 640 && t.height === 480)
      assert(t.bits === 8 && t.compression === 1 && t.nEntries === 4)
    }
  }

  test("byte-level pins: the two orders genuinely differ on disk") {
    val ii = TiffHeader.tiffWrap(littleEndian = true, 640, 480, 8, Array[Byte]())
    val mm = TiffHeader.tiffWrap(littleEndian = false, 640, 480, 8, Array[Byte]())
    assert(ii(0) === 'I'.toByte && ii(1) === 'I'.toByte)
    assert(mm(0) === 'M'.toByte && mm(1) === 'M'.toByte)
    // magic 42: LE stores 2a 00, BE 00 2a
    assert((ii(2) & 0xff) === 42 && (ii(3) & 0xff) === 0)
    assert((mm(2) & 0xff) === 0 && (mm(3) & 0xff) === 42)
    // width LONG 640 = 0x280 in the first IFD entry's value field
    // (IFD at 8: count 2 bytes, entry 0 value at 8 + 2 + 8)
    val v = 8 + 2 + 8
    assert((ii(v) & 0xff) === 0x80 && (ii(v + 1) & 0xff) === 0x02)
    assert((mm(v + 2) & 0xff) === 0x02 && (mm(v + 3) & 0xff) === 0x80)
    // a hard-coded-LE parse of the MM stream must NOT succeed with
    // swapped values — it must fail the BOM gate outright
    assert(TiffHeader.tiffInfo(mm).exists(_.width === 640))
  }

  test("quarantine: malformed streams return Left") {
    val good = TiffHeader.tiffWrap(littleEndian = true, 64, 48, 8,
      Array.tabulate(16)(_.toByte))
    assert(TiffHeader.tiffInfo(null).isLeft)
    assert(TiffHeader.tiffInfo(Array[Byte](1, 2, 3)).isLeft)
    val bom = good.clone(); bom(0) = 'X'
    assert(TiffHeader.tiffInfo(bom).isLeft)
    val magic = good.clone(); magic(2) = 43
    assert(TiffHeader.tiffInfo(magic).isLeft)
    // IFD offset past the end
    val off = good.clone(); off(4) = -1
    assert(TiffHeader.tiffInfo(off).isLeft)
    // entry count overrunning the payload
    val cnt = good.clone(); cnt(8) = -1
    assert(TiffHeader.tiffInfo(cnt).isLeft)
    // tags must ascend: swap the first two entries
    val swapped = good.clone()
    val e0 = 8 + 2
    val tmp = swapped.slice(e0, e0 + 12)
    System.arraycopy(swapped, e0 + 12, swapped, e0, 12)
    System.arraycopy(tmp, 0, swapped, e0 + 12, 12)
    assert(TiffHeader.tiffInfo(swapped).isLeft)
  }

  test("mm_decode_tiff equals the formula replay at sf0.001") {
    val got = operators.Multimodal2.mmDecodeTiff(spark, sf0001).collect()
    val lens = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "octet_length(cast(text as binary)) as n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      val n = lens(id)
      assert(r.getString(1) === (if (id % 2 == 0) "II" else "MM"))
      assert(r.getLong(2) === (16 + n % 509).toLong)
      assert(r.getLong(3) === (16 + (n * 13) % 257).toLong)
      assert(r.getLong(4) === (8 + (id % 2) * 8))
      assert(r.getLong(5) === 1L && r.getLong(6) === 4L)
    }
    // both orders genuinely present in the corpus
    assert(got.map(_.getString(1)).toSet === Set("II", "MM"))
  }
}
