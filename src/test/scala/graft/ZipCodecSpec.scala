package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZipCodec
import graft.operators.Pipeline9

/** Contract of the ZIP random-access stack: round trips, the JDK's own
  * ZipInputStream as an independent reader of our archives, checksum
  * and directory enforcement, the random-access guarantee (corrupting
  * an UNSAMPLED entry's bytes must not affect sampled reads — the pin
  * that separates this container from the sequential ones), and the
  * registered lane's driver recompute.
  */
class ZipCodecSpec extends AnyFunSuite with SparkTestBase {

  private def bytes(n: Int, f: Int => Int): Array[Byte] =
    Array.tabulate(n)(i => f(i).toByte)

  test("zipWrap -> centralDirectory/readEntry round-trips") {
    val entries = Seq(
      "a.txt" -> bytes(0, identity),
      "b.txt" -> bytes(1000, i => (i / 9) % 256),
      "c.bin" -> bytes(3001, i => ((i * 2654435761L >>> 5) % 256).toInt))
    val zip = ZipCodec.zipWrap(entries)
    val cd = ZipCodec.centralDirectory(zip)
      .fold(e => fail(s"cd failed: $e"), identity)
    assert(cd.map(_.name) === entries.map(_._1))
    cd.zip(entries).foreach { case (e, (_, d)) =>
      val got = ZipCodec.readEntry(zip, e)
        .fold(err => fail(s"read ${e.name}: $err"), identity)
      assert(got.toSeq === d.toSeq, s"data mismatch in ${e.name}")
      assert(e.usize === d.length)
    }
  }

  test("the JDK's ZipInputStream reads our archives") {
    val entries = Seq("x.txt" -> bytes(500, i => (i * 3) % 256),
      "y.txt" -> bytes(700, i => i % 251))
    val zip = ZipCodec.zipWrap(entries)
    val in = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(zip))
    entries.foreach { case (name, data) =>
      val ze = in.getNextEntry
      assert(ze != null && ze.getName === name)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      assert(out.toByteArray.toSeq === data.toSeq, s"JDK read of $name")
    }
    assert(in.getNextEntry === null)
  }

  test("random access: corrupting an unsampled payload is invisible") {
    val entries = (0 until 6).map(i =>
      f"doc$i%08d.txt" -> bytes(400 + i, j => (j * (i + 3)) % 256))
    val zip = ZipCodec.zipWrap(entries)
    val cd = ZipCodec.centralDirectory(zip)
      .fold(e => fail(e), identity)
    // corrupt entry 1's compressed payload in place (NOT its directory
    // record): sampled reads (0, 2, 4) must not notice — the pin that
    // tar / multi-member gzip cannot pass, since their boundaries are
    // only discoverable by walking through entry 1's bytes
    val c = zip.clone()
    val e1 = cd(1)
    val dataOff = e1.offset + 30 + e1.name.length
    (dataOff until dataOff + e1.csize).foreach(i => c(i) = 0x55)
    Seq(0, 2, 4).foreach { i =>
      val got = ZipCodec.readEntry(c, cd(i))
        .fold(err => fail(s"sampled read $i failed: $err"), identity)
      assert(got.toSeq === entries(i)._2.toSeq)
    }
    // and the corrupted entry itself quarantines loudly when read
    assert(ZipCodec.readEntry(c, e1).isLeft)
  }

  test("corruption quarantines: EOCD, directory, CRC, name mismatch") {
    val zip = ZipCodec.zipWrap(Seq("a.txt" -> bytes(300, _ => 7)))
    assert(ZipCodec.centralDirectory(bytes(10, _ => 0)).isLeft, "no EOCD")
    val cd = ZipCodec.centralDirectory(zip).fold(e => fail(e), identity)
    // flip a payload byte -> CRC mismatch on read
    val c = zip.clone(); c(35) = (c(35) ^ 0x40).toByte
    assert(ZipCodec.readEntry(c, cd(0)).isLeft, "payload flip")
    // a directory record pointing at the wrong offset -> name mismatch
    assert(ZipCodec.readEntry(zip, cd(0).copy(offset = 1)).isLeft,
      "bad local offset")
    // truncated central directory
    val eocdAt = zip.length - 22
    val cut = java.util.Arrays.copyOfRange(zip, 0, eocdAt - 10) ++
      java.util.Arrays.copyOfRange(zip, eocdAt, zip.length)
    assert(ZipCodec.centralDirectory(cut).isLeft)
  }

  test("zero-length member round-trips Right(empty); the lane skips it") {
    // the codec reports the empty member faithfully; pipelineZipSampled
    // then SKIPS it (no first/last byte to report) instead of indexing
    // data(0) — its oracle mirrors with length(text) > 0
    val zip = ZipCodec.zipWrap(Seq("empty.txt" -> Array.emptyByteArray,
      "full.txt" -> "abc".getBytes("US-ASCII")))
    val cd = ZipCodec.centralDirectory(zip)
      .fold(e => fail(s"directory: $e"), identity)
    assert(cd.map(_.name) === Vector("empty.txt", "full.txt"))
    val empty = ZipCodec.readEntry(zip, cd(0))
      .fold(e => fail(s"empty member: $e"), identity)
    assert(empty.isEmpty)
  }

  test("pipeline_zip_sampled: driver-side recompute at sf0.001") {
    import scala.jdk.CollectionConverters._
    val got = Pipeline9.pipelineZipSampled(spark, sf0001)
      .collectAsList().asScala.toVector
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) -> r.getString(1)).toVector.sortBy(_._1)
    val expect = docs.groupBy(_._1 % Pipeline9.ZipShards).toVector
      .flatMap { case (sid, ds) =>
        ds.sortBy(_._1).zipWithIndex.collect {
          case ((id, t), i) if i % 2 == 0 =>
            (sid, id, ds.length.toLong, t.length.toLong,
              t.head.toLong, t.last.toLong)
        }
      }.sortBy(_._2)
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))) === expect)
    assert(expect.length < docs.length, "sampling did not sample")
  }
}
