package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingQueries
import graft.operators.Multimodal

/** The streaming decode lane's contract: the replay is genuinely
  * multi-batch, and its append output equals the batch twin
  * row-for-row (statelessness = batching independence).
  */
class StreamMmDecodeSpec extends AnyFunSuite with SparkTestBase {

  test("stream_mm_decode: multi-batch replay, output equals the batch twin") {
    StreamingQueries.captureProgress = true
    try {
      val streamed = StreamingQueries.streamMmDecode(spark, sf0001).collect()
      val batches = StreamingQueries.lastRunProgress
      assert(batches.count(_.rowsProcessed > 0) === 4,
        s"expected 4 data micro-batches, saw ${batches.map(_.rowsProcessed)}")
      val batch = Multimodal.mmDecodeMixed(spark, sf0001).collect()
      assert(streamed.length === batch.length)
      streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
    } finally StreamingQueries.captureProgress = false
  }
}
