package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IterCache

/** JVM-level contract of the bounded edge-cache registry: hit identity,
  * LRU eviction order, evict-before-build, and the correctness-safety
  * property eviction relies on (an unpersisted frame still computes).
  */
class IterCacheSpec extends AnyFunSuite with SparkTestBase {

  private def frame(n: Int) =
    spark.range(n).select(col("id").as("u"), (col("id") * 2).as("v")).persist()

  test("getOrBuild: second call is a hit — same DataFrame, no rebuild") {
    var builds = 0
    def build() = { builds += 1; frame(10) }
    val key = s"spec-hit-${System.nanoTime()}"
    val a = IterCache.getOrBuild(key)(build())
    val b = IterCache.getOrBuild(key)(build())
    assert(builds === 1)
    assert(a eq b)
    assert(a.storageLevel !== StorageLevel.NONE)
  }

  test("LRU eviction: oldest unpersisted past the cap; results stay correct") {
    val tag = System.nanoTime()
    // fill well past the cap (3) so the earliest entries must evict
    val frames = (0 until 6).map { i =>
      i -> IterCache.getOrBuild(s"spec-lru-$tag-$i")(frame(5 + i))
    }.toMap
    // the earliest entries are unpersisted...
    assert(frames(0).storageLevel === StorageLevel.NONE)
    assert(frames(1).storageLevel === StorageLevel.NONE)
    // ...the latest are live...
    assert(frames(5).storageLevel !== StorageLevel.NONE)
    // ...and an evicted frame still computes (the safety property the
    // tight cap relies on: cache eviction can never break a consumer)
    assert(frames(0).count() === 5L)
    // a re-request after eviction rebuilds rather than returning a
    // stale registry entry
    var rebuilt = false
    val again = IterCache.getOrBuild(s"spec-lru-$tag-0") {
      rebuilt = true; frame(5)
    }
    assert(rebuilt)
    assert(again.count() === 5L)
  }

  test("cross-volume flush: building for one dir evicts other dirs' entries") {
    val tag = System.nanoTime()
    // distinct sizes: Spark's cache is PLAN-keyed, so identical frames
    // would share one storage entry and alias the assertions
    val a = IterCache.getOrBuild(s"spec-xv-$tag:/vol/A")(frame(40))
    val a2 = IterCache.getOrBuild(s"spec-xv2-$tag:/vol/A")(frame(41))
    assert(a.storageLevel !== StorageLevel.NONE)
    // a build for a DIFFERENT volume must flush both /vol/A entries
    // (their sizes are incomparable with the new volume's)
    val b = IterCache.getOrBuild(s"spec-xv-$tag:/vol/B")(frame(42))
    assert(a.storageLevel === StorageLevel.NONE)
    assert(a2.storageLevel === StorageLevel.NONE)
    assert(b.storageLevel !== StorageLevel.NONE)
    // same volume does NOT flush
    val b2 = IterCache.getOrBuild(s"spec-xv2-$tag:/vol/B")(frame(43))
    assert(b.storageLevel !== StorageLevel.NONE)
    assert(b2.storageLevel !== StorageLevel.NONE)
  }

  test("access refreshes recency: a re-read entry survives later inserts") {
    val tag = System.nanoTime()
    // distinct sizes — Spark's plan-keyed cache would alias equal frames
    (0 until 3).foreach(i => IterCache.getOrBuild(s"spec-ref-$tag-$i")(frame(30 + i)))
    // touch entry 0 so entry 1 becomes the LRU
    val first = IterCache.getOrBuild(s"spec-ref-$tag-0")(fail("must be a hit"))
    IterCache.getOrBuild(s"spec-ref-$tag-3")(frame(33))
    assert(first.storageLevel !== StorageLevel.NONE,
      "recently-read entry must not be the eviction victim")
  }
}
