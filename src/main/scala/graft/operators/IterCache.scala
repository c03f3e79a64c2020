package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded registry for the iterate-phase edge caches (pagerank /
  * k-hop / SSSP / components). The builders cache their
  * partitioned+sorted edge frames so every iteration's join reuses the
  * layout (see Analytics.coPurchaseEdges) — but Spark's CacheManager
  * holds cached relations by plan FOREVER, so a 230-query bench (or a
  * 100× probe running two volumes back-to-back) would accumulate
  * multi-GB resident entries that squeeze every later query: the
  * round-11 sweep measured q109_components 2.4× SLOWER at 100× purely
  * because q78's 100× edge cache (≈ 240M rows) stayed resident through
  * it. This registry caps live entries with LRU eviction instead.
  *
  * Eviction is always CORRECTNESS-safe — unlike a reclaimed checkpoint
  * (whose LogicalRDD dies with its files), an unpersisted cache entry
  * silently recomputes from its intact logical plan — so the cap can be
  * tight: the working set of one query family (its edges + degree
  * frame) plus one slot of cross-query slack.
  */
private[graft] object IterCache {
  private val MaxEntries = 3

  // accessOrder=true: iteration order = least-recently-USED first
  private val lru =
    new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true)

  /** Return the live frame for `key`, or run `build` (which must end in
    * `.persist()`), materialize it eagerly, register it, and evict the
    * least-recently-used entry past [[MaxEntries]].
    */
  def getOrBuild(key: String)(build: => DataFrame): DataFrame =
    synchronized {
      val hit = lru.get(key)
      if (hit != null) hit
      else {
        // Cross-volume flush first: keys are "name:dir", and an entry
        // from a DIFFERENT dir can be arbitrarily large relative to
        // this one (a 100× probe's edge cache is ~4 GB while the 1×
        // lane's is ~40 MB) — the q85 probe measured a 10× base-lane
        // inflation purely from another volume's resident cache. Same
        // data volume ⇒ comparable entry sizes ⇒ the count cap below is
        // then a meaningful memory bound. Keys without ':' (unit tests)
        // are exempt.
        val colon = key.indexOf(':')
        if (colon >= 0) {
          val suffix = key.substring(colon)
          val it0 = lru.entrySet().iterator()
          while (it0.hasNext) {
            val e = it0.next()
            val k = e.getKey
            val c = k.indexOf(':')
            if (c >= 0 && k.substring(c) != suffix) {
              it0.remove()
              try e.getValue.unpersist(true)
              catch { case _: Throwable => () }
            }
          }
        }
        // evict BEFORE building: the new frame's materialization is the
        // memory-hungriest moment, and an evicted-after-build policy
        // leaves the outgoing entry resident exactly through it (the
        // round-11 100× probe OOM'd on that ordering — q78's edge cache
        // was still live while q109's build ran). Blocking unpersist so
        // the storage is actually gone before the build starts.
        while (lru.size >= MaxEntries) {
          val it = lru.entrySet().iterator()
          val eldest = it.next()
          it.remove()
          try eldest.getValue.unpersist(true)
          catch { case _: Throwable => () }
        }
        val df = build
        df.count()
        lru.put(key, df)
        df
      }
    }
}
