package graft.operators

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel

/** Corpus-cut cache lifetime as an OPERATOR contract (r18 adjudication:
  * four scales' shingle caches held concurrently evicted the active cut's
  * blocks and inflated d13's x100 rep from ~60 s to 192 s — the fix lived
  * in the ScaleSlope harness's clearCache until this promoted it into the
  * operators). The session-scoped per-corpus memos must hold at most ONE
  * corpus cut: requesting a new cut releases every other cut's persisted
  * frames.
  */
class CacheLifetimeSpec extends SparkSpec {

  private val secondCut = "/root/testdata/sf0.01"

  test("a second corpus cut's request releases the first cut's shingle " +
      "and closure caches; same-cut requests keep the memo") {
    // first cut, materialized: blocks actually live
    val first = DedupQueries.shingledDocs(spark, sfDir)
    first.count()
    assert(first.storageLevel != StorageLevel.NONE,
      "first cut's shingle frame not cached after materialization")
    val firstLabels = DedupQueries.closureLabels(spark, sfDir)
    firstLabels.count()

    // same-cut re-request: the memo survives (no rebuild thrash)
    assert(DedupQueries.shingledDocs(spark, sfDir) eq first,
      "same-cut request rebuilt the shingle memo")
    assert(first.storageLevel != StorageLevel.NONE)

    // a SECOND cut's request releases the first cut's frames — the
    // operator contract, not a harness clearCache
    val second = DedupQueries.shingledDocs(spark, secondCut)
    assert(first.storageLevel == StorageLevel.NONE,
      "first cut's shingle blocks survived a cut switch")
    assert(firstLabels.storageLevel == StorageLevel.NONE,
      "first cut's closure labels survived a cut switch")
    assert(second.storageLevel != StorageLevel.NONE,
      "active cut's frame lost its persist marking")

    // switching back releases the second and rebuilds the first on demand
    val back = DedupQueries.shingledDocs(spark, sfDir)
    assert(second.storageLevel == StorageLevel.NONE,
      "second cut's blocks survived the switch back")
    assert(!(back eq first), "stale released frame served from the memo")
    back.count()
    assert(back.storageLevel != StorageLevel.NONE)
  }
}
