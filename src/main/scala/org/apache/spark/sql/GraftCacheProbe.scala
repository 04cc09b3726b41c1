package org.apache.spark.sql

import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

/** Maps a persisted DataFrame to the storage RDD that actually holds
  * its cached blocks, so graft's cache-budget enforcement
  * ([[graft.queries.Shared.enforceBudget]]) can read each frame's OWN
  * size out of one `getRDDStorageInfo` snapshot instead of re-polling
  * the (event-bus-fed, lagging) global total after every eviction —
  * the round-14 thrash amplifier.
  *
  * Lives in `org.apache.spark.sql` because `sharedState`/
  * `cacheManager` are `private[sql]`; everything used here is public
  * Spark bytecode (CacheManager.lookupCachedData → CachedData →
  * InMemoryRelation.cacheBuilder → cachedColumnBuffers), just
  * package-scoped at the Scala level.
  */
object GraftCacheProbe {

  /** The id of the RDD holding `df`'s cached column buffers, when the
    * frame is cached AND its buffers were ever built. Never forces a
    * build: an unmaterialized cache entry has no storage to account
    * for, so it reports None instead of instantiating buffers.
    */
  def cachedRddId(df: Dataset[_]): Option[Int] = df match {
    case d: ClassicDataset[_] =>
      d.sparkSession.sharedState.cacheManager
        .lookupCachedData(d)
        .map(_.cachedRepresentation.cacheBuilder)
        .filter(_.isCachedColumnBuffersLoaded)
        .map(_.cachedColumnBuffers.id)
    case _ => None
  }
}
