package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** CacheManager visibility bridge: `SharedState.cacheManager` is
  * `private[sql]` in Spark 4, but cache-hygiene specs need to assert
  * that an operator releases every `cache()` it takes (leaked cached
  * plans perturb neighboring queries in a long-lived session). Same
  * one-hop pattern as [[ColumnBridge]]. */
object CacheBridge {
  /** True when no Dataset.cache()/persist() entry is registered. */
  def cacheManagerIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
