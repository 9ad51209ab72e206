package graft

import org.apache.spark.sql.SparkSession

/** Session-level utilities for the graft engine. */
object Graft {

  /** Release every session-lifetime memoized relation the operator
    * families keep (packed-code hot tier, shingle/postings/prefix/simhash
    * dedup relations, IVF and k-means index entries). Without this the
    * persisted footprint grows monotonically across fixture dirs and
    * scale factors within one JVM — exactly the bench/test regime — and
    * late queries absorb GC pauses and cache eviction that have nothing
    * to do with their plans. Fixture dirs are immutable, so dropping the
    * caches is always safe; the next query that needs one rebuilds it.
    */
  def clearAllCaches(spark: SparkSession): Unit = {
    operators.Search.clearCaches(spark)
    operators.Dedup.clearCaches(spark)
    operators.MLSimilarity.clearCaches(spark)
  }
}
