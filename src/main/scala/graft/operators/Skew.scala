package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins — the manual fallback for
  * cases AQE's skew-join splitting can't reach (e.g. a broadcast-ineligible
  * dimension with one giant key, or aggregation skew).
  *
  * Salting: the skewed (large) side gets a random salt in [0, n); the
  * small side is exploded n× with every salt value; joining on
  * (key, salt) spreads each hot key over n reducers. Result is exactly
  * the plain join (verified in `SkewSpec`).
  */
object Skew {

  /** Salted equi-join: `big ⋈ small on key`, with the big side's hot keys
    * spread across `saltFactor` partitionable sub-keys. `small` rows are
    * replicated `saltFactor`× — keep it the dimension side.
    *
    * The salt must be deterministic per row for retry-safety on task
    * replay: derived from a stable hash of the row's join key and a
    * second disambiguating column rather than `rand()`.
    */
  /** The deterministic per-row salt: a stable hash of `saltCol` mod the
    * factor — NEVER `rand()`, whose re-draw on task replay makes retried
    * partitions join against different dim copies.
    */
  private[graft] def saltExpr(saltCol: Column, saltFactor: Int): Column =
    pmod(hash(saltCol), lit(saltFactor))

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltCol: Column, saltFactor: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt", saltExpr(saltCol, saltFactor))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
