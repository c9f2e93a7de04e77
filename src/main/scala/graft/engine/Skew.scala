package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (build rule: "skewed keys → salting or
  * AQE skew-join").
  *
  * First line of defense is AQE: `spark.sql.adaptive.skewJoin.enabled`
  * splits oversized sort-merge partitions at runtime with no code change —
  * that is the default answer and is on in Bench/session builders. Manual
  * salting remains necessary when AQE cannot help: broadcast-ineligible
  * shuffled-hash joins, a single pathological key larger than one executor
  * (AQE splits partitions, not keys, for aggregation-like patterns), or
  * engines/stages where AQE is off. This operator is that escape hatch.
  *
  * Mechanics: the big side gets a deterministic salt in [0, salt) hashed
  * from its whole row, widening each hot key into `salt` sub-keys that
  * hash to different reducers; the small side is replicated `salt`× with
  * every salt value so every (key, salt) pair still finds its match. Join
  * output is exactly the plain equi-join's (proven by SkewSpec): salting
  * changes data placement, never semantics. Cost: small side shuffled
  * salt×; big side unchanged (one wide exchange either way).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side's rows spread
    * across `salt` sub-partitions per key. Use when one/few key values
    * dominate the big side. `small` is replicated `salt`× — keep it the
    * dimension side.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
