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

  /** Join types for which small-side replication is semantics-preserving.
    * Right/full-outer are NOT: an unmatched small-side row exists `salt`
    * times after replication, so its null-extended output would be emitted
    * `salt` times — silently wrong. Inner/left/semi/anti only ever emit
    * small-side rows that matched (where all replicas agree) or big-side
    * rows (never replicated), so the output is exactly the plain join's.
    */
  private val safeJoinTypes = Set(
    "inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")

  /** Equi-join `big ⋈ small` on `key`, with the big side's rows spread
    * across `salt` sub-partitions per key. Use when one/few key values
    * dominate the big side. `small` is replicated `salt`× — keep it the
    * dimension side.
    *
    * Caveat: the salt is a hash of the whole big-side row, so *fully
    * identical* duplicate rows land in one salt bucket and are not spread.
    * That shape (hot key AND byte-identical payloads) usually wants
    * dedup-then-join or an explicit count-and-expand, not salting; a
    * nondeterministic salt would spread them but breaks retry/replay
    * determinism, which this engine guarantees everywhere else.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val normalized = joinType.toLowerCase.replace("_", "")
    require(safeJoinTypes.map(_.replace("_", "")).contains(normalized),
      s"saltedJoin supports inner/left/left_semi/left_anti, got '$joinType': " +
        "right/full_outer would emit each unmatched small-side row salt times")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
