package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-scope access shim (the `org.apache.spark.sql.graftbridge` pattern,
  * one package up): `SparkContext.listenerBus` is `private[spark]`, and
  * draining it is the only deterministic way to assert on listener-observed
  * job counts — a fixed sleep undercounts on a loaded host and the
  * assertion flakes (round-10 review finding on LlmOpsSpec's memoization
  * test). Spark's own listener suites settle exactly this way.
  */
object ListenerBridge {
  /** Block until every queued listener event has been delivered (10 s cap,
    * the bus's own default — throws if exceeded, which IS the signal that
    * something upstream is wedged rather than slow).
    */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
