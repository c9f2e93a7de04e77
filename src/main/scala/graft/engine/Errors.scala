package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.LongAccumulator

/** Error-handling semantics of the reference (SURVEY.md §2.6), re-expressed
  * on Spark primitives:
  *
  *  - E1 deserialization handler (ErrorHandlingExample.scala:32-47):
  *    malformed records are skipped and counted; when the count crosses a
  *    threshold the pipeline FAILS. → permissive `from_json` + a
  *    LongAccumulator + [[CorruptThresholdGuard]].
  *  - E3 production handler (ErrorHandlingExample.scala:49-62): CONTINUE for
  *    an allowlisted exception type, FAIL otherwise. → [[guardedSink]].
  *  - E4 uncaught-exception handler (ErrorHandlingExample.scala:64-74):
  *    REPLACE_THREAD on a known transient error, SHUTDOWN otherwise. →
  *    Spark task retries already give per-task REPLACE_THREAD; query-level
  *    restarts are [[runWithRestarts]].
  *  - E5 state machine (KafkaStreamsApp.scala:26-54): listener + failure
  *    propagation → [[LoggingListener]].
  */
object Errors {

  /** Thrown when the corrupt-record budget is exhausted — the reference's
    * `FAIL` response after `maxErrors` skips (ErrorHandlingExample.scala:41-43).
    */
  final class TooManyCorruptRecords(count: Long, max: Long)
    extends RuntimeException(s"corrupt records $count exceeded budget $max")

  /** Null-safe message predicate for handler allowlists — `getMessage` may
    * be null (classic bare NPE), and a predicate that itself throws would
    * mask the original failure.
    */
  def messageContains(marker: String): Throwable => Boolean =
    t => Option(t.getMessage).exists(_.contains(marker))

  /** [[messageContains]] over the full CAUSE CHAIN (bounded): a failure
    * raised inside a distributed action reaches the caller wrapped —
    * SparkException over the task failure over the user error — so an
    * allowlist that only reads the top-level message misclassifies every
    * executor-side failure as non-allowlisted and FAILs a pipeline the
    * policy says to CONTINUE. The bound guards against pathological
    * self-referential cause cycles.
    */
  def causeChainContains(marker: String): Throwable => Boolean = t =>
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(20)
      .exists(messageContains(marker))

  /** E1: parse a JSON column permissively, counting corrupt rows into `acc`
    * and dropping them. Accumulator caveat: updates happen inside a
    * transformation, so re-evaluating the result (second action, task
    * retry) re-counts — suitable for the streaming foreachBatch pattern
    * (one action per micro-batch) but NOT for multi-action batch flows; use
    * [[corruptCount]] + [[checkBudget]] there for an exact count.
    */
  def permissiveParse(df: DataFrame, jsonCol: String, schema: StructType,
                      acc: LongAccumulator): DataFrame =
    Serde.countingParse(df, jsonCol, schema, acc)

  /** Exact corrupt-row count via a dedicated action — re-evaluation safe. */
  def corruptCount(df: DataFrame, jsonCol: String, schema: StructType): Long = {
    import org.apache.spark.sql.functions.{col, from_json}
    df.withColumn("__p", from_json(col(jsonCol), schema))
      .filter(Serde.isCorrupt(col("__p"), schema)).count()
  }

  def checkBudget(acc: LongAccumulator, maxErrors: Long): Unit =
    checkBudget(acc.value, maxErrors)

  def checkBudget(count: Long, maxErrors: Long): Unit =
    if (count > maxErrors) throw new TooManyCorruptRecords(count, maxErrors)

  /** E3: sink-side guard — CONTINUE iff the failure is allowlisted
    * (RecordTooLargeException parity), otherwise rethrow (FAIL).
    */
  def guardedSink(df: DataFrame, write: DataFrame => Unit,
                  continueOn: Throwable => Boolean): Boolean =
    try { write(df); true }
    catch {
      // NonFatal: an OutOfMemoryError/interrupt must propagate even if the
      // allowlist predicate happens to match its message — CONTINUE-ing in
      // a corrupted JVM is worse than failing
      case scala.util.control.NonFatal(t) if continueOn(t) => false
      case t: Throwable => throw t
    }

  /** E4: restart loop around a (streaming or batch) action — REPLACE_THREAD
    * for transient errors up to `maxRestarts`, SHUTDOWN (rethrow) otherwise.
    */
  def runWithRestarts[A](isTransient: Throwable => Boolean, maxRestarts: Int)(body: => A): A = {
    var remaining = maxRestarts
    while (true) {
      try return body
      catch {
        // fatal JVM errors are never "transient" — REPLACE_THREAD on an OOM
        // would re-run the body inside a broken JVM
        case scala.util.control.NonFatal(t) if remaining > 0 && isTransient(t) =>
          remaining -= 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** E5: lifecycle observation — the Spark analogue of the reference's
    * KafkaStreams.StateListener (KafkaStreamsApp.scala:33-42).
    */
  final class LoggingListener(log: String => Unit = s => Console.err.println(s))
      extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      log(s"[lifecycle] started ${e.id}")
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      log(s"[lifecycle] terminated ${e.id} error=${e.exception.getOrElse("none")}")
  }

  def withListener[A](spark: SparkSession, listener: StreamingQueryListener)(body: => A): A = {
    spark.streams.addListener(listener)
    try body finally spark.streams.removeListener(listener)
  }
}
