package graft.operators

import org.apache.spark.sql.SparkSession

/** Pipeline kill switch (L8) — the engine-side equivalent of the
  * reference's disabled-route guard (`src/server.js:50-53`, which
  * answers the migration endpoint with "Disable Route" before any work
  * starts). Two layers, matching how a Spark deployment actually stops
  * work:
  *
  *  - pre-flight: [[disable]] flips a named switch; [[runGuarded]]
  *    refuses to start (throws [[PipelineDisabledException]]) while it
  *    is set — the reference's behavior, no jobs submitted at all;
  *  - mid-flight: [[runGuarded]] scopes every job the body submits to a
  *    cancellable job group (`interruptOnCancel = true`), so
  *    [[cancel]] from any thread aborts the in-progress run — the part
  *    the reference cannot do (its Node loop is single-process;
  *    cluster jobs need cooperative cancellation).
  *
  * Both are driver-local controls: on a real deployment the switch
  * flips from an ops endpoint or config watcher; the job-group
  * cancellation fans out to every executor via the scheduler.
  */
object KillSwitch {
  final class PipelineDisabledException(tag: String)
    extends IllegalStateException(
      s"pipeline '$tag' is disabled by kill switch")

  private val disabled =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def disable(tag: String): Unit = disabled.add(tag)
  def enable(tag: String): Unit = disabled.remove(tag)
  def isDisabled(tag: String): Boolean = disabled.contains(tag)

  /** Run `body` under job group `tag`, cancellable via [[cancel]].
    * Throws [[PipelineDisabledException]] without submitting anything
    * if the switch is set.
    */
  def runGuarded[T](spark: SparkSession, tag: String,
      description: String = "")(body: => T): T = {
    if (isDisabled(tag)) throw new PipelineDisabledException(tag)
    val sc = spark.sparkContext
    sc.setJobGroup(tag, if (description.isEmpty) tag else description,
      interruptOnCancel = true)
    try body
    finally sc.clearJobGroup()
  }

  /** Abort every job submitted under `tag`, interrupting running
    * tasks. Safe to call from any thread; no-op if nothing is running.
    */
  def cancel(spark: SparkSession, tag: String): Unit =
    spark.sparkContext.cancelJobGroup(tag)
}
