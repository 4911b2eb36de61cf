package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._

import graft.operators.KillSwitch

/** Task-start signal as a JVM singleton: a latch captured in the UDF
  * closure would be SERIALIZED into the task and counted down on a
  * deserialized copy — module fields resolve to the same singleton in
  * local mode, so the driver-side test observes the signal.
  */
object KillSwitchProbe {
  val started = new CountDownLatch(1)
}

/** L8 kill switch: pre-flight disable refuses to submit work (the
  * reference's disabled-route behavior) and mid-flight cancel aborts a
  * running job group promptly.
  */
class KillSwitchSpec extends SparkSpec {

  test("disabled switch refuses to start and submits zero jobs") {
    KillSwitch.disable("nightly")
    try {
      val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup("nightly").length
      intercept[KillSwitch.PipelineDisabledException] {
        KillSwitch.runGuarded(spark, "nightly") {
          spark.range(10).count()
        }
      }
      val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup("nightly").length
      assert(jobsAfter == jobsBefore)
    } finally KillSwitch.enable("nightly")
    // re-enabled: runs normally
    val n = KillSwitch.runGuarded(spark, "nightly") { spark.range(10).count() }
    assert(n == 10)
  }

  test("cancel aborts an in-flight guarded job promptly") {
    @volatile var failure: Throwable = null
    val runner = new Thread(() => {
      try {
        KillSwitch.runGuarded(spark, "runaway") {
          // effectively unbounded work; task start is signaled via the
          // first partition's first row
          spark.range(Long.MaxValue)
            .filter(udf((id: Long) => {
              KillSwitchProbe.started.countDown(); id % 3 != 1
            }).apply(col("id")))
            .count()
        }
      } catch { case t: Throwable => failure = t }
    })
    runner.start()
    assert(KillSwitchProbe.started.await(60, TimeUnit.SECONDS),
      "job never started tasks")
    KillSwitch.cancel(spark, "runaway")
    runner.join(60000)
    assert(!runner.isAlive, "guarded job did not abort after cancel")
    assert(failure != null, "cancelled job should surface an exception")
  }
}
