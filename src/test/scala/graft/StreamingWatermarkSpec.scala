package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Append-mode windowed aggregation under an event-time watermark: only
  * windows the watermark has closed are emitted, and every emitted
  * window must equal the batch computation for that window.
  */
class StreamingWatermarkSpec extends SparkSpec {

  test("append-mode watermarked windows match batch for closed windows") {
    val name = "graft_wm_append"
    val agg = streaming.StreamingOps.streamEvents(spark, sfDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val emitted = spark.table(name).collect()
      .map(r => r.getTimestamp(0).toInstant -> r.getAs[Long]("n")).toMap
    assert(emitted.nonEmpty, "watermark should close at least one window")

    val batch = sources.Tables.events(spark, sfDir)
      .groupBy(window(col("ts").cast("timestamp"), "6 hours"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getStruct(0).getTimestamp(0).toInstant -> r.getAs[Long]("n"))
      .toMap
    // every emitted window is exactly the batch value; the final (open)
    // window may be withheld — that is the append-mode contract
    emitted.foreach { case (ws, n) =>
      assert(batch.get(ws).contains(n), s"window $ws: streamed $n vs batch ${batch.get(ws)}")
    }
    assert(batch.size - emitted.size <= 1, "at most the last window withheld")
  }
}
