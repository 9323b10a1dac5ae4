package org.apache.spark.sql.graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Task-metrics accumulator for the bench artifact's per-query volume
  * witnesses (VERDICT r12 task 4): `bytes_shuffled` (shuffle WRITE bytes
  * across all tasks — every shuffle's data is written exactly once, so
  * this is the canonical "how much crossed the wire" number) and
  * `rows_scanned` / `bytes_read` (source-input records/bytes). Collected
  * at the task layer rather than by traversing the executed plan so the
  * numbers are complete under AQE re-planning, reused exchanges, and
  * subquery plans without any plan-shape assumptions.
  *
  * Volumes are a property of the PLAN + DATA, not the host: a flapping
  * host inflates seconds but not bytes, so a per-query volume envelope
  * converts a bench-time regression into a one-look decision (volumes
  * flat ⇒ host noise; volumes grew ⇒ plan regression) with zero rerun
  * cost.
  *
  * Lives in the org.apache.spark namespace for `listenerBus.
  * waitUntilEmpty` (the listener bus is async; a snapshot taken before
  * the queue drains would leak one query's tail into the next query's
  * delta).
  */
final class VolumeWitness extends SparkListener {
  private val shuffleBytes = new LongAdder
  private val rowsScanned = new LongAdder
  private val bytesRead = new LongAdder

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      shuffleBytes.add(m.shuffleWriteMetrics.bytesWritten)
      rowsScanned.add(m.inputMetrics.recordsRead)
      bytesRead.add(m.inputMetrics.bytesRead)
    }
  }

  /** (bytes_shuffled, rows_scanned, bytes_read) since attach. */
  def snapshot(): (Long, Long, Long) =
    (shuffleBytes.sum(), rowsScanned.sum(), bytesRead.sum())
}

object VolumeWitness {
  def attach(spark: SparkSession): VolumeWitness = {
    val w = new VolumeWitness
    spark.sparkContext.addSparkListener(w)
    w
  }

  def detach(spark: SparkSession, w: VolumeWitness): Unit =
    spark.sparkContext.removeSparkListener(w)

  /** Drain the async listener bus so a snapshot is causally complete
    * for everything executed before the call. Bounded: a wedged queue
    * must degrade the witness, not hang the bench. */
  def sync(spark: SparkSession): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(30000)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
