package graft.lineage

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.ArrayBuffer

/** Per-partition lineage + metrics (north rule): a SparkListener capturing
  * task-level input/output/shuffle volumes OFF the data path — zero overhead
  * in the operators themselves. One row per finished task:
  *
  *   (job, stage_id, partition_id, records_read, bytes_read,
  *    records_written, shuffle_read_b, shuffle_write_b, wall_ms, status)
  *
  * Registered per job section via `capture(spark, job) { body }`, appended
  * to a lineage Parquet table by the caller (see graft.tile.TileManifest).
  */
object Lineage {

  final case class LineageRow(job: String, stage_id: Int, partition_id: Int,
      records_read: Long, bytes_read: Long, records_written: Long,
      shuffle_read_b: Long, shuffle_write_b: Long, wall_ms: Long, status: String)

  private final class Collector(job: String) extends SparkListener {
    val rows = ArrayBuffer.empty[LineageRow]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val m = t.taskMetrics
      if (m != null) {
        rows += LineageRow(job, t.stageId, t.taskInfo.index,
          m.inputMetrics.recordsRead, m.inputMetrics.bytesRead,
          m.outputMetrics.recordsWritten,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.executorRunTime, t.taskInfo.status)
      }
    }
  }

  /** Run `body`, return (result, lineage rows of every task it executed). */
  def capture[A](spark: SparkSession, job: String)(body: => A): (A, DataFrame) = {
    import spark.implicits._
    val c = new Collector(job)
    spark.sparkContext.addSparkListener(c)
    try {
      val result = body
      // the listener bus is async; its drain API (waitUntilEmpty) is
      // private[spark] but reachable reflectively — the fast path costs
      // ~0 ms vs the 300 ms-minimum quiescence poll, which previously
      // charged every tile batch a pure-sleep tax (>3 s over a q124 run)
      if (!drainBus(spark)) {
        var last = -1
        var stable = 0
        var waited = 0
        while (stable < 2 && waited < 5000) {
          val n = c.synchronized(c.rows.length)
          if (n == last) stable += 1 else { stable = 0; last = n }
          // 50 ms samples: the fallback only runs when the reflective
          // drain is unreachable, so bias toward completeness over speed
          Thread.sleep(50); waited += 50
        }
      }
      (result, c.rows.toSeq.toDF())
    } finally {
      spark.sparkContext.removeSparkListener(c)
    }
  }

  /** Reflective LiveListenerBus.waitUntilEmpty — false if unreachable. */
  private def drainBus(spark: SparkSession): Boolean =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount <= 1)
        .exists { m =>
          if (m.getParameterCount == 0) m.invoke(bus)
          else m.invoke(bus, java.lang.Long.valueOf(5000L))
          true
        }
    } catch { case _: Throwable => false }
}
