package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Runtime observability (reference B13/C5: the producer's periodic
  * status() stats and per-record delivery callbacks,
  * phone_message_producer.py:674-697, :453-461): a
  * StreamingQueryListener snapshotting throughput and state size from
  * each progress event. */
object Monitor {

  case class Snapshot(
      queryName: String,
      batchId: Long,
      inputRowsPerSecond: Double,
      processedRowsPerSecond: Double,
      numInputRows: Long,
      stateRows: Long)

  class Listener extends StreamingQueryListener {
    private val last = new AtomicReference[Option[Snapshot]](None)
    private val errors = new AtomicReference[Option[String]](None)
    private val inputTotal = new java.util.concurrent.atomic.AtomicLong(0)
    private val stateMax = new java.util.concurrent.atomic.AtomicLong(0)

    def lastSnapshot: Option[Snapshot] = last.get()
    def lastError: Option[String] = errors.get()
    /** Cumulative rows across batches (progress events are async; a
      * trailing zero-row batch may be the final event). */
    def totalInputRows: Long = inputTotal.get()
    def maxStateRows: Long = stateMax.get()

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val state = Option(p.stateOperators).toSeq.flatten
        .map(_.numRowsTotal).sum
      inputTotal.addAndGet(p.numInputRows)
      stateMax.getAndUpdate(m => math.max(m, state))
      last.set(Some(Snapshot(
        Option(p.name).getOrElse(""), p.batchId,
        p.inputRowsPerSecond, p.processedRowsPerSecond,
        p.numInputRows, state)))
    }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      e.exception.foreach(msg => errors.set(Some(msg)))
  }

  /** Attach a fresh listener to the session; caller detaches with
    * spark.streams.removeListener. */
  def attach(spark: SparkSession): Listener = {
    val l = new Listener
    spark.streams.addListener(l)
    l
  }
}
