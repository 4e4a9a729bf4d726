package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

object ShuffleTap {
  /** Byte counters at one instant; subtract two for a per-query delta. */
  final case class Snap(read: Long, write: Long, spill: Long) {
    def -(o: Snap): Snap = Snap(read - o.read, write - o.write, spill - o.spill)
    def readMb: Double = read / 1e6
    def writeMb: Double = write / 1e6
    def spillMb: Double = spill / 1e6
  }
}

/** Measures shuffle traffic per query via a `SparkListener`.
  *
  * Every "no extra shuffle" claim in the operator scaladocs is a claim
  * about bytes, not wall-clock — at sf0.1 a plan regression that doubles
  * shuffle volume can hide inside ambient timing noise (BASELINE.md
  * documents 4-40× host spikes). Accumulating
  * `taskMetrics.shuffleReadMetrics.totalBytesRead` /
  * `shuffleWriteMetrics.bytesWritten` / `diskBytesSpilled` across task
  * ends turns those claims into numbers the bench artifact (and PlanSpec)
  * can assert on.
  *
  * The listener bus is asynchronous, so [[settle]] polls until the
  * counters stop moving before snapshotting — bracketing a query between
  * two settled snapshots attributes its bytes correctly even though
  * events lag task completion. Polling happens OUTSIDE the timed region
  * (settle first, then start the clock).
  *
  * `jobGroup`: when set, ONLY tasks of jobs launched under that
  * `SparkContext.setJobGroup` id are counted — the counters are otherwise
  * context-global, so on a SHARED session (the test JVM runs suites
  * concurrently) an unrelated job that shuffles during a bracket would
  * inflate the measurement. The bench leaves it unset (the bench JVM runs
  * nothing else); byte-asserting tests MUST set it.
  */
final class ShuffleTap(spark: SparkSession, jobGroup: Option[String] = None) {
  import ShuffleTap.Snap

  private val readB = new AtomicLong
  private val writeB = new AtomicLong
  private val spillB = new AtomicLong
  // stage ids belonging to the tracked job group (unused when untagged)
  private val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  private val listener = new SparkListener {
    override def onJobStart(js: SparkListenerJobStart): Unit =
      if (jobGroup.isDefined &&
          jobGroup.contains(Option(js.properties)
            .map(_.getProperty("spark.jobGroup.id")).orNull))
        js.stageIds.foreach(stages.add)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null && (jobGroup.isEmpty || stages.contains(te.stageId))) {
        readB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        writeB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spillB.addAndGet(m.diskBytesSpilled)
      }
    }
  }
  spark.sparkContext.addSparkListener(listener)

  def snap(): Snap = Snap(readB.get, writeB.get, spillB.get)

  /** Wait for the async listener bus to drain (two consecutive unchanged
    * polls), bounded by `maxWaitMs`; returns the settled snapshot.
    *
    * Exiting via the bound while the counters are STILL MOVING means late
    * task-end events will be attributed to the next bracket, so that path
    * leaves a stderr JSONL note — a skewed per-query `shuffle_mb` sample
    * in the bench artifact is then identifiable in the stream instead of
    * silently wrong (round-5 advice).
    */
  def settle(maxWaitMs: Long = 2000): Snap = {
    var prev = snap()
    var stable = 0
    var waited = 0L
    while (stable < 2 && waited < maxWaitMs) {
      Thread.sleep(25)
      waited += 25
      val cur = snap()
      if (cur == prev) stable += 1
      else { stable = 0; prev = cur }
    }
    if (stable < 2)
      System.err.println(
        s"""{"bench_note":"shuffle settle hit maxWaitMs","max_wait_ms":$maxWaitMs,"hint":"next sample's shuffle_mb may absorb late events"}""")
    prev
  }

  /** Run `f` between two settled snapshots; returns (result, delta). */
  def measure[A](f: => A): (A, Snap) = {
    val s0 = settle()
    val r = f
    val s1 = settle()
    (r, s1 - s0)
  }

  def close(): Unit = spark.sparkContext.removeSparkListener(listener)
}
