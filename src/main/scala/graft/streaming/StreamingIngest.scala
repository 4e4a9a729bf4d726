package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Flatten

/** Streaming ingest (north-star extension, SURVEY §7.6): the same parcel
  * payload arriving as JSON Lines drives the same [[Flatten]] projection
  * and a watermarked windowed variant of the KPI labeling — batch and
  * stream share one transformation library.
  *
  * The reference is pure batch; this is the scale path for continuous
  * ingest: a JSONL (or Kafka-value) stream is splittable and partition-
  * parallel, unlike the reference's multiLine CSV.
  */
object StreamingIngest {

  /** JSONL text stream → flat event frame (same 21 columns as batch). */
  def flatEvents(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.readStream
      .option("maxFilesPerTrigger", "16")
      .text(path)
      .withColumnRenamed("value", "event")
    Flatten(raw)
  }

  /** Windowed per-event-code counts with late-data handling: watermark on
    * `event_date`, tumbling windows. `approx_count_distinct` (HLL++)
    * replaces the exact distinct (not supported in streaming and the right
    * call at 100 TB anyway).
    */
  def windowedEventCounts(flat: DataFrame, windowDur: String, watermark: String): DataFrame =
    flat
      .withWatermark("event_date", watermark)
      .groupBy(window(col("event_date"), windowDur), col("event_code"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("shipping_id")).as("approx_shipments"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_code"), col("n_events"), col("approx_shipments"))

  /** Streaming sessionization: `session_window` with a watermark — the
    * streaming twin of [[graft.ops.Sessionize.bySessionWindow]].
    */
  def sessionized(flat: DataFrame, gap: String, watermark: String): DataFrame =
    flat
      .filter(col("shipping_id").isNotNull)
      .withWatermark("event_date", watermark)
      .groupBy(col("shipping_id"), session_window(col("event_date"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("shipping_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Drive a streaming frame to completion against a memory sink and
    * return the collected result (test/local harness; production callers
    * use their own `writeStream` sink).
    */
  def runToMemory(spark: SparkSession, df: DataFrame, queryName: String,
      outputMode: String = "append"): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
