package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-
  * sample stages.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * per-partition batch iteration, output shape. The codec itself is a
  * clearly-marked STUB (`decodeStub`): this container has no image/audio
  * libraries, so decode derives deterministic fake dimensions from the
  * byte stream. Swapping in a real codec changes only the body of
  * [[MediaCodec.decodeStub]].
  */
object Multimodal {

  /** One media object: id + kind + raw bytes + string metadata. */
  case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte], source: String)

  /** Decoded metadata the (stubbed) codec emits. */
  case class MediaMeta(
      media_id: Long, kind: String, byte_len: Long,
      width: Int, height: Int, channels: Int, checksum: Long)

  /** One sampled frame of a media object. */
  case class MediaFrame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  object MediaCodec {
    /** STUB decode — deterministic fake: dimensions derived from the byte
      * length, checksum is a positional sum. A real implementation would
      * parse the container format here (and nothing else would change).
      */
    def decodeStub(r: MediaRecord): MediaMeta = {
      val len = r.bytes.length.toLong
      var checksum = 0L
      var i = 0
      while (i < r.bytes.length) { checksum += (r.bytes(i) & 0xff).toLong * ((i % 64) + 1); i += 1 }
      MediaMeta(r.media_id, r.kind, len,
        width = (len % 640).toInt + 1, height = (len % 480).toInt + 1,
        channels = 3, checksum = checksum)
    }

    /** STUB resize — returns a truncated byte budget proportional to the
      * target area (stands in for a real scaler).
      */
    def resizeStub(r: MediaRecord, w: Int, h: Int): MediaRecord =
      r.copy(bytes = r.bytes.take(math.max(1, (w.toLong * h / 64).toInt)))
  }

  /** Real-file ingestion: Spark's `binaryFile` source — one row per file
    * with (path, modificationTime, length, content), the canonical way to
    * load images/audio from a lake into binary columns. The scan is
    * partition-parallel across files; `pathGlobFilter` prunes by extension
    * at the listing (files never opened), and
    * `spark.sql.files.maxPartitionBytes` governs task granularity exactly
    * as for parquet.
    */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String, kind: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        // content-addressed id: stable across relistings, no driver counter
        xxhash64(col("path")).as("media_id"),
        lit(kind).as("kind"),
        col("content").as("bytes"),
        col("path").as("source"))

  /** Pack a text table into media records (binary column + metadata) — the
    * fixture stand-in for real image/audio ingestion. `encode` is a plain
    * Catalyst expression, so packing scales as a projection.
    */
  def pack(docs: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      coalesce(col("source"), lit("unknown")).as("source"))

  /** Per-partition decode: the executor-side batch loop a real codec needs
    * (amortized codec init per partition, not per row).
    */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition codec initialization would go here
      it.map(MediaCodec.decodeStub)
    }
  }

  /** Frame sampling: split the byte stream into fixed-size "frames", keep
    * every `everyN`-th. Array slicing is per-row Catalyst work; explode
    * fans frames out line-rate.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, frameBytes: Int, everyN: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      r.bytes.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % everyN == 0 => MediaFrame(r.media_id, idx, chunk)
      }
    }
  }

  /** Pure-SQL metadata (no mapPartitions) — the oracle-checkable twin of
    * [[extractMeta]]'s stub math, proving the typed path computes the same
    * thing the declarative path does.
    */
  def metaSql(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("bytes")).cast("long").as("byte_len"),
      (length(col("bytes")) % 640 + 1).as("width"),
      (length(col("bytes")) % 480 + 1).as("height"),
      lit(3).as("channels"),
      aggregate(sequence(lit(1), length(col("bytes"))), lit(0L),
        (acc, i) => acc + ascii(decode(col("bytes"), "UTF-8").substr(i, lit(1))).cast("long") * (((i - 1) % 64) + 1).cast("long")
      ).as("checksum"))
}
