package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Store-layout maintenance: small-file compaction.
  *
  * Streaming sinks, per-task writers, and incremental merges all shed
  * small files; at 100 TB the file count itself becomes the bottleneck
  * (NameNode/listing pressure, one scan task per file, footer overhead
  * per read). Compaction rewrites a parquet directory into
  * ceil(bytes / targetBytes) files of roughly even size.
  *
  * The rewrite goes to a staging directory and swaps in with an atomic
  * rename (same discipline as the streaming SCD2 sink): Spark cannot
  * overwrite a path feeding the plan being written, and a crash
  * mid-rewrite must leave the original data intact.
  */
object Layout {

  /** Total length in bytes of the data files under `path` (driver-side
    * metadata listing — no data read).
    */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_")) total += f.getLen
    }
    total
  }

  /** Rewrite the parquet directory at `path` into ~`targetBytes` files.
    * Returns the re-read compacted frame. Round-robin repartition gives
    * even file sizes; row-level content is preserved exactly (asserted by
    * the q56 oracle), file-level layout is not (that's the point).
    *
    * Swap discipline: data is NEVER deleted before its replacement is in
    * place — the original moves aside to `path + ".old"` first, then the
    * staging copy renames in, then `.old` is dropped. A crash can leave
    * the table under `.old` (recoverable by a rename), never gone.
    */
  def compact(spark: SparkSession, path: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val nOut = math.max(1, math.ceil(dataBytes(spark, path).toDouble / targetBytes).toInt)
    val dest = new Path(path)
    val staging = new Path(path + ".compacting")
    val old = new Path(path + ".old")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(staging, true) // clear a prior crashed attempt's leftovers
    fs.delete(old, true)
    spark.read.parquet(path).repartition(nOut)
      .write.mode("overwrite").parquet(staging.toString)
    if (!fs.rename(dest, old))
      throw new java.io.IOException(s"swap step 1 $dest -> $old failed")
    if (!fs.rename(staging, dest)) {
      fs.rename(old, dest) // roll back so the table is never missing
      throw new java.io.IOException(s"swap step 2 $staging -> $dest failed (rolled back)")
    }
    fs.delete(old, true)
    spark.read.parquet(path)
  }
}
