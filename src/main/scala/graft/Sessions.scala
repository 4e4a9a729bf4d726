package graft

import org.apache.spark.sql.SparkSession

/** Tuned `SparkSession` builder: the knobs every graft job sets the same
  * way, sized for local[n] testing but with the 100-TB rationale attached.
  */
object Sessions {

  /** @param cores parallelism; shuffle partitions match it locally (on a
    *              real cluster: 2-3× total executor cores, or rely on AQE
    *              coalescing from a higher initial value)
    */
  def local(appName: String, cores: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      // custom kernels (vec_dot, minhash_agg, …) visible to SQL text
      .withExtensions(new graft.functions.GraftExtensions)
      // AQE: runtime re-plan (broadcast demotion/promotion, skew-join
      // splitting, partition coalescing)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", cores.toString)
      // 128 MB scan splits: big enough to amortize task overhead, small
      // enough that a partition's working set fits executor memory
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
