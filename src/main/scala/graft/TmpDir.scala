package graft

/** Repo-local scratch root for probe fixtures, spec temp dirs and
  * synthetic scale corpora.
  *
  * Resolved RELATIVE to the working directory (sbt forks both `run` and
  * `test` JVMs with the project base as cwd), overridable with
  * `-Dgraft.tmp.dir=<path>` — so a checkout at any location works; the
  * probes previously hardcoded `/root/repo/target` and broke anywhere
  * else (round-5 advice). The directory is created on first use so
  * `Files.createTempDirectory(Paths.get(TmpDir.root), …)` callers never
  * race a missing parent.
  */
object TmpDir {
  lazy val root: String = {
    val f = sys.props.get("graft.tmp.dir").map(new java.io.File(_))
      .getOrElse(new java.io.File("target"))
    f.mkdirs()
    f.getAbsolutePath
  }

  /** Cheap content token for a source dataset: a hex mix over the sorted
    * (path, length, mtime) of every file under the given paths. Folded
    * into marker-cache names (x49 fixture, [[ScalePilot.buildScaled]]'s
    * `_built` marker) so a source regenerated IN PLACE — same path, new
    * bytes, as the driver did to `/root/testdata` mid-round-6 — yields a
    * different token and self-invalidates the stale cache. Metadata only:
    * no file is read, so the token costs microseconds even on a large
    * fixture tree. Limitation: a rewrite that lands within the
    * filesystem's mtime granularity AND preserves every file's size goes
    * undetected — the token is a cache key, not an integrity hash.
    */
  def sourceToken(paths: String*): String = {
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).map(_.toSeq).getOrElse(Nil).flatMap(files)
      else if (f.exists()) Seq(f) else Nil
    // path is FOLDED IN (not just a sort key): a content swap between two
    // same-size files, or a regen preserving sizes+mtimes, still moves
    // the token when any path changes (round-7 advice)
    val mixed = paths.flatMap(p => files(new java.io.File(p)))
      .sortBy(_.getPath)
      .foldLeft(17L)((a, f) =>
        ((a * 1000003L + f.getPath.hashCode) * 1000003L + f.length) * 1000003L + f.lastModified)
    java.lang.Long.toHexString(mixed)
  }
}
