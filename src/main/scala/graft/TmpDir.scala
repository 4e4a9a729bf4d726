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
}
