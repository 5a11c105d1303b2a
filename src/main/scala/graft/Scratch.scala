package graft

/** JVM-scoped scratch directories with registered cleanup — the single
  * temp-dir discipline for every operator that needs a sink/scan scratch
  * path (format roundtrips, model save/load, streaming sinks, synthetic
  * fixtures). Paths are PID-suffixed so concurrent JVMs (Verify + Bench
  * on the same sfDir) never overwrite each other mid-read, and each path
  * registers ONE shutdown hook that deletes it recursively, so repeated
  * runs don't accumulate corpus-sized copies in java.io.tmpdir.
  */
object Scratch {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** A JVM-unique scratch path for `tag` (sanitized, PID-suffixed),
    * with recursive deletion registered at JVM exit. The directory is
    * NOT created — Spark writers create their own output paths. */
  def dir(tag: String): String =
    register(s"${System.getProperty("java.io.tmpdir")}/graft_${tag.replaceAll("[^a-zA-Z0-9._-]", "_")}_${java.lang.ProcessHandle.current().pid()}")

  /** Register `path` for recursive deletion at JVM exit (once per path);
    * returns it. */
  def register(path: String): String = {
    if (registered.add(path)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def del(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(del))
          f.delete(): Unit
        }
        del(new java.io.File(path))
      }))
    }
    path
  }
}
