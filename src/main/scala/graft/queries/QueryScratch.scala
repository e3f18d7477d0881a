package graft.queries

/** Scratch roots for queries that materialize real tables (versioned
  * commits, bucketed writes) before reading them back: deterministic
  * per-sfDir paths under java.io.tmpdir, cleared on every call so
  * rebuilt fixtures keep stable version numbers across warmup + timed
  * bench iterations in one JVM. */
private[queries] object QueryScratch {

  /** Clear one table root under a STABLE parent (e.g. a catalog warehouse
    * whose path must not change between calls in one JVM — Spark caches
    * catalog instances on first resolution). */
  def wipe(path: String): Unit = deleteRecursively(path)

  def freshRoot(prefix: String, sfDir: String): String = {
    val root = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"${prefix}_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}").getAbsolutePath
    deleteRecursively(root)
    root
  }

  private def deleteRecursively(path: String): Unit = {
    val f = new java.io.File(path)
    val children = f.listFiles()
    if (children != null) children.foreach(c => deleteRecursively(c.getAbsolutePath))
    f.delete()
  }
}
