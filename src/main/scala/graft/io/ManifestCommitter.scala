package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The versioned lake's single point of filesystem trust.
  *
  * Every publish path ([[Versioned]] commits, OCC retries, DV sidecar
  * publishes, compaction) funnels into one operation: "make `tmp`
  * become `target` iff `target` does not exist, atomically". The
  * default implementation maps that onto HDFS-semantics rename, which
  * is correct on HDFS, local FS (serialized per-root in-JVM — see
  * [[RenameManifestCommitter]]), and object stores with atomic
  * conditional rename/put (ABFS, GCS compose-and-fail-on-exists).
  *
  * It is NOT correct on raw S3-class stores, where "rename" is a
  * non-atomic copy+delete and two racing writers can both think they
  * won — the same reason Delta Lake routes its log writes through a
  * pluggable `LogStore` (S3 deployments supply a DynamoDB-coordinated
  * one) and Iceberg requires a catalog with atomic swap. Deployments on
  * such stores plug a coordinating committer here (DynamoDB/ZooKeeper
  * conditional put, a database row, S3 If-None-Match conditional PUT)
  * via `spark.graft.manifestCommitter=<FQCN>`; everything else in the
  * engine — data files, sidecars, staging dirs — is write-once under
  * unique names and needs no coordination.
  */
trait ManifestCommitter {

  /** Publish `tmp` as `target` iff `target` does not already exist.
    * Returns true iff THIS call created `target` (false = a second
    * writer won; the caller deletes `tmp` and raises the conflict).
    * Implementations must be atomic with respect to every other writer
    * of the same table, across processes. */
  def commit(fs: FileSystem, tmp: Path, target: Path, tableRoot: String): Boolean
}

object ManifestCommitter {

  /** Session conf key naming the committer class (FQCN with a no-arg
    * constructor). Default: [[RenameManifestCommitter]]. */
  val ConfKey = "spark.graft.manifestCommitter"

  // one instance per class name: committers may carry coordination
  // state (locks, connection pools) that must be shared JVM-wide
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, ManifestCommitter]()

  def resolve(spark: SparkSession): ManifestCommitter = {
    val cls = spark.conf.get(ConfKey, classOf[RenameManifestCommitter].getName)
    // the default never goes through a classloader at all: an isolated
    // context loader (Hive session loaders, child-first containers) must
    // not be able to break every publish on the path that needs no
    // user code
    if (cls == classOf[RenameManifestCommitter].getName)
      return cache.computeIfAbsent(cls, _ => new RenameManifestCommitter)
    // custom committers: context classloader first (user code lives in
    // the application/REPL loader this library's own loader can't see),
    // falling back to our own loader if the context one can't find it
    cache.computeIfAbsent(cls, c => {
      val ctx = Option(Thread.currentThread().getContextClassLoader)
      val loaded =
        try ctx.getOrElse(getClass.getClassLoader).loadClass(c)
        catch {
          case _: ClassNotFoundException if ctx.isDefined =>
            getClass.getClassLoader.loadClass(c)
        }
      loaded.getDeclaredConstructor().newInstance().asInstanceOf[ManifestCommitter]
    })
  }
}

/** Default committer: atomic no-overwrite rename (the HDFS contract).
  *
  * On HDFS the no-overwrite rename itself refuses an existing target.
  * The local filesystem's `File.renameTo` silently REPLACES an existing
  * target, so the exists-check + rename is a TOCTOU window there; all
  * of Spark's local/driver-side writers share one JVM, so serializing
  * check+rename per table root closes that window exactly where it
  * exists. Cross-process local-FS racing — and any S3-class store
  * without atomic rename — is out of this committer's contract: plug a
  * coordinating [[ManifestCommitter]] instead. */
final class RenameManifestCommitter extends ManifestCommitter {

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  override def commit(fs: FileSystem, tmp: Path, target: Path,
                      tableRoot: String): Boolean = {
    val lock = locks.computeIfAbsent(tableRoot, _ => new Object)
    lock.synchronized {
      !fs.exists(target) && fs.rename(tmp, target)
    }
  }
}
