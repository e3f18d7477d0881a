package graft.io

import java.sql.{DriverManager, SQLException}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** [[ManifestCommitter]] implementations for stores WITHOUT atomic
  * no-overwrite rename (raw S3-class object stores) — the committers
  * the default [[RenameManifestCommitter]]'s contract tells such
  * deployments to plug in via `spark.graft.manifestCommitter`.
  *
  * Two shapes, mirroring the public prior art (Delta Lake's LogStore
  * family; Iceberg's catalog swap):
  *
  *  - [[ConditionalPutManifestCommitter]] — for stores whose object
  *    create IS an atomic conditional PUT (S3 `If-None-Match: *`
  *    conditional writes, GCS `ifGenerationMatch=0`, ABFS
  *    create-no-overwrite): skip rename entirely and write the manifest
  *    straight to its final name, letting the store's precondition
  *    reject the loser.
  *  - [[JdbcClaimManifestCommitter]] — for stores with NO atomic
  *    primitive at all (legacy S3): coordinate through an external
  *    system's conditional insert, Delta's S3DynamoDBLogStore pattern
  *    re-expressed over any JDBC database (a DB row with the target
  *    path as primary key is the linearization point; the duplicate-key
  *    error is the precondition failure). Includes the same crashed-
  *    writer recovery the DynamoDB LogStore performs: an expired
  *    incomplete claim is finished from its recorded temp file (the
  *    dead writer's commit still wins) or, if nothing usable remains,
  *    the claim is stolen.
  */
final class ConditionalPutManifestCommitter extends ManifestCommitter {

  /** Publish by writing tmp's bytes to `target` through
    * `fs.create(target, overwrite = false)`.
    *
    * CONTRACT: only correct on stores where object creation is
    * all-or-nothing AND the no-overwrite precondition is enforced
    * server-side at completion time (the object materializes complete
    * on close, or not at all). On progressive-visibility filesystems
    * (HDFS, local) readers could observe a half-written manifest and a
    * crashed writer would leave a truncated target that blocks the
    * version forever — keep the default rename committer there. */
  override def commit(fs: FileSystem, tmp: Path, target: Path,
                      tableRoot: String): Boolean = {
    // fast-path: don't pay a write just to be rejected
    if (fs.exists(target)) return false
    val in = fs.open(tmp)
    val bytes =
      try {
        val len = fs.getFileStatus(tmp).getLen.toInt
        val b = new Array[Byte](len)
        in.readFully(b)
        b
      } finally in.close()
    val created =
      try {
        // on conditional-PUT stores the precondition is checked when the
        // object completes (close); surface EITHER failure point as a
        // lost race, never as an error — losing is a normal outcome
        val out = fs.create(target, false)
        try out.write(bytes) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
        // connectors surface a LOST conditional PUT in their own clothes
        // (S3A RemoteFileChangedException, GCS a plain IOException for a
        // failed generation-match) — none of which this module can name
        // without those jars. The store-agnostic discriminator: if the
        // write failed AND the target now exists, somebody else's commit
        // won — a normal loss. A failure with NO target is a real error
        // and stays loud.
        case e: java.io.IOException =>
          if (fs.exists(target)) false else throw e
      }
    if (created) fs.delete(tmp, false) // consumed; loser's tmp is the caller's
    created
  }
}

/** External-coordination committer: the right to publish `target` is a
  * conditional INSERT into a claims table keyed by the target path.
  *
  * Protocol per commit (all driver-side — manifest publishes never run
  * on executors):
  *   1. INSERT (target, tmp, writer, ts, complete=0). Success = this
  *      writer owns the publish: copy tmp → target by ANY means (no
  *      atomicity needed — ownership serializes writers; readers of an
  *      object store see the object only when complete), then mark the
  *      claim complete.
  *   2. Duplicate key = someone holds/held the claim:
  *      - complete → lost, return false.
  *      - incomplete and younger than the TTL → a live writer is
  *        mid-publish; lost, return false (the OCC loop re-derives).
  *      - incomplete and EXPIRED → crashed writer. Recovery: if its
  *        recorded tmp still exists, finish ITS publish (copy, mark
  *        complete — the dead writer's commit wins, exactly Delta's
  *        fixDeltaLog semantics) and return false; if neither its tmp
  *        nor the target exists, conditionally delete the corpse row
  *        and retry the insert.
  *
  * The TTL (`spark.graft.committerClaimTtlMillis`, default 15 min) must
  * comfortably exceed the longest real manifest publish — the same
  * liveness assumption the DynamoDB LogStore documents. The expiry check
  * compares THIS writer's wall clock against the claimant's recorded
  * timestamp, so cross-writer clock skew eats into the effective TTL: a
  * recoverer whose clock runs S ahead of the claimant's steals a live
  * claim S early — provision the TTL with headroom above the
  * deployment's worst skew. A claim stamped in the future (claimant's
  * clock ahead) is never treated as expired, only as live; and even a
  * skew-early steal cannot double-ack a version — the winner re-reads
  * its claim row before acknowledging (see [[commit]]) and reports a
  * loss if the claim changed hands mid-publish. Claim rows of completed
  * commits are retained as a commit audit log until
  * [[JdbcClaimManifestCommitter.vacuumClaims]] clears the ones older
  * than its retention window; recovery never needs them again once
  * `target` exists.
  *
  * Conf (read from the active session at commit time):
  *  - `spark.graft.committerJdbcUrl` (required): JDBC URL of the
  *    coordination database, e.g. the embedded-Derby
  *    `jdbc:derby:memory:claims;create=true` in tests, a shared
  *    PostgreSQL in a real deployment.
  *  - `spark.graft.committerClaimTtlMillis` (optional).
  */
final class JdbcClaimManifestCommitter extends ManifestCommitter {

  private val writerId = java.util.UUID.randomUUID.toString
  @volatile private var ensured: Set[String] = Set.empty

  /** Test seam: runs after this writer's claim INSERT succeeds and
    * before it publishes — the window an out-of-contract TTL stall
    * opens (ManifestCommitterSpec uses it to simulate a recoverer
    * stealing the claim mid-publish). Production no-op. */
  private[graft] var claimWonHook: Path => Unit = _ => ()

  private def conf(key: String): Option[String] =
    Option(SparkSession.active.conf.get(key, null))

  private def url: String = conf(JdbcClaimManifestCommitter.UrlKey).getOrElse(
    throw new IllegalStateException(
      s"${JdbcClaimManifestCommitter.UrlKey} must name the coordination " +
        "database for JdbcClaimManifestCommitter"))

  private def ttlMillis: Long =
    conf(JdbcClaimManifestCommitter.TtlKey).map(_.toLong).getOrElse(15L * 60 * 1000)

  private def ensureTable(u: String): Unit = {
    if (ensured.contains(u)) return
    val conn = DriverManager.getConnection(u)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        "CREATE TABLE graft_commit_claims (" +
          "claim_target VARCHAR(1024) PRIMARY KEY, " +
          "claim_tmp VARCHAR(1024), " +
          "claim_writer VARCHAR(64), " +
          "claim_ts BIGINT, " +
          "claim_complete SMALLINT)")
      catch {
        case e: SQLException =>
          // already-exists is the normal case after the first commit;
          // verify by probing rather than matching per-DB SQLStates
          val probe = conn.createStatement()
          try probe.executeQuery(
            "SELECT claim_target FROM graft_commit_claims WHERE 1=0")
          catch { case _: SQLException => throw e }
      }
    } finally conn.close()
    synchronized { ensured = ensured + u }
  }

  private def copy(fs: FileSystem, from: Path, to: Path): Unit = {
    val in = fs.open(from)
    val bytes =
      try {
        val b = new Array[Byte](fs.getFileStatus(from).getLen.toInt)
        in.readFully(b)
        b
      } finally in.close()
    // publish via unique-temp + rename, NEVER a direct create on the
    // final name: the claim row serializes WRITERS, but a concurrent
    // READER lists manifests freely, and on a progressive-visibility
    // filesystem (POSIX, HDFS) a direct write would let it read a
    // half-written manifest (observed: a racing OCC writer inferring an
    // empty schema from a mid-copy manifest). The rename is atomic on
    // POSIX/HDFS; on S3-class stores it is a server-side PUT-copy whose
    // target materializes complete-or-not — correct either way.
    val tmp = new Path(to.getParent,
      s".claimpub-${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    if (!fs.rename(tmp, to)) {
      // a racing recoverer published first — same bytes, healthy state
      fs.delete(tmp, false)
      if (!fs.exists(to))
        throw new java.io.IOException(s"could not publish $to")
    }
  }

  override def commit(fs: FileSystem, tmp: Path, target: Path,
                      tableRoot: String): Boolean = {
    val u = url
    ensureTable(u)
    var attempt = 0
    while (attempt < 3) {
      attempt += 1
      attemptOnce(fs, tmp, target, u) match {
        case Some(outcome) => return outcome
        case None => Thread.sleep(10) // claim churn: take another swing
      }
    }
    false // repeated claim churn: report a loss, the OCC loop re-derives
  }

  /** One pass of the claim protocol. Some(won) is a decision; None means
    * the observed claim disappeared or was a corpse we cleared — retry. */
  private def attemptOnce(fs: FileSystem, tmp: Path, target: Path,
                          u: String): Option[Boolean] = {
    val key = target.toString
    val conn = DriverManager.getConnection(u)
    try {
      val won =
        try {
          val ins = conn.prepareStatement(
            "INSERT INTO graft_commit_claims VALUES (?, ?, ?, ?, 0)")
          ins.setString(1, key); ins.setString(2, tmp.toString)
          ins.setString(3, writerId); ins.setLong(4, System.currentTimeMillis())
          ins.executeUpdate()
          true
        } catch {
          // 23505 = unique violation (SQL standard, Derby/Postgres alike)
          case e: SQLException if e.getSQLState == "23505" => false
        }
      if (won) {
        if (fs.exists(target)) {
          // a lost claims table (rebuilt DB) over an existing commit:
          // record completion, report the loss — never clobber
          markComplete(conn, key)
          return Some(false)
        }
        claimWonHook(target)
        copy(fs, tmp, target)
        // Out-of-contract stall audit: if this writer stalled past the
        // claim TTL mid-publish, a recoverer may have reclaimed its tmp
        // (vacuum), stolen the claim, and published a DIFFERENT manifest
        // — copy() above then found the thief's bytes already at target
        // and returned quietly. Acknowledging a win here would double-ack
        // the version and silently drop this writer's manifest. Only ack
        // while the claim row still names this writer; otherwise the
        // thief's commit is the real one and this is a normal loss (the
        // OCC loop re-derives and re-commits this writer's changes).
        if (!claimHeldByUs(conn, key)) return Some(false)
        markComplete(conn, key)
        fs.delete(tmp, false)
        return Some(true)
      }
      // claim exists — inspect it
      val sel = conn.prepareStatement(
        "SELECT claim_tmp, claim_ts, claim_complete FROM graft_commit_claims " +
          "WHERE claim_target = ?")
      sel.setString(1, key)
      val rs = sel.executeQuery()
      if (!rs.next()) return None // vanished since the insert: retry
      val (theirTmp, theirTs, complete) =
        (rs.getString(1), rs.getLong(2), rs.getInt(3) == 1)
      if (complete) return Some(false)
      // age < TTL covers a FUTURE-stamped claim too (negative age): a
      // claimant whose clock runs ahead is treated as live, never stolen
      // — skew delays recovery, it cannot trigger it from this side
      if (System.currentTimeMillis() - theirTs < ttlMillis) return Some(false)
      // expired incomplete claim: crashed writer. Finish its publish if
      // its staged manifest survives (its commit wins), else clear the
      // corpse and retry the insert.
      val theirTmpPath = new Path(theirTmp)
      if (fs.exists(target)) { markComplete(conn, key); return Some(false) }
      if (fs.exists(theirTmpPath)) {
        // a CONCURRENT recoverer may finish and delete theirTmp between
        // our exists-check and the copy — that is a healthy commit, not
        // an error: retry the protocol, which will observe the completed
        // claim (or the published target) and report a normal loss
        try {
          copy(fs, theirTmpPath, target)
        } catch {
          case _: java.io.FileNotFoundException => return None
        }
        markComplete(conn, key)
        fs.delete(theirTmpPath, false)
        return Some(false)
      }
      // conditional delete — only the exact corpse we inspected, never
      // a newer claim that slipped in since the SELECT
      val del = conn.prepareStatement(
        "DELETE FROM graft_commit_claims WHERE claim_target = ? " +
          "AND claim_ts = ? AND claim_complete = 0")
      del.setString(1, key); del.setLong(2, theirTs)
      del.executeUpdate()
      None
    } finally conn.close()
  }

  private def claimHeldByUs(conn: java.sql.Connection, key: String): Boolean = {
    val sel = conn.prepareStatement(
      "SELECT claim_writer FROM graft_commit_claims WHERE claim_target = ?")
    sel.setString(1, key)
    val rs = sel.executeQuery()
    rs.next() && rs.getString(1) == writerId
  }

  private def markComplete(conn: java.sql.Connection, key: String): Unit = {
    val up = conn.prepareStatement(
      "UPDATE graft_commit_claims SET claim_complete = 1 WHERE claim_target = ?")
    up.setString(1, key)
    up.executeUpdate()
    ()
  }
}

object JdbcClaimManifestCommitter {
  val UrlKey = "spark.graft.committerJdbcUrl"
  val TtlKey = "spark.graft.committerClaimTtlMillis"

  /** GC the claims table: delete COMPLETED claim rows older than
    * `retentionMillis`. A long-lived table is millions of commits — the
    * rows are tiny, but the table does not stay small on its own; this
    * is the maintenance path the class doc defers to (also exposed as
    * `CALL graft.system.vacuum_claims`). Returns the rows deleted.
    *
    * Safety invariants (spec-pinned in ManifestCommitterSpec):
    *  - INCOMPLETE claims are NEVER deleted regardless of age — an
    *    expired incomplete row is the crash record that drives
    *    finish-the-dead-writer's-commit recovery; only the committer's
    *    own conditional corpse-delete may clear one.
    *  - Completed rows younger than the retention window survive — they
    *    are the commit audit log; size the window to the audit need.
    *    Recovery is correct after any GC: once `target` exists, the
    *    protocol's `fs.exists(target)` check decides without the row. */
  def vacuumClaims(jdbcUrl: String, retentionMillis: Long): Int = {
    require(retentionMillis >= 0L,
      s"retentionMillis must be >= 0, got $retentionMillis")
    val conn = DriverManager.getConnection(jdbcUrl)
    try {
      // no claims table yet = nothing to GC (probe, don't pattern-match
      // per-DB SQLStates — same discipline as ensureTable)
      val existed =
        try {
          val probe = conn.createStatement()
          probe.executeQuery(
            "SELECT claim_target FROM graft_commit_claims WHERE 1=0")
          true
        } catch { case _: SQLException => false }
      if (!existed) 0
      else {
        val del = conn.prepareStatement(
          "DELETE FROM graft_commit_claims " +
            "WHERE claim_complete = 1 AND claim_ts < ?")
        del.setLong(1, System.currentTimeMillis() - retentionMillis)
        del.executeUpdate()
      }
    } finally conn.close()
  }
}
