package graft

import graft.io.{ManifestCommitter, Versioned}

/** The pluggable manifest-commit hook ([[ManifestCommitter]]): the one
  * filesystem operation the lake trusts for writer coordination. The
  * default rename committer must refuse an existing target; a custom
  * committer named via `spark.graft.manifestCommitter` must receive
  * every publish (the S3-class-store escape hatch — Delta LogStore is
  * the public prior art for why rename alone is not enough there). */
class ManifestCommitterSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("default committer: create-if-absent, refuses an existing target") {
    val root = tmpDir("graft_mc_default")
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "v"), root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mdir = new org.apache.hadoop.fs.Path(root, "_manifests")
    val committer = new graft.io.RenameManifestCommitter
    val tmp = new org.apache.hadoop.fs.Path(mdir, ".race.txt.tmp")
    val out = fs.create(tmp, true)
    try out.write("data/b9/x.parquet\n".getBytes("UTF-8")) finally out.close()
    // target v1.txt exists -> must lose, and must NOT replace the manifest
    val before = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_manifests", "v1.txt")), "UTF-8")
    assert(!committer.commit(fs, tmp,
      new org.apache.hadoop.fs.Path(mdir, "v1.txt"), root))
    val after = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_manifests", "v1.txt")), "UTF-8")
    assert(after == before, "a losing commit must never clobber the manifest")
    // fresh target -> wins exactly once
    val t2 = new org.apache.hadoop.fs.Path(mdir, "probe.txt")
    assert(committer.commit(fs, tmp, t2, root))
    assert(fs.exists(t2))
    fs.delete(t2, false)
  }

  test("a configured committer receives every publish") {
    TestRecordingCommitter.reset()
    spark.conf.set(ManifestCommitter.ConfKey,
      classOf[TestRecordingCommitter].getName)
    try {
      val root = tmpDir("graft_mc_custom")
      Versioned.commit(spark, Seq((1L, "a")).toDF("id", "v"), root)
      Versioned.commit(spark, Seq((2L, "b")).toDF("id", "v"), root)
      Versioned.deleteWhereDv(spark, root,
        org.apache.spark.sql.functions.col("id") === 1L)
      assert(TestRecordingCommitter.published.size == 3,
        s"expected 3 publishes, saw ${TestRecordingCommitter.published}")
      assert(TestRecordingCommitter.published.map(_.getName) ==
        Seq("v1.txt", "v2.txt", "v3.txt"))
      assert(Versioned.read(spark, root).count() == 1)
    } finally spark.conf.unset(ManifestCommitter.ConfKey)
  }

  // ---- object-store committers (the S3-class plug-ins) -------------------

  private def hfs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stage(root: String, name: String, body: String) = {
    val fs = hfs(root)
    val p = new org.apache.hadoop.fs.Path(root, name)
    val out = fs.create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    p
  }

  private def readAll(root: String, p: org.apache.hadoop.fs.Path): String = {
    val fs = hfs(root)
    val in = fs.open(p)
    try {
      val b = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(b)
      new String(b, "UTF-8")
    } finally in.close()
  }

  test("conditional-put committer: wins once, loses on existing, consumes tmp") {
    val root = tmpDir("graft_mc_cput")
    val c = new graft.io.ConditionalPutManifestCommitter
    val fs = hfs(root)
    val target = new org.apache.hadoop.fs.Path(root, "v1.txt")
    val t1 = stage(root, ".a.tmp", "winner\n")
    assert(c.commit(fs, t1, target, root))
    assert(readAll(root, target) == "winner\n")
    assert(!fs.exists(t1), "winning commit must consume its tmp")
    val t2 = stage(root, ".b.tmp", "loser\n")
    assert(!c.commit(fs, t2, target, root))
    assert(readAll(root, target) == "winner\n", "loser must never clobber")
    assert(fs.exists(t2), "losing tmp is the caller's to delete")
  }

  private def withJdbcCommitter[A](db: String)(f: => A): A = {
    spark.conf.set(ManifestCommitter.ConfKey,
      classOf[graft.io.JdbcClaimManifestCommitter].getName)
    spark.conf.set(graft.io.JdbcClaimManifestCommitter.UrlKey,
      s"jdbc:derby:memory:$db;create=true")
    try f
    finally {
      spark.conf.unset(ManifestCommitter.ConfKey)
      spark.conf.unset(graft.io.JdbcClaimManifestCommitter.UrlKey)
      spark.conf.unset(graft.io.JdbcClaimManifestCommitter.TtlKey)
    }
  }

  test("jdbc claim committer: two racing writers serialize — one wins, no corruption") {
    val root = tmpDir("graft_mc_jdbc_race")
    withJdbcCommitter("graft_claims_race") {
      // TWO committer instances (distinct writer ids, no shared JVM
      // state beyond the database) — the cross-process shape, as close
      // as one test JVM can get
      val cA = new graft.io.JdbcClaimManifestCommitter
      val cB = new graft.io.JdbcClaimManifestCommitter
      val fs = hfs(root)
      val target = new org.apache.hadoop.fs.Path(root, "v1.txt")
      // many rounds of a genuine two-thread race through the NON-atomic
      // path: exactly one winner each round, content always exactly one
      // staged body, never interleaved bytes
      (1 to 8).foreach { round =>
        val t = new org.apache.hadoop.fs.Path(root, s"v$round.txt")
        val ta = stage(root, s".a$round.tmp", s"body-A-$round\n")
        val tb = stage(root, s".b$round.tmp", s"body-B-$round\n")
        val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
        val gate = new java.util.concurrent.CountDownLatch(1)
        def racer(c: graft.io.JdbcClaimManifestCommitter,
                  tmp: org.apache.hadoop.fs.Path) =
          pool.submit(new java.util.concurrent.Callable[Boolean] {
            def call(): Boolean = { gate.await(); c.commit(fs, tmp, t, root) }
          })
        val (fa, fb) = (racer(cA, ta), racer(cB, tb))
        gate.countDown()
        val (wa, wb) = (fa.get(), fb.get())
        pool.shutdown()
        assert(wa ^ wb, s"round $round: exactly one writer must win ($wa, $wb)")
        val got = readAll(root, t)
        val expected = if (wa) s"body-A-$round\n" else s"body-B-$round\n"
        assert(got == expected, s"round $round: target holds $got")
      }
      assert(!cA.commit(fs, stage(root, ".late.tmp", "late\n"), target, root),
        "a completed claim must refuse forever")
    }
  }

  test("jdbc claim committer: an expired incomplete claim is recovered, not corrupted") {
    val root = tmpDir("graft_mc_jdbc_rec")
    val url = "jdbc:derby:memory:graft_claims_rec;create=true"
    withJdbcCommitter("graft_claims_rec") {
      spark.conf.set(graft.io.JdbcClaimManifestCommitter.TtlKey, "0")
      val c = new graft.io.JdbcClaimManifestCommitter
      val fs = hfs(root)
      // simulate writer-1 crashing between its claim INSERT and the copy:
      // the claim row exists, its staged tmp exists, target does not
      val target = new org.apache.hadoop.fs.Path(root, "v1.txt")
      val deadTmp = stage(root, ".dead.tmp", "dead-writer-manifest\n")
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.executeUpdate(
          "CREATE TABLE graft_commit_claims (claim_target VARCHAR(1024) PRIMARY KEY, " +
            "claim_tmp VARCHAR(1024), claim_writer VARCHAR(64), claim_ts BIGINT, " +
            "claim_complete SMALLINT)")
        catch { case _: java.sql.SQLException => () }
        val ins = conn.prepareStatement(
          "INSERT INTO graft_commit_claims VALUES (?, ?, ?, ?, 0)")
        ins.setString(1, target.toString); ins.setString(2, deadTmp.toString)
        ins.setString(3, "dead-writer"); ins.setLong(4, 1L)
        ins.executeUpdate()
      } finally conn.close()
      // a later writer must LOSE (the dead writer's commit is completed
      // for it — Delta's recovery semantics), and target carries the dead
      // writer's content, not the new writer's
      val mine = stage(root, ".mine.tmp", "my-manifest\n")
      assert(!c.commit(fs, mine, target, root))
      assert(readAll(root, target) == "dead-writer-manifest\n")
      // crashed BEFORE staging anything: corpse claim with no tmp, no
      // target — the next writer steals the claim and wins
      val t2 = new org.apache.hadoop.fs.Path(root, "v2.txt")
      val conn2 = java.sql.DriverManager.getConnection(url)
      try {
        val ins2 = conn2.prepareStatement(
          "INSERT INTO graft_commit_claims VALUES (?, ?, ?, ?, 0)")
        ins2.setString(1, t2.toString)
        ins2.setString(2, new org.apache.hadoop.fs.Path(root, ".gone.tmp").toString)
        ins2.setString(3, "dead-writer"); ins2.setLong(4, 1L)
        ins2.executeUpdate()
      } finally conn2.close()
      val mine2 = stage(root, ".mine2.tmp", "stolen-claim-win\n")
      assert(c.commit(fs, mine2, t2, root))
      assert(readAll(root, t2) == "stolen-claim-win\n")
    }
  }

  test("a future-stamped claim is live, never stolen (clock skew)") {
    // TTL 0 = everything past-stamped is expired — but a claimant whose
    // clock runs AHEAD must still be treated as live: skew may delay
    // recovery, it must never trigger it
    val root = tmpDir("graft_mc_jdbc_skew")
    val url = "jdbc:derby:memory:graft_claims_skew;create=true"
    withJdbcCommitter("graft_claims_skew") {
      spark.conf.set(graft.io.JdbcClaimManifestCommitter.TtlKey, "0")
      val c = new graft.io.JdbcClaimManifestCommitter
      val fs = hfs(root)
      val target = new org.apache.hadoop.fs.Path(root, "v1.txt")
      val futureTs = System.currentTimeMillis() + 60L * 60 * 1000
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.executeUpdate(
          "CREATE TABLE graft_commit_claims (claim_target VARCHAR(1024) PRIMARY KEY, " +
            "claim_tmp VARCHAR(1024), claim_writer VARCHAR(64), claim_ts BIGINT, " +
            "claim_complete SMALLINT)")
        catch { case _: java.sql.SQLException => () }
        val ins = conn.prepareStatement(
          "INSERT INTO graft_commit_claims VALUES (?, ?, ?, ?, 0)")
        ins.setString(1, target.toString)
        ins.setString(2, new org.apache.hadoop.fs.Path(root, ".ahead.tmp").toString)
        ins.setString(3, "skewed-writer"); ins.setLong(4, futureTs)
        ins.executeUpdate()
      } finally conn.close()
      val mine = stage(root, ".mine.tmp", "my-manifest\n")
      assert(!c.commit(fs, mine, target, root),
        "a future-stamped incomplete claim must read as LIVE, a normal loss")
      assert(!fs.exists(target), "no recovery may run against a live claim")
      val conn2 = java.sql.DriverManager.getConnection(url)
      try {
        val rs = conn2.createStatement().executeQuery(
          s"SELECT claim_writer, claim_complete FROM graft_commit_claims " +
            s"WHERE claim_target = '${target.toString}'")
        assert(rs.next())
        assert(rs.getString(1) == "skewed-writer" && rs.getInt(2) == 0,
          "the skewed claim row must survive untouched")
      } finally conn2.close()
    }
  }

  test("a claim stolen mid-publish is reported as a loss, never double-acked") {
    // The out-of-contract stall: writer A claims, stalls past the TTL,
    // its tmp is vacuumed, a recoverer steals the claim and publishes a
    // DIFFERENT manifest. When A resumes, its copy finds the thief's
    // bytes at target — A must report a LOSS (the pre-fix behavior
    // acked a win, silently dropping A's acknowledged manifest).
    val root = tmpDir("graft_mc_jdbc_steal")
    val url = "jdbc:derby:memory:graft_claims_steal;create=true"
    withJdbcCommitter("graft_claims_steal") {
      val cA = new graft.io.JdbcClaimManifestCommitter
      val fs = hfs(root)
      val target = new org.apache.hadoop.fs.Path(root, "v1.txt")
      val stolen = new java.util.concurrent.atomic.AtomicBoolean(false)
      cA.claimWonHook = { t =>
        if (stolen.compareAndSet(false, true)) {
          // the thief: replace A's claim row with its own COMPLETED one
          // and publish its manifest — exactly what a recoverer that
          // stole the expired claim leaves behind
          val conn = java.sql.DriverManager.getConnection(url)
          try {
            conn.createStatement().executeUpdate(
              s"DELETE FROM graft_commit_claims WHERE claim_target = '${t.toString}'")
            val ins = conn.prepareStatement(
              "INSERT INTO graft_commit_claims VALUES (?, ?, ?, ?, 1)")
            ins.setString(1, t.toString)
            ins.setString(2, new org.apache.hadoop.fs.Path(root, ".thief.tmp").toString)
            ins.setString(3, "thief-writer")
            ins.setLong(4, System.currentTimeMillis())
            ins.executeUpdate()
          } finally conn.close()
          val out = fs.create(t, true)
          try out.write("thief-manifest\n".getBytes("UTF-8")) finally out.close()
        }
      }
      val mine = stage(root, ".mine.tmp", "my-manifest\n")
      assert(!cA.commit(fs, mine, target, root),
        "a writer whose claim changed hands mid-publish must report a loss")
      assert(readAll(root, target) == "thief-manifest\n",
        "the thief's acknowledged manifest must survive")
    }
  }

  test("vacuumClaims: completed rows past retention go, everything else survives") {
    val url = "jdbc:derby:memory:graft_claims_gc;create=true"
    val root = tmpDir("graft_mc_jdbc_gc")
    withJdbcCommitter("graft_claims_gc") {
      val c = new graft.io.JdbcClaimManifestCommitter
      val fs = hfs(root)
      // a real completed commit (old), then hand-planted rows for the
      // survival cases: a YOUNG completed row and an OLD incomplete one
      val target = new org.apache.hadoop.fs.Path(root, "v1.txt")
      assert(c.commit(fs, stage(root, ".one.tmp", "one\n"), target, root))
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        // age the real commit's row past any retention we test with
        st.executeUpdate(
          s"UPDATE graft_commit_claims SET claim_ts = 1 " +
            s"WHERE claim_target = '${target.toString}'")
        val ins = conn.prepareStatement(
          "INSERT INTO graft_commit_claims VALUES (?, ?, ?, ?, ?)")
        def plant(t: String, ts: Long, complete: Int): Unit = {
          ins.setString(1, t); ins.setString(2, s"$t.tmp")
          ins.setString(3, "w"); ins.setLong(4, ts); ins.setInt(5, complete)
          ins.executeUpdate(); ()
        }
        plant("young-complete", System.currentTimeMillis(), 1)
        plant("old-incomplete", 1L, 0)
      } finally conn.close()
      val deleted = graft.io.JdbcClaimManifestCommitter
        .vacuumClaims(url, retentionMillis = 60L * 1000)
      assert(deleted == 1, s"exactly the old completed row goes, got $deleted")
      val conn2 = java.sql.DriverManager.getConnection(url)
      try {
        val rs = conn2.createStatement().executeQuery(
          "SELECT claim_target FROM graft_commit_claims ORDER BY claim_target")
        val left = Iterator.continually(rs)
          .takeWhile(_.next()).map(_.getString(1)).toList
        assert(left == List("old-incomplete", "young-complete"),
          s"survivors must be the incomplete + young rows, got $left")
      } finally conn2.close()
      // recovery stays correct after GC: with the completed row gone, a
      // late writer re-claims the target fresh — and must still LOSE to
      // the existing manifest, never clobber it
      assert(!c.commit(fs, stage(root, ".late.tmp", "late\n"), target, root),
        "post-GC re-claim of a published target must lose")
      assert(readAll(root, target) == "one\n")
      // GC on a database with no claims table is a quiet no-op
      assert(graft.io.JdbcClaimManifestCommitter.vacuumClaims(
        "jdbc:derby:memory:graft_claims_gc_absent;create=true", 0L) == 0)
    }
  }

  test("vacuum honors the claim TTL for manifest-dir staging debris") {
    // ADVICE r11: a default vacuum (graceMillis = 0) must not reclaim a
    // .tmp younger than the claim TTL while the jdbc committer is
    // configured — a crashed writer's recorded tmp IS the recovery
    // payload until its claim expires
    val root = tmpDir("graft_mc_vac_ttl")
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "v"), root)
    val fs = hfs(root)
    val mdir = new org.apache.hadoop.fs.Path(root, "_manifests")
    val debris = new org.apache.hadoop.fs.Path(mdir, ".claimpub-test.tmp")
    val out = fs.create(debris, true)
    try out.write("staged\n".getBytes("UTF-8")) finally out.close()
    withJdbcCommitter("graft_claims_vac") {
      spark.conf.set(graft.io.JdbcClaimManifestCommitter.TtlKey,
        (60L * 60 * 1000).toString)
      Versioned.vacuum(spark, root)
      assert(fs.exists(debris),
        "a within-TTL tmp must survive a default vacuum under the jdbc committer")
    }
    // committer unset: the plain grace rule applies and the debris goes
    Versioned.vacuum(spark, root)
    assert(!fs.exists(debris),
      "without the jdbc committer the default grace reclaims the debris")
  }

  test("three racing OCC writers publish a correct table under the conditional-put committer") {
    // The jdbc committer's end-to-end treatment, for the conditional-PUT
    // plug-in — run against a filesystem that FAITHFULLY models a
    // conditional-PUT store. Plain local-FS create-no-overwrite is NOT
    // that model: its files are visible EMPTY while being written
    // (progressive visibility), and a racing OCC reader really did
    // observe a zero-byte manifest mid-create when this leg first ran on
    // it (UNABLE_TO_INFER_SCHEMA from an empty file list) — exactly the
    // hazard the committer's own contract names when it says to keep the
    // rename committer on such filesystems. [[ConditionalPutTestFs]]
    // gives no-overwrite creates S3-conditional-PUT semantics instead:
    // bytes buffer off-disk, the object materializes complete at close
    // or not at all, and the precondition is checked at close.
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.cput.impl", classOf[ConditionalPutTestFs].getName)
    spark.conf.set(ManifestCommitter.ConfKey,
      classOf[graft.io.ConditionalPutManifestCommitter].getName)
    try {
      (1 to 2).foreach { round =>
        val root = "cput:" + tmpDir(s"graft_mc_cput_occ$round") + "/t"
        val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
        val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
        val gate = new java.util.concurrent.CountDownLatch(1)
        try {
          val futs = (0 to 2).map { m =>
            pool.submit(new java.util.concurrent.Callable[Long] {
              def call(): Long = {
                gate.await()
                Versioned.commitOcc(spark,
                  orders.filter(org.apache.spark.sql.functions.pmod(
                    org.apache.spark.sql.functions.col("o_orderkey"),
                    org.apache.spark.sql.functions.lit(3)) === m), root)
              }
            })
          }
          gate.countDown()
          val published = futs.map { fu =>
            try fu.get(300, java.util.concurrent.TimeUnit.SECONDS)
            catch { case e: java.util.concurrent.ExecutionException =>
              e.getCause.printStackTrace(); throw e }
          }
          assert(published.sorted == Seq(1L, 2L, 3L),
            s"round $round: three racing appends must publish v1..v3, got $published")
        } finally pool.shutdownNow()
        assert(Versioned.read(spark, root).count() == orders.count(),
          s"round $round: the union of the three racing appends must survive")
      }
    } finally {
      spark.conf.unset(ManifestCommitter.ConfKey)
      hconf.unset("fs.cput.impl")
    }
  }

  test("three racing OCC writers publish a correct table under the jdbc committer") {
    // the versioned_occ oracle query end-to-end with every manifest
    // publish routed through the external-coordination committer: final
    // snapshot must equal the sequential snapshot's aggregate exactly
    withJdbcCommitter("graft_claims_e2e") {
      val sf = "/root/testdata/sf0.001"
      val viaJdbc = graft.queries.VersionedQueries
        .queries("versioned_occ")(spark, sf)
        .orderBy("status", "priority").collect().toSeq
      assert(viaJdbc.nonEmpty)
      val plain = graft.queries.VersionedQueries
        .queries("versioned_snapshot")(spark, sf)
        .orderBy("status", "priority").collect().toSeq
      assert(viaJdbc == plain,
        "OCC under the jdbc committer must produce the sequential snapshot")
    }
  }
}

/** Local filesystem with S3-CONDITIONAL-PUT create semantics, for
  * end-to-end tests of [[graft.io.ConditionalPutManifestCommitter]]:
  * a no-overwrite create buffers its bytes off-disk and the object
  * materializes COMPLETE at close() — after an atomic if-absent check —
  * or not at all. That is the visibility model S3's `If-None-Match: *`
  * / GCS `ifGenerationMatch=0` actually provide, and the one plain
  * local-FS create lacks (its files list EMPTY while being written,
  * which lets a racing manifest reader see a torn snapshot — observed
  * live before this shim existed). Overwriting creates (parquet task
  * files, staged tmps) pass straight through. Scheme: `cput:`. */
class ConditionalPutTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.{FSDataOutputStream, Path => HPath}

  override def getScheme: String = "cput"
  override def getUri: java.net.URI = java.net.URI.create("cput:///")

  // BOTH public create overloads must funnel here: RawLocalFileSystem
  // overrides the (Path, boolean, ...) one directly, so intercepting
  // only the FsPermission form leaves FileSystem.create(path, false) —
  // the exact call the committer makes — on plain local semantics (the
  // shim's first draft did, and the races leaked straight through:
  // torn manifest reads and a lost writer's files).
  private def atomicCreate(f: HPath): FSDataOutputStream = {
    val self = this
    val buf = new java.io.ByteArrayOutputStream()
    new FSDataOutputStream(new java.io.OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = ConditionalPutTestFs.lock.synchronized {
        // precondition evaluated at completion, atomically vs other
        // closers (single JVM == single store endpoint in this model)
        if (self.exists(f))
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"$f: precondition failed (object exists)")
        val tmp = new HPath(f.getParent,
          s".cputstage-${java.util.UUID.randomUUID.toString.take(8)}")
        val out = self.create(tmp, true)
        try out.write(buf.toByteArray) finally out.close()
        if (!self.rename(tmp, f)) {
          self.delete(tmp, false)
          throw new java.io.IOException(s"could not materialize $f")
        }
      }
    }, null)
  }

  override def create(f: HPath, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable): FSDataOutputStream =
    if (overwrite) super.create(f, true, bufferSize, replication, blockSize, progress)
    else atomicCreate(f)

  override def create(f: HPath,
                      permission: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable): FSDataOutputStream =
    if (overwrite)
      super.create(f, permission, true, bufferSize, replication,
        blockSize, progress)
    else atomicCreate(f)
}

object ConditionalPutTestFs {
  val lock = new Object
}

/** Test double: delegates to the default rename protocol but records
  * each target — proves the conf-keyed plug point carries ALL publish
  * paths (append, DV delete), not just plain commits. */
class TestRecordingCommitter extends ManifestCommitter {
  private val inner = new graft.io.RenameManifestCommitter
  override def commit(fs: org.apache.hadoop.fs.FileSystem,
                      tmp: org.apache.hadoop.fs.Path,
                      target: org.apache.hadoop.fs.Path,
                      tableRoot: String): Boolean = {
    TestRecordingCommitter.published.synchronized {
      TestRecordingCommitter.published += target
    }
    inner.commit(fs, tmp, target, tableRoot)
  }
}

object TestRecordingCommitter {
  val published =
    scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
  def reset(): Unit = published.synchronized(published.clear())
}
