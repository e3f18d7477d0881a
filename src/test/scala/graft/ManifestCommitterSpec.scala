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
