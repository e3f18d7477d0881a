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
