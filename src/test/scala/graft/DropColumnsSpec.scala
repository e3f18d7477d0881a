package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Metadata-only DROP COLUMN, two eras:
  *
  *  - MAPPED tables (field-id column mapping, the default): no
  *    tombstones at all — a re-added name takes a FRESH field id, so old
  *    files' values answer to a retired id and read as null; re-adding
  *    is allowed and safe by construction.
  *  - LEGACY tables (`spark.graft.columnMapping=false`, or created
  *    before the feature): files match by NAME, so a `#dropped=`
  *    tombstone blocks re-adding the name until a replace commit
  *    rewrites the files.
  */
class DropColumnsSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dropcol").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def legacy[A](f: => A): A = {
    spark.conf.set("spark.graft.columnMapping", "false")
    try f finally spark.conf.unset("spark.graft.columnMapping")
  }

  test("mapped: drop is metadata-only; data never surfaces; re-add reads null") {
    val root = tmpRoot()
    Versioned.commit(spark,
      Seq((1L, "a", "s1"), (2L, "b", "s2")).toDF("id", "k", "secret").coalesce(1),
      root, statsCols = Seq("id"))
    val filesBefore = manifestOf(root, 1L)
    assert(Versioned.dropColumns(spark, root, Seq("secret")) == 2L)
    // no file rewritten; the column is gone from every read surface
    assert(manifestOf(root, 2L) == filesBefore)
    assert(Versioned.read(spark, root).columns.toSeq == Seq("id", "k"))
    assert(spark.read.format("graft-versioned").load(root)
      .columns.toSeq == Seq("id", "k"))
    // time travel to the pre-drop version still shows it
    assert(Versioned.read(spark, root, asOf = Some(1L)).columns.contains("secret"))
    // later appends keep the narrow schema; NO tombstone exists (the
    // retired field id is the guard on mapped tables)
    Versioned.commit(spark, Seq((3L, "c")).toDF("id", "k"), root)
    assert(Versioned.read(spark, root).columns.toSeq == Seq("id", "k"))
    assert(Versioned.droppedColumns(spark, root).isEmpty)
    // re-adding the name is ALLOWED: the fresh id makes old values
    // unreachable — rows from pre-drop files read null, never s1/s2
    Versioned.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("secret",
        org.apache.spark.sql.types.StringType)))
    assert(Versioned.read(spark, root).select("id", "secret")
      .as[(Long, Option[String])].collect().toSet ==
      Set((1L, None), (2L, None), (3L, None)))
    // values written under the re-added name surface only for new rows —
    // through the evolution path, the OCC path, and the merge path alike
    Versioned.commit(spark, Seq((4L, "d", "boo")).toDF("id", "k", "secret"), root)
    Versioned.commitOcc(spark, Seq((5L, "e", "occ")).toDF("id", "k", "secret"), root)
    Versioned.mergeInto(spark, root,
      Seq((6L, "f", "mrg")).toDF("id", "k", "secret"), Seq("id"),
      schemaEvolution = true)
    assert(Versioned.read(spark, root).select("id", "secret")
      .as[(Long, Option[String])].collect().toSet ==
      Set((1L, None), (2L, None), (3L, None),
        (4L, Some("boo")), (5L, Some("occ")), (6L, Some("mrg"))))
  }

  test("mapped: stale sidecar stats never power a whole-file delete after re-add") {
    // the severe arm of the identity-unstable-name hazard: the sidecar
    // still says (nulls=0, min 5, max 7) for 'a', but after drop +
    // re-add the column reads NULL from the old file — a stats-proven
    // all-match DELETE would destroy rows SQL says must survive
    val root = tmpRoot()
    Versioned.commit(spark,
      Seq((1L, 5.0), (2L, 7.0)).toDF("id", "a").coalesce(1),
      root, statsCols = Seq("a", "id"))
    Versioned.dropColumns(spark, root, Seq("a"))
    assert(Versioned.statsDeadColumns(spark, root) == Set("a"))
    Versioned.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.DoubleType)))
    Versioned.deleteWhere(spark, root, col("a") >= 0.0)
    assert(Versioned.read(spark, root).count() == 2,
      "stats-proven delete destroyed rows whose actual value is null")
    // a full rewrite re-harvests sidecars and sheds the marker
    Versioned.compactLatest(spark, root, nFiles = 1)
    assert(Versioned.statsDeadColumns(spark, root).isEmpty)
  }

  test("legacy: tombstone blocks re-add until a replace sheds it") {
    val root = tmpRoot()
    legacy {
      Versioned.commit(spark,
        Seq((1L, "a", 9.5), (2L, "b", 8.5)).toDF("id", "k", "secret").coalesce(1),
        root, statsCols = Seq("id"))
      assert(Versioned.dropColumns(spark, root, Seq("secret")) == 2L)
      Versioned.commit(spark, Seq((3L, "c")).toDF("id", "k"), root)
      assert(Versioned.droppedColumns(spark, root) == Set("secret"))
      // re-adding the name refuses (old values would resurrect, not null)
      val e1 = intercept[IllegalArgumentException] {
        Versioned.addColumns(spark, root, Seq(
          org.apache.spark.sql.types.StructField("secret",
            org.apache.spark.sql.types.StringType)))
      }
      assert(e1.getMessage.contains("resurrect"))
      // an append smuggling the name through schema evolution refuses too
      val e2 = intercept[IllegalArgumentException] {
        Versioned.commit(spark, Seq((4L, "d", "boo")).toDF("id", "k", "secret"), root)
      }
      assert(e2.getMessage.contains("resurrect"))
      // OCC append: same gate
      val e3 = intercept[IllegalArgumentException] {
        Versioned.commitOcc(spark, Seq((4L, "d", "boo")).toDF("id", "k", "secret"), root)
      }
      assert(e3.getMessage.contains("resurrect"))
      // merge WITH schema evolution: same gate through commitMixed
      val e4 = intercept[IllegalArgumentException] {
        Versioned.mergeInto(spark, root,
          Seq((1L, "a2", "boo")).toDF("id", "k", "secret"), Seq("id"),
          schemaEvolution = true)
      }
      assert(e4.getMessage.contains("resurrect"))
      // a REPLACE stops referencing the old files: tombstone sheds, the
      // name is usable again with fresh data
      Versioned.commit(spark, Seq((9L, "z", "fresh")).toDF("id", "k", "secret"),
        root, replace = true)
      assert(Versioned.droppedColumns(spark, root).isEmpty)
      assert(Versioned.read(spark, root).select("secret").as[String].collect()
        .toSeq == Seq("fresh"))
    }
  }

  test("drop refuses unknown columns, full-schema drops, and checked columns") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, 5.0)).toDF("id", "x"), root)
    intercept[IllegalArgumentException](
      Versioned.dropColumns(spark, root, Seq("nope")))
    intercept[IllegalArgumentException](
      Versioned.dropColumns(spark, root, Seq("id", "x")))
    Versioned.addConstraint(spark, root, "x_pos", "x > 0")
    val e = intercept[IllegalArgumentException](
      Versioned.dropColumns(spark, root, Seq("x")))
    assert(e.getMessage.contains("x_pos"))
    Versioned.dropConstraint(spark, root, "x_pos")
    // backtick-quoted references count too (`x` is how special-cased
    // names are written in CHECK expressions)
    Versioned.addConstraint(spark, root, "x_bt", "`x` > 0")
    val eBt = intercept[IllegalArgumentException](
      Versioned.dropColumns(spark, root, Seq("x")))
    assert(eBt.getMessage.contains("x_bt"))
    Versioned.dropConstraint(spark, root, "x_bt")
    assert(Versioned.dropColumns(spark, root, Seq("x")) > 0)
    assert(Versioned.read(spark, root).columns.toSeq == Seq("id"))
  }

  test("legacy tombstones survive restore/clone/compaction; history labels the drop") {
    val root = tmpRoot()
    legacy {
      Versioned.commit(spark, Seq((1L, "s1", "k1")).toDF("id", "sec", "k"), root)
      Versioned.dropColumns(spark, root, Seq("sec"))
      Versioned.commit(spark, Seq((2L, "k2")).toDF("id", "k"), root)
      // incremental compaction carries old files -> tombstone must survive
      Versioned.compactSmall(spark, root)
      assert(Versioned.droppedColumns(spark, root) == Set("sec"))
      // clone inherits the clone point's tombstones
      val dst = tmpRoot() + "_clone"
      Versioned.cloneTable(spark, root, dst)
      assert(Versioned.droppedColumns(spark, dst) == Set("sec"))
      // restore to the PRE-drop snapshot restores the column and ITS
      // (empty) tombstone set — the files legitimately carry the data there
      Versioned.restore(spark, root, 1L)
      assert(Versioned.droppedColumns(spark, root).isEmpty)
      assert(Versioned.read(spark, root).columns.contains("sec"))
      val ops = Versioned.history(spark, root).orderBy("version")
        .select("operation").as[String].collect().toSeq
      assert(ops == Seq("append", "drop_columns", "append", "compact", "restore"),
        s"got $ops")
    }
  }

  test("SQL surfaces: ALTER TABLE DROP COLUMN and CALL drop_columns") {
    val wh = java.nio.file.Files.createTempDirectory("graft_dropcol_wh").toFile
    wh.deleteOnExit()
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_dc", "graft.io.VersionedCatalog")
    s.conf.set("spark.sql.catalog.graft_dc.warehouse", wh.getAbsolutePath)
    s.sql("CREATE TABLE graft_dc.ns.t (id BIGINT, k STRING, sec STRING)")
    s.sql("INSERT INTO graft_dc.ns.t VALUES (1, 'a', 'x')")
    s.sql("ALTER TABLE graft_dc.ns.t DROP COLUMN sec")
    assert(s.table("graft_dc.ns.t").columns.toSeq == Seq("id", "k"))
    // catalog tables are MAPPED: re-adding the dropped name is allowed,
    // and the old row reads null under the fresh field id, never 'x'
    s.sql("ALTER TABLE graft_dc.ns.t ADD COLUMNS (sec STRING)")
    assert(s.sql("SELECT id, sec FROM graft_dc.ns.t").collect().toSeq
      .map(r => (r.getLong(0), Option(r.getString(1)))) == Seq((1L, None)))
    // the procedure form on a second column
    s.sql("CALL graft_dc.system.drop_columns('ns.t', 'k')")
    assert(s.table("graft_dc.ns.t").columns.toSeq == Seq("id", "sec"))
    // IF EXISTS on a missing column is a silent no-op, not a refusal
    s.sql("ALTER TABLE graft_dc.ns.t DROP COLUMN IF EXISTS nope")
    assert(s.table("graft_dc.ns.t").columns.toSeq == Seq("id", "sec"))
    // without IF EXISTS the analyzer itself refuses the unknown name
    intercept[Exception](
      s.sql("ALTER TABLE graft_dc.ns.t DROP COLUMN nope"))
  }
}
