package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Commit-time CHECK constraints on [[Versioned]] tables — write-time
  * data contracts: named SQL expressions recorded in the manifest
  * (metadata-only commits), enforced BEFORE any data write on every
  * append/replace/merge/update batch, with SQL CHECK semantics (NULL
  * passes). Adding a constraint validates the existing snapshot first;
  * restore restores the target version's constraint set; violating
  * commits must leave no debris.
  */
class ConstraintSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_check").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("violating append aborts with nothing published and no debris") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x"), root)
    val v = Versioned.addConstraint(spark, root, "x_positive", "x > 0")
    assert(v == 2L) // metadata-only commit
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(spark, Seq((3L, -1.0)).toDF("id", "x"), root)
    }
    assert(e.getMessage.contains("x_positive"))
    assert(Versioned.versions(spark, root) == Seq(1L, 2L))
    // the rejected batch is validated as WRITTEN files (one evaluation —
    // a non-deterministic source cannot slip violations past a pre-write
    // check) and then discarded: no batch dir survives
    assert(!new java.io.File(root, "data/b3").exists())
    Versioned.commit(spark, Seq((3L, 1.0)).toDF("id", "x"), root)
    assert(Versioned.read(spark, root).count() == 3)
  }

  test("a case-variant batch column is the SAME column: checked and folded") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, 10.0)).toDF("id", "x"), root)
    Versioned.addConstraint(spark, root, "x_positive", "x > 0")
    // batch spells the column "X": same column (Spark's case-insensitive
    // resolution), so the check must still catch the violation...
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(spark, Seq((2L, -1.0)).toDF("id", "X"), root)
    }
    assert(e.getMessage.contains("x_positive"))
    // ...and a valid case-variant batch folds into the recorded spelling
    Versioned.commit(spark, Seq((2L, 2.0)).toDF("id", "X"), root)
    val schema = Versioned.read(spark, root).schema
    assert(schema.fieldNames.toSeq == Seq("id", "x"), "no dual x/X schema")
    assert(Versioned.read(spark, root).count() == 2)
  }

  test("compaction skips CHECK re-validation (rows valid by induction)") {
    val root = tmpRoot()
    Versioned.commit(spark, (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "x")
      .repartition(4), root)
    Versioned.addConstraint(spark, root, "x_positive", "x > 0")
    // compactLatest routes commit(replace = true) — with validation it
    // would re-scan the table; it must still succeed and stay valid
    Versioned.compactLatest(spark, root, nFiles = 1, sortCols = Seq("id"))
    assert(Versioned.read(spark, root).count() == 100)
    assert(Versioned.constraints(spark, root)
      == Seq(("x_positive", "x > 0"))) // constraint survives the rewrite
  }

  test("adding a constraint existing rows violate is refused") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, -5.0)).toDF("id", "x"), root)
    val e = intercept[IllegalArgumentException] {
      Versioned.addConstraint(spark, root, "x_positive", "x > 0")
    }
    assert(e.getMessage.contains("existing rows violate"))
    assert(Versioned.constraints(spark, root).isEmpty)
  }

  test("NULL passes (SQL CHECK); a batch missing the checked column passes") {
    val root = tmpRoot()
    Versioned.commit(spark,
      Seq((1L, Some(10.0)), (2L, None)).toDF("id", "x"), root)
    Versioned.addConstraint(spark, root, "x_positive", "x > 0")
    // null x passes the check
    Versioned.commit(spark,
      Seq((3L, None: Option[Double])).toDF("id", "x"), root)
    // a batch OMITTING x entirely (additive evolution) reads null: passes
    Versioned.commit(spark, Seq(Tuple1(4L)).toDF("id"), root)
    assert(Versioned.read(spark, root).count() == 4)
  }

  test("UPDATE and MERGE batches are checked; DELETE survivors pass") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "x")
      .coalesce(1), root)
    Versioned.addConstraint(spark, root, "x_positive", "x > 0")
    val e = intercept[IllegalArgumentException] {
      Versioned.updateWhere(spark, root, col("id") === 1L,
        Map("x" -> lit(-9.0)))
    }
    assert(e.getMessage.contains("x_positive"))
    val e2 = intercept[IllegalArgumentException] {
      Versioned.mergeInto(spark, root,
        Seq((2L, -1.0)).toDF("id", "x"), Seq("id"))
    }
    assert(e2.getMessage.contains("x_positive"))
    // a delete only removes rows: survivors re-validate trivially
    Versioned.deleteWhere(spark, root, col("id") === 1L)
    assert(Versioned.read(spark, root).as[(Long, Double)].collect().toSeq
      == Seq((2L, 20.0)))
  }

  test("dropping a constraint re-admits previously-violating writes") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, 10.0)).toDF("id", "x"), root) // v1
    Versioned.addConstraint(spark, root, "x_positive", "x > 0")    // v2
    Versioned.dropConstraint(spark, root, "x_positive")            // v3
    Versioned.commit(spark, Seq((2L, -1.0)).toDF("id", "x"), root) // v4 ok now
    assert(Versioned.read(spark, root).count() == 2)
    assert(Versioned.constraints(spark, root).isEmpty)
  }

  test("restore is metadata-only; the restored constraint bites on the next commit") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, 10.0)).toDF("id", "x"), root) // v1
    Versioned.addConstraint(spark, root, "x_positive", "x > 0")    // v2
    Versioned.dropConstraint(spark, root, "x_positive")            // v3
    Versioned.restore(spark, root, 2L)                             // v4 = v2's set
    assert(Versioned.constraints(spark, root) == Seq(("x_positive", "x > 0")))
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(spark, Seq((9L, -1.0)).toDF("id", "x"), root)
    }
    assert(e.getMessage.contains("x_positive"))
  }

  test("SQL CALL add_constraint / drop_constraint work through the catalog") {
    val wh = java.nio.file.Files.createTempDirectory("graft_checkwh").toFile
    wh.deleteOnExit()
    spark.conf.set("spark.sql.catalog.graft_chk",
      classOf[graft.io.VersionedCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_chk.warehouse", wh.getAbsolutePath)
    val root = new java.io.File(new java.io.File(wh, "ns"), "t").getAbsolutePath
    Versioned.commit(spark, Seq((1L, 5.0)).toDF("id", "x"), root)
    val v = spark.sql(
      "CALL graft_chk.system.add_constraint('ns.t', 'x_pos', 'x > 0')")
      .as[Long].head()
    assert(v == 2L)
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft_chk.ns.t VALUES (2, -1.0)")
    }
    assert(e.getMessage.contains("x_pos"))
    spark.sql("CALL graft_chk.system.drop_constraint('ns.t', 'x_pos')")
    spark.sql(s"INSERT INTO graft_chk.ns.t VALUES (2, -1.0)")
    assert(spark.table("graft_chk.ns.t").count() == 2)
  }

  test("CALL constraints lists the current snapshot's checks") {
    val wh = java.nio.file.Files.createTempDirectory("graft_checkls").toFile
    wh.deleteOnExit()
    spark.conf.set("spark.sql.catalog.graft_chkls",
      classOf[graft.io.VersionedCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_chkls.warehouse", wh.getAbsolutePath)
    val root = new java.io.File(new java.io.File(wh, "ns"), "t").getAbsolutePath
    Versioned.commit(spark, Seq((1L, 5.0)).toDF("id", "x"), root)
    assert(spark.sql("CALL graft_chkls.system.constraints('ns.t')").count() == 0)
    Versioned.addConstraint(spark, root, "x_pos", "x > 0")
    Versioned.addConstraint(spark, root, "id_pos", "id > 0")
    val listed = spark.sql("CALL graft_chkls.system.constraints('ns.t')")
      .as[(String, String)].collect().toSet
    assert(listed == Set(("x_pos", "x > 0"), ("id_pos", "id > 0")))
  }

  test("multiple constraints all enforce; names must be unique") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, 10.0, "a")).toDF("id", "x", "k"), root)
    Versioned.addConstraint(spark, root, "x_pos", "x > 0")
    Versioned.addConstraint(spark, root, "k_nonempty", "length(k) > 0")
    val e = intercept[IllegalArgumentException] {
      Versioned.addConstraint(spark, root, "x_pos", "x > 1")
    }
    assert(e.getMessage.contains("already exists"))
    val e2 = intercept[IllegalArgumentException] {
      Versioned.commit(spark, Seq((2L, 3.0, "")).toDF("id", "x", "k"), root)
    }
    assert(e2.getMessage.contains("k_nonempty"))
    Versioned.commit(spark, Seq((2L, 3.0, "b")).toDF("id", "x", "k"), root)
    assert(Versioned.read(spark, root).count() == 2)
  }

  test("replace dropping the checked column NULL-passes; the check is carried") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, 10.0)).toDF("id", "x"), root)
    Versioned.addConstraint(spark, root, "x_positive", "x > 0")
    // the replace's schema has NO x: the carried check references an
    // absent column, which is vacuously NULL-pass (SQL CHECK on unknown)
    // — the replace must succeed, not abort on an unresolvable `x`
    Versioned.commit(spark, Seq((7L, "a")).toDF("id", "tag"), root, replace = true)
    assert(Versioned.read(spark, root).columns.toSeq == Seq("id", "tag"))
    // carried, not silently dropped: bring x back and the check bites again
    Versioned.addColumns(spark, root, Seq(org.apache.spark.sql.types.StructField(
      "x", org.apache.spark.sql.types.DoubleType)))
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(spark, Seq((8L, "b", -1.0)).toDF("id", "tag", "x"), root)
    }
    assert(e.getMessage.contains("x_positive"))
    Versioned.commit(spark, Seq((8L, "b", 1.0)).toDF("id", "tag", "x"), root)
    assert(Versioned.read(spark, root).count() == 2)
  }

  test("two brand-new case-variant columns in one batch are refused pre-write") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq(Tuple1(1L)).toDF("id"), root)
    // x and X fold onto NO existing column, so mergeSchemas' case fold
    // can't resolve them — recording both would create exactly the dual
    // schema the fold exists to prevent
    val e = intercept[IllegalArgumentException] {
      Versioned.commit(spark, Seq((2L, 1.0, 2.0)).toDF("id", "x", "X"), root)
    }
    assert(e.getMessage.contains("case"))
    assert(Versioned.versions(spark, root) == Seq(1L))
    assert(!new java.io.File(root, "data/b2").exists(), "refused BEFORE the write")
    // the first-commit schema gets the same guard
    val root2 = tmpRoot()
    intercept[IllegalArgumentException] {
      Versioned.commit(spark, Seq((1L, 1.0, 2.0)).toDF("id", "x", "X"), root2)
    }
    assert(Versioned.versions(spark, root2).isEmpty)
  }
}
