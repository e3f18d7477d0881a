package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Keyed change-data-feed ([[Versioned.diffVersionsKeyed]]): the unkeyed
  * row diff classified into insert / delete / update_preimage /
  * update_postimage by key pairing, Delta-CDF shape. */
class VersionedCdfSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("update, delete and insert classify correctly across one window") {
    val root = tmpDir("graft_cdf")
    Versioned.commit(spark,
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "k").coalesce(1), root)
    Versioned.updateWhere(spark, root, col("id") === 3L, Map("k" -> lit("UPD")))
    Versioned.deleteWhere(spark, root, col("id") === 7L)
    Versioned.commit(spark, Seq((99L, "new")).toDF("id", "k"), root)
    val cdf = Versioned.diffVersionsKeyed(spark, root, fromV = 1, keys = Seq("id"))
      .select("_change_type", "id", "k").as[(String, Long, String)]
      .collect().toSet
    assert(cdf == Set(
      ("update_preimage", 3L, "v3"),
      ("update_postimage", 3L, "UPD"),
      ("delete", 7L, "v7"),
      ("insert", 99L, "new")))
  }

  test("a key deleted then re-inserted across the window is an update") {
    val root = tmpDir("graft_cdf_reins")
    Versioned.commit(spark,
      (1L to 5L).map(i => (i, s"v$i")).toDF("id", "k").coalesce(1), root)
    Versioned.deleteWhere(spark, root, col("id") === 2L)
    Versioned.commit(spark, Seq((2L, "back")).toDF("id", "k"), root)
    val cdf = Versioned.diffVersionsKeyed(spark, root, fromV = 1, keys = Seq("id"))
      .select("_change_type", "id", "k").as[(String, Long, String)]
      .collect().toSet
    assert(cdf == Set(
      ("update_preimage", 2L, "v2"),
      ("update_postimage", 2L, "back")))
  }

  test("null keys never pair; duplicate changed keys are refused loudly") {
    val root = tmpDir("graft_cdf_null")
    Versioned.commit(spark,
      Seq((Some(1L), "a"), (None, "x")).toDF("id", "k").coalesce(1), root)
    // replace: the null-keyed row changes value; 1L row unchanged-in-place
    Versioned.commit(spark,
      Seq((Some(1L), "a"), (None, "y")).toDF("id", "k").coalesce(1),
      root, replace = true)
    val cdf = Versioned.diffVersionsKeyed(spark, root, fromV = 1, keys = Seq("id"))
      .select("_change_type", "k").as[(String, String)].collect().toSet
    assert(cdf == Set(("insert", "y"), ("delete", "x"))) // no pre/post pairing
    // duplicate changed keys -> ambiguous pairing -> loud refusal
    val root2 = tmpDir("graft_cdf_dup")
    Versioned.commit(spark,
      Seq((1L, "a")).toDF("id", "k").coalesce(1), root2)
    Versioned.commit(spark,
      Seq((1L, "b"), (1L, "c")).toDF("id", "k").coalesce(1), root2,
      replace = true)
    // the guard is EAGER (call-time), so even a consumer that would
    // prune the _change_type column cannot slip past it
    val e = intercept[IllegalArgumentException] {
      Versioned.diffVersionsKeyed(spark, root2, fromV = 1, keys = Seq("id"))
    }
    assert(e.getMessage.contains("duplicate keys"))
  }

  test("a deletion-vector delete feeds the keyed CDF as plain deletes") {
    val root = tmpDir("graft_cdf_dv")
    Versioned.commit(spark,
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "k").coalesce(1), root)
    Versioned.deleteWhereDv(spark, root, col("id").isin(4L, 8L))
    val cdf = Versioned.diffVersionsKeyed(spark, root, fromV = 1, keys = Seq("id"))
      .select("_change_type", "id").as[(String, Long)].collect().toSet
    assert(cdf == Set(("delete", 4L), ("delete", 8L)))
  }
}
