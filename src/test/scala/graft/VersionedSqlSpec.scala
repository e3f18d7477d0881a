package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Plain-SQL UPDATE and MERGE on versioned catalog tables, planned by
  * [[graft.plans.VersionedRowLevelSqlStrategy]] onto the copy-on-write
  * library core. Run against the shared TEST session with the strategy
  * injected LIVE (spark.experimental.extraStrategies), which is also
  * the proof that a user session created without builder extensions can
  * be armed after the fact. Copy-on-write is asserted structurally
  * (untouched files carried by reference), unsupported shapes must be
  * refused at analysis with the offending piece named, and time travel
  * must still see pre-statement snapshots.
  */
class VersionedSqlSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sqlspec_wh").toFile
    d.deleteOnExit()
    spark.conf.set("spark.sql.catalog.graft_sqlt",
      classOf[graft.io.VersionedCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_sqlt.warehouse", d.getAbsolutePath)
    GraftExtensions.injectOptimizerRules(spark)
    d.getAbsolutePath
  }

  /** Three single-file banded commits at <wh>/ns/<name> -> identifier. */
  private def banded(name: String): String = {
    val root = new java.io.File(new java.io.File(wh, "ns"), name).getAbsolutePath
    Versioned.commit(spark, (1L to 100L).map(i => (i, i * 1.0, "old"))
      .toDF("id", "x", "src").coalesce(1), root, statsCols = Seq("id"))
    Versioned.commit(spark, (101L to 200L).map(i => (i, i * 1.0, "old"))
      .toDF("id", "x", "src").coalesce(1), root, statsCols = Seq("id"))
    Versioned.commit(spark, (201L to 300L).map(i => (i, i * 1.0, "old"))
      .toDF("id", "x", "src").coalesce(1), root, statsCols = Seq("id"))
    s"graft_sqlt.ns.$name"
  }

  private def rootOf(ident: String): String =
    new java.io.File(new java.io.File(wh, "ns"), ident.split('.').last).getAbsolutePath

  test("SQL UPDATE rewrites only touched files, values may reference old row") {
    val t = banded("upd")
    val before = manifestOf(rootOf(t), 3L)
    spark.sql(s"UPDATE $t SET x = x * 10, src = 'new' WHERE id BETWEEN 150 AND 160")
    val after = manifestOf(rootOf(t), 4L)
    assert(after.count(before.contains) == 2,
      s"expected bands 1 and 3 carried by reference, manifest: $after")
    val now = spark.table(t)
    assert(now.count() == 300)
    assert(now.filter($"src" === "new").as[(Long, Double, String)].collect()
      .forall { case (id, x, _) => id >= 150 && id <= 160 && x == id * 10.0 })
    assert(now.filter($"src" === "old").count() == 289)
    // time travel unaffected by the update
    assert(Versioned.read(spark, rootOf(t), asOf = Some(3L))
      .filter($"src" === "new").count() == 0)
  }

  test("SQL UPDATE assignments are simultaneous: values and WHERE read the old row") {
    val t = banded("updsim")
    // x is both assigned and read — by the other assignment AND the
    // predicate. SQL semantics: all three see the PRE-update x.
    spark.sql(s"UPDATE $t SET x = 0, src = CAST(x AS STRING) WHERE x > 298")
    val hit = spark.table(t).filter($"id" >= 299)
      .as[(Long, Double, String)].collect().sortBy(_._1).toSeq
    assert(hit == Seq((299L, 0.0, "299.0"), (300L, 0.0, "300.0")),
      s"expected old-row semantics, got $hit")
    assert(spark.table(t).filter($"x" === 0.0).count() == 2)
  }

  test("SQL UPDATE without WHERE updates every row") {
    val t = banded("updall")
    spark.sql(s"UPDATE $t SET src = 'all'")
    assert(spark.table(t).filter($"src" =!= "all").count() == 0)
    assert(spark.table(t).count() == 300)
  }

  test("SQL MERGE upserts: matched rows replaced whole, unmatched insert") {
    val t = banded("mrg")
    val before = manifestOf(rootOf(t), 3L)
    Seq((150L, -1.0, "new"), (155L, -2.0, "new"), (1000L, -3.0, "new"))
      .toDF("id", "x", "src").createOrReplaceTempView("mrg_src")
    spark.sql(
      s"""MERGE INTO $t target USING mrg_src s ON target.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val after = manifestOf(rootOf(t), 4L)
    assert(after.count(before.contains) == 2,
      s"only the middle band may be rewritten, manifest: $after")
    val now = spark.table(t)
    assert(now.count() == 301)
    assert(now.filter($"src" === "new").as[(Long, Double, String)].collect().toSet
      == Set((150L, -1.0, "new"), (155L, -2.0, "new"), (1000L, -3.0, "new")))
  }

  test("SQL MERGE carries the analyzer's source casts (int source, bigint key)") {
    val t = banded("mrgcast")
    spark.sql(
      s"""MERGE INTO $t target
         |USING (SELECT 42 AS id, CAST(-5 AS DOUBLE) AS x, 'cast' AS src) s
         |ON target.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table(t).filter($"src" === "cast")
      .as[(Long, Double, String)].collect().toSeq == Seq((42L, -5.0, "cast")))
  }

  test("SQL MERGE with conditional matched update and delete, first-match-wins") {
    val t = banded("mrgcond")
    spark.sql(
      s"""MERGE INTO $t target
         |USING (SELECT explode(sequence(150L, 160L)) AS id,
         |               CAST(-1 AS DOUBLE) AS x, 'new' AS src) s
         |ON target.id = s.id
         |WHEN MATCHED AND s.id % 2 = 0 THEN UPDATE SET *
         |WHEN MATCHED THEN DELETE""".stripMargin)
    val now = spark.table(t)
    assert(now.filter($"src" === "new").count() == 6)   // 150,152..160 updated
    assert(now.filter($"id".between(150L, 160L)).count() == 6) // odds deleted
    assert(now.count() == 295)
  }

  test("SQL MERGE update-only and delete-only shapes work without INSERT") {
    val t = banded("mrgonly")
    spark.sql(
      s"""MERGE INTO $t target
         |USING (SELECT 150L AS id, CAST(0 AS DOUBLE) AS x, 'upd' AS src) s
         |ON target.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.table(t).filter($"src" === "upd").count() == 1)
    assert(spark.table(t).count() == 300)
    // delete-only with a key-only source
    spark.sql(
      s"""MERGE INTO $t target
         |USING (SELECT explode(sequence(151L, 155L)) AS id) s
         |ON target.id = s.id
         |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.table(t).count() == 295)
  }

  test("SQL MERGE with NOT MATCHED BY SOURCE update and delete") {
    val t = banded("mrgnmbs")
    val before = manifestOf(rootOf(t), 3L)
    spark.sql(
      s"""MERGE INTO $t target
         |USING (SELECT explode(sequence(1L, 200L)) AS id,
         |               CAST(0 AS DOUBLE) AS x, 'keep' AS src) s
         |ON target.id = s.id
         |WHEN NOT MATCHED BY SOURCE AND target.id > 250 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET src = 'orphan'""".stripMargin)
    val after = manifestOf(rootOf(t), 4L)
    // only band 3 contains firing rows; bands 1+2 carried by reference
    assert(after.count(before.contains) == 2, s"manifest: $after")
    val now = spark.table(t)
    assert(now.count() == 250)
    assert(now.filter($"src" === "orphan").select("id").as[Long].collect().toSet
      == (201L to 250L).toSet)
  }

  test("SQL MERGE conditional insert admits only passing source rows") {
    val t = banded("mrgcins")
    spark.sql(
      s"""MERGE INTO $t target
         |USING (SELECT explode(sequence(1000L, 1009L)) AS id,
         |               CAST(1 AS DOUBLE) AS x, 'new' AS src) s
         |ON target.id = s.id
         |WHEN NOT MATCHED AND s.id % 2 = 0 THEN INSERT *""".stripMargin)
    assert(spark.table(t).filter($"id" >= 1000L).select("id").as[Long]
      .collect().toSet == (1000L to 1009L).filter(_ % 2 == 0).toSet)
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION adds source columns to the table") {
    val t = banded("mrgevo")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $t target
         |USING (SELECT 150L AS id, CAST(-1 AS DOUBLE) AS x, 'new' AS src,
         |              CAST(0.9 AS DOUBLE) AS score) s
         |ON target.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val now = spark.table(t)
    assert(now.schema.fieldNames.contains("score"))
    assert(now.filter($"id" === 150L).select("score").as[Double].collect().toSeq
      == Seq(0.9))
    assert(now.filter($"score".isNull).count() == 299) // old rows read null
    // without the flag, SQL star expansion ignores the extra source
    // column (it maps the TARGET's columns): no accidental evolution
    spark.sql(
      s"""MERGE INTO $t target
         |USING (SELECT 1L AS id, CAST(0 AS DOUBLE) AS x, 's' AS src,
         |              CAST(0.1 AS DOUBLE) AS score, 'x' AS extra2) s
         |ON target.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(!spark.table(t).schema.fieldNames.contains("extra2"))
  }

  test("unsupported SQL shapes are refused at analysis, naming the piece") {
    val t = banded("rej")
    Seq((1L, 0.0, "s")).toDF("id", "x", "src").createOrReplaceTempView("rej_src")
    def refuse(sql: String, needle: String): Unit = {
      val e = intercept[UnsupportedOperationException](spark.sql(sql))
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    refuse(s"UPDATE $t SET x = 0 WHERE id IN (SELECT id FROM rej_src)",
      "subqueries")
    refuse(
      s"""MERGE INTO $t target USING rej_src s
         |ON target.id = s.id AND s.x > 0
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin, "ON condition")
    refuse(
      s"""MERGE INTO $t target USING (SELECT 1 AS k, 0.0 AS x, 's' AS src) s
         |ON target.id = s.k
         |WHEN MATCHED THEN UPDATE SET id = s.k, x = s.x, src = s.src
         |WHEN NOT MATCHED THEN INSERT (id, x, src) VALUES (s.k, s.x, s.src)""".stripMargin,
      "same-named")
    // partial (non-star) matched update stays refused in the conditional
    // path too: whole-row replacement is the library contract
    refuse(
      s"""MERGE INTO $t target USING rej_src s ON target.id = s.id
         |WHEN MATCHED AND s.x > 0 THEN UPDATE SET x = s.x
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin, "assigns only")
    // nothing above may have committed
    assert(Versioned.versions(spark, rootOf(t)).last == 3L)
  }

  test("UPDATE on a non-versioned table still gets Spark's native error") {
    Seq((1, "a")).toDF("id", "v").createOrReplaceTempView("plain_view")
    val e = intercept[Exception](spark.sql("UPDATE plain_view SET v = 'x'"))
    assert(!e.isInstanceOf[UnsupportedOperationException] ||
      !e.getMessage.contains("graft-versioned"))
  }
}
