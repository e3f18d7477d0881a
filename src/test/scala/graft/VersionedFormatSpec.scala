package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** The `graft-versioned` DataSource V2 format must read exactly what the
  * library API reads (snapshot / time travel / changes), resolve the
  * snapshot at plan time (isolation), push filters and prune columns into
  * the native parquet scan, and reject writes (which would bypass the
  * manifest commit protocol).
  */
class VersionedFormatSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_vfmt").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def threeCommits(): String = {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "k", "x"), root)
    Versioned.commit(spark, Seq((3L, "a", 30.0)).toDF("id", "k", "x"), root)
    Versioned.commit(spark, Seq((4L, "c", 40.0), (5L, "a", 50.0)).toDF("id", "k", "x"), root)
    root
  }

  test("format read equals library read; short name resolves") {
    val root = threeCommits()
    val viaFormat = spark.read.format("graft-versioned").load(root)
    assert(viaFormat.select("id").as[Long].collect().toSet ==
      Versioned.read(spark, root).select("id").as[Long].collect().toSet)
    assert(viaFormat.count() == 5)
  }

  test("asOf option time-travels; changesFrom/changesTo read the diff") {
    val root = threeCommits()
    assert(spark.read.format("graft-versioned").option("asOf", "1").load(root)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
    assert(spark.read.format("graft-versioned").option("asOf", "2").load(root)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(spark.read.format("graft-versioned")
      .option("changesFrom", "1").load(root)
      .select("id").as[Long].collect().toSet == Set(3L, 4L, 5L))
    assert(spark.read.format("graft-versioned")
      .option("changesFrom", "1").option("changesTo", "2").load(root)
      .select("id").as[Long].collect().toSet == Set(3L))
  }

  test("timestampAsOf resolves to the newest version at or before the time") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "a", 10.0)).toDF("id", "k", "x"), root)
    Thread.sleep(20)
    val between = System.currentTimeMillis()
    Thread.sleep(20)
    Versioned.commit(spark, Seq((2L, "b", 20.0)).toDF("id", "k", "x"), root)
    // epoch-millis form: pins v1
    assert(spark.read.format("graft-versioned")
      .option("timestampAsOf", between.toString).load(root)
      .select("id").as[Long].collect().toSet == Set(1L))
    // timestamp-string form: "now" sees both
    val now = new java.sql.Timestamp(System.currentTimeMillis() + 1000).toString
    assert(spark.read.format("graft-versioned")
      .option("timestampAsOf", now).load(root).count() == 2)
    // lenient JDBC-literal fields (non-padded month/hour) parse too
    val lenient = {
      val t = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC).plusSeconds(2)
      s"${t.getYear}-${t.getMonthValue}-${t.getDayOfMonth} ${t.getHour}:${t.getMinute}:${t.getSecond}"
    }
    assert(spark.read.format("graft-versioned")
      .option("timestampAsOf", lenient).load(root).count() == 2)
    // before the first commit: loud refusal, not an empty frame
    val e = intercept[Exception] {
      spark.read.format("graft-versioned").option("timestampAsOf", "100").load(root)
        .count()
    }
    assert(chainMsg(e).contains("no version"))
    // mutually exclusive with asOf
    val e2 = intercept[Exception] {
      spark.read.format("graft-versioned").option("asOf", "1")
        .option("timestampAsOf", between.toString).load(root).count()
    }
    assert(chainMsg(e2).contains("mutually exclusive"))
    // the string form is wall-clock in the SESSION timezone (SQL
    // TIMESTAMP AS OF parity): the same "now in UTC" literal read under
    // UTC+14 names an instant 14h earlier — before the first commit
    val nowUtc = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .plusSeconds(2).toString.replace('T', ' ')
    assert(spark.read.format("graft-versioned")
      .option("timestampAsOf", nowUtc).load(root).count() == 2)
    spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
    try {
      val e3 = intercept[Exception] {
        spark.read.format("graft-versioned")
          .option("timestampAsOf", nowUtc).load(root).count()
      }
      assert(chainMsg(e3).contains("no version"),
        "UTC+14 reading of a now-UTC literal must predate every commit")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  private def chainMsg(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("empty change-set reads as zero rows with the snapshot schema") {
    val root = threeCommits()
    val empty = spark.read.format("graft-versioned")
      .option("changesFrom", "3").load(root)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("id", "k", "x"))
  }

  test("plan-time snapshot isolation: later commits don't leak into a loaded frame") {
    val root = threeCommits()
    val pinned = spark.read.format("graft-versioned").load(root)
    Versioned.commit(spark, Seq((99L, "z", 99.0)).toDF("id", "k", "x"), root)
    assert(pinned.count() == 5)
    assert(spark.read.format("graft-versioned").load(root).count() == 6)
  }

  test("filters push down and columns prune into the parquet scan") {
    val root = threeCommits()
    val q = spark.read.format("graft-versioned").load(root)
      .filter(col("id") > 2L).select("id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,2)]"),
      s"expected pushed filter in:\n$plan")
    assert(plan.contains("ReadSchema: struct<id:bigint>"),
      s"expected pruned read schema in:\n$plan")
    assert(q.as[Long].collect().toSet == Set(3L, 4L, 5L))
  }

  private def keptFiles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // listFiles runs during planning/execution
    val tables = df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table
    }
    tables.collectFirst {
      case t: graft.io.VersionedReadTable => t.prunedIndex.lastKeptFiles
    }.getOrElse(fail("no VersionedReadTable in plan"))
  }

  test("pushed WHERE ranges skip file opens via the batch sidecars") {
    val root = tmpRoot()
    Seq(1L to 100L, 101L to 200L, 201L to 300L).foreach { r =>
      Versioned.commit(spark, r.toDF("id").coalesce(1), root,
        statsCols = Seq("id"))
    }
    val banded = spark.read.format("graft-versioned").load(root)
      .filter(col("id") >= 120L && col("id") <= 180L)
    assert(keptFiles(banded) == 1)
    assert(banded.select("id").as[Long].collect().sorted.toSeq == (120L to 180L))
    // equality predicate prunes to the one covering file
    val eq = spark.read.format("graft-versioned").load(root)
      .filter(col("id") === 250L)
    assert(keptFiles(eq) == 1)
    assert(eq.count() == 1)
    // SQL through a temp view prunes identically
    spark.read.format("graft-versioned").load(root).createOrReplaceTempView("vt")
    val viaSql = spark.sql("SELECT id FROM vt WHERE id BETWEEN 205 AND 210")
    assert(viaSql.as[Long].collect().sorted.toSeq == (205L to 210L))
  }

  test("scan-time pruning stays conservative without stats and never drops rows") {
    val root = tmpRoot()
    Versioned.commit(spark, (1L to 100L).toDF("id").coalesce(1), root,
      statsCols = Seq("id"))
    Versioned.commit(spark, (500L to 600L).toDF("id").coalesce(1), root) // no stats
    val q = spark.read.format("graft-versioned").load(root)
      .filter(col("id") <= 50L)
    assert(keptFiles(q) == 2, "the stats-less file must always be kept")
    assert(q.count() == 50)
  }

  private def runtimeKept(df: org.apache.spark.sql.DataFrame): Int = {
    val tables = df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table
    }
    tables.collectFirst {
      case t: graft.io.VersionedReadTable => t.prunedIndex.lastRuntimeKept
    }.getOrElse(fail("no VersionedReadTable in plan"))
  }

  test("broadcast join against a filtered dim prunes fact file opens at runtime") {
    val root = tmpRoot()
    Seq(1L to 100L, 101L to 200L, 201L to 300L).foreach { r =>
      Versioned.commit(spark, r.toDF("id").coalesce(1), root, statsCols = Seq("id"))
    }
    // file-backed dim: a local Seq would constant-fold the filter away and
    // leave DPP nothing to latch onto
    val dimPath = tmpRoot()
    Seq((150L, "hot"), (160L, "hot"), (10L, "cold"), (250L, "cold"))
      .toDF("id", "grp").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val fact = spark.read.format("graft-versioned").load(root)
    val joined = fact.join(broadcast(dim.filter(col("grp") === "hot")), "id")
    assert(joined.select("id").as[Long].collect().sorted.toSeq == Seq(150L, 160L))
    // DPP handed the scan the build side's two keys; both land in file 2 of 3
    assert(runtimeKept(joined) == 1,
      "runtime filter should keep exactly the one file covering ids 150/160")
  }

  test("format writes publish manifest commits; history writes are rejected") {
    val root = threeCommits()
    // append mode = one append commit through the manifest protocol
    Seq((6L, "d", 60.0)).toDF("id", "k", "x")
      .write.format("graft-versioned").mode("append").save(root)
    assert(Versioned.versions(spark, root) == Seq(1L, 2L, 3L, 4L))
    assert(Versioned.read(spark, root).count() == 6)
    // overwrite mode = one replace commit; earlier versions stay readable
    Seq((9L, "zz", 90.0)).toDF("id", "k", "x")
      .write.format("graft-versioned").mode("overwrite").save(root)
    assert(Versioned.read(spark, root).select("id").as[Long].collect().toSeq
      == Seq(9L))
    assert(Versioned.read(spark, root, asOf = Some(4L)).count() == 6)
    // a pinned snapshot has no live root: writing to history is rejected
    val err = intercept[Exception] {
      Seq((7L, "e", 70.0)).toDF("id", "k", "x")
        .write.format("graft-versioned").option("asOf", "2")
        .mode("append").save(root)
    }
    val msg = err.getMessage.toLowerCase
    assert(msg.contains("does not support") || msg.contains("unsupported")
      || msg.contains("immutable") || msg.contains("does not allow"),
      s"unexpected error: ${err.getMessage}")
    // and nothing was committed by the refused write
    assert(Versioned.versions(spark, root) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("a small versioned table auto-broadcasts from its reported statistics") {
    val root = threeCommits()
    // big side estimates ~16 MB (> the 10 MB broadcast threshold), so the
    // join can only broadcast if the versioned scan reports real, finite
    // statistics — unknown stats would force a sort-merge join
    val big = spark.range(0L, 2000000L).toDF("id")
    val j = big.join(spark.read.format("graft-versioned").load(root), "id")
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected stats-driven auto-broadcast in:\n$plan")
  }

  test("count(*) pushes into the parquet scan when aggregate pushdown is on") {
    val root = threeCommits()
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val q = spark.read.format("graft-versioned").load(root).groupBy().count()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)]"),
        s"expected pushed count in:\n$plan")
      assert(q.as[Long].head() == 5L)
    } finally spark.conf.unset("spark.sql.parquet.aggregatePushdown")
  }

  test("asOf and changesFrom are mutually exclusive; missing version fails loudly") {
    val root = threeCommits()
    intercept[IllegalArgumentException] {
      spark.read.format("graft-versioned")
        .option("asOf", "1").option("changesFrom", "1").load(root)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-versioned").option("asOf", "42").load(root)
    }
  }
}
