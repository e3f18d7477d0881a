package graft

import graft.io.Versioned
import org.apache.spark.sql.functions._

/** Additive schema evolution on [[Versioned]] tables: an append may add
  * columns (old files read them as null) or omit old ones (its rows read
  * as null), but may never change a column's type; the snapshot schema is
  * recorded in the manifest, so reads are deterministic — never "whichever
  * file's footer got sampled" — and time travel shows each version's own
  * schema. A replace commit rewrites everything and may reshape freely.
  */
class SchemaEvolutionSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_evo").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("append with an added column: old rows null, time travel keeps old schema") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "k"), root)
    Versioned.commit(spark, Seq((3L, "c", 0.5)).toDF("id", "k", "score"), root)
    val now = Versioned.read(spark, root)
    assert(now.columns.toSeq == Seq("id", "k", "score"))
    val byId = now.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(2) && byId(2L).isNullAt(2))
    assert(byId(3L).getDouble(2) == 0.5)
    // v1 shows its own two-column schema
    assert(Versioned.read(spark, root, asOf = Some(1L)).columns.toSeq == Seq("id", "k"))
  }

  test("append missing an old column reads that column as null for its rows") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k"), root)
    Versioned.commit(spark, Seq(Tuple1(2L)).toDF("id"), root)
    val rows = Versioned.read(spark, root).collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getString(1) == "a")
    assert(rows(2L).isNullAt(1))
  }

  test("append changing a column's type is rejected loudly") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, 10L)).toDF("id", "v"), root)
    val err = intercept[IllegalArgumentException] {
      Versioned.commit(spark, Seq((2L, "not a long")).toDF("id", "v"), root)
    }
    assert(err.getMessage.contains("changes type"))
    // the failed commit published nothing
    assert(Versioned.versions(spark, root) == Seq(1L))
    // ...while a replace commit may reshape freely
    Versioned.commit(spark, Seq((2L, "now a string")).toDF("id", "v"), root,
      replace = true)
    assert(Versioned.read(spark, root).schema("v").dataType.typeName == "string")
  }

  test("the DSv2 format and CDC reads surface the evolved schema") {
    val root = tmpRoot()
    Versioned.commit(spark, Seq((1L, "a")).toDF("id", "k"), root)
    Versioned.commit(spark, Seq((2L, "b", 7L)).toDF("id", "k", "extra"), root)
    val viaFormat = spark.read.format("graft-versioned").load(root)
    assert(viaFormat.columns.toSeq == Seq("id", "k", "extra"))
    assert(viaFormat.filter(col("id") === 1L).select("extra").head.isNullAt(0))
    // CDC read between v1 and v2 carries the added column
    val changes = spark.read.format("graft-versioned")
      .option("changesFrom", "1").load(root)
    assert(changes.columns.toSeq == Seq("id", "k", "extra"))
    assert(changes.select("extra").as[Long].collect().toSeq == Seq(7L))
    // pinned asOf load keeps the old shape
    assert(spark.read.format("graft-versioned").option("asOf", "1").load(root)
      .columns.toSeq == Seq("id", "k"))
  }

  test("readPruned re-applies its predicate correctly across evolved batches") {
    val root = tmpRoot()
    Versioned.commit(spark, (1L to 50L).toDF("id").coalesce(1), root,
      statsCols = Seq("id"))
    Versioned.commit(spark,
      (51L to 100L).map(i => (i, i * 2L)).toDF("id", "dbl").coalesce(1), root,
      statsCols = Seq("id"))
    val out = Versioned.readPruned(spark, root, "id", Some(40L), Some(60L))
    assert(out.columns.toSeq == Seq("id", "dbl"))
    assert(out.select("id").as[Long].collect().sorted.toSeq == (40L to 60L))
  }
}
