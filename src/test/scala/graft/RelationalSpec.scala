package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpecBase {
  import spark.implicits._

  test("dedupKeepLast keeps the row that sorts last on the order columns") {
    val df = Seq((1, "a", 10), (1, "b", 20), (2, "c", 5)).toDF("k", "v", "ord")
    val out = Relational.dedupKeepLast(Seq("k"), Seq(col("ord")))(df)
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(out == Set((1, "b"), (2, "c")))
  }

  test("dedupKeepFirst keeps the row that sorts first") {
    val df = Seq((1, "a", 10), (1, "b", 20)).toDF("k", "v", "ord")
    val out = Relational.dedupKeepFirst(Seq("k"), Seq(col("ord")))(df)
      .select("v").as[String].collect().toSeq
    assert(out == Seq("a"))
  }

  test("duplicateKeys reports multiplicity > 1 only") {
    val df = Seq(1, 1, 1, 2, 3, 3).toDF("k")
    val out = Relational.duplicateKeys(Seq("k"))(df)
      .as[(Int, Long)].collect().toSet
    assert(out == Set((1, 3L), (3, 2L)))
  }

  test("asofJoin attaches the latest right row at-or-before each left time") {
    val left = Seq(("u", 10, "p1"), ("u", 5, "p2"), ("v", 7, "p3"))
      .toDF("k", "t", "pid")
    val right = Seq(
      ("u", 3, 1L, 1.5), ("u", 10, 2L, 2.5), ("u", 10, 3L, 3.5), // ts tie: ord 3 wins
      ("w", 1, 9L, 9.9))                                         // other key: ignored
      .toDF("k", "t", "rid", "rv")
    val out = Relational.asofJoin(left, right, Seq("k"),
        col("t"), col("t"), col("rid"), Seq("rid", "rv"))
      .select(col("pid"), col("asof_rid"), col("asof_rv"))
      .as[(String, Option[Long], Option[Double])].collect().toSet
    assert(out == Set(
      ("p1", Some(3L), Some(3.5)), // inclusive <=, tie broken by highest rid
      ("p2", Some(1L), Some(1.5)), // earlier left time sees only the t=3 row
      ("p3", None, None)))         // no right rows for key v
  }

  test("asofJoin ignores right rows with a null timestamp (round-5 ADVICE)") {
    // a null right ts would sort NULLS FIRST and be carried into every
    // left row as a phantom earliest match — must never match instead
    val left = Seq(("u", 10, "p1"), ("u", 2, "p2")).toDF("k", "t", "pid")
    val right = Seq(("u", Some(5), 1L, 1.5), ("u", None, 2L, 9.9))
      .toDF("k", "t", "rid", "rv")
    val out = Relational.asofJoin(left, right, Seq("k"),
        col("t"), col("t"), col("rid"), Seq("rid", "rv"))
      .select(col("pid"), col("asof_rid"))
      .as[(String, Option[Long])].collect().toSet
    assert(out == Set(("p1", Some(1L)), ("p2", None))) // null-ts row invisible
  }

  test("rangeJoin survives degenerate end <= start intervals (round-5 ADVICE)") {
    // end far below start used to generate a DESCENDING bucket sequence
    // (one row per step — OOM-scale); now it matches nothing and costs
    // nothing
    val points = Seq(("u", 10L)).toDF("k", "p")
    val intervals = Seq(
      ("u", 5L, 15L, "ok"),
      ("u", 1000000000000L, 0L, "corrupt"), // epoch-micros start, end=0
      ("u", 10L, 10L, "empty"))
      .toDF("k", "s", "e", "iv")
    val out = Relational.rangeJoin(points, intervals, Seq("k"),
        col("p"), col("s"), col("e"), 7L)
      .select("p", "iv").as[(Long, String)].collect().toSet
    assert(out == Set((10L, "ok")))
  }

  test("upsertMerge treats an all-NULL staging group as present (round-5 ADVICE)") {
    // MERGE semantics: a key PRESENT in staging takes staging's value
    // even when that value is NULL — presence is count-based, not
    // sum-is-not-null
    val target = Seq((1L, Some(10.0), "target"), (2L, Some(20.0), "target"))
      .toDF("k", "qty", "src")
    val staging = Seq((2L, None: Option[Double], "staging"))
      .toDF("k", "qty", "src")
    val out = Relational.upsertMerge(Seq("k"))(target, staging)
      .select(col("k"), col("qty"), col("src"))
      .as[(Long, Option[Double], String)].collect().toSet
    assert(out == Set((1L, Some(10.0), "target"), (2L, None, "staging")))
  }

  test("rangeJoin matches points in [start,end) per key across bucket boundaries") {
    val points = Seq(("u", 10L), ("u", 25L), ("u", 30L), ("u", 100L), ("v", 10L))
      .toDF("k", "p")
    val intervals = Seq(("u", 10L, 30L, "i1"), ("u", 30L, 40L, "i2"), ("v", 0L, 5L, "i3"))
      .toDF("k", "s", "e", "iv")
    // bucket width 7 deliberately misaligned with the interval bounds
    val out = Relational.rangeJoin(points, intervals, Seq("k"),
        col("p"), col("s"), col("e"), 7L)
      .select("p", "iv").as[(Long, String)].collect().toSet
    assert(out == Set(
      (10L, "i1"),  // start inclusive
      (25L, "i1"),
      (30L, "i2"))) // end exclusive for i1, start inclusive for i2
  }

  test("antiJoinNewKeys returns batch rows whose key is absent") {
    val batch = Seq((1, "n1"), (2, "n2"), (3, "n3")).toDF("k", "v")
    val existing = Seq(2).toDF("k")
    val out = Relational.antiJoinNewKeys(existing, Seq("k"))(batch)
      .select("k").as[Int].collect().toSet
    assert(out == Set(1, 3))
  }

  test("coalescedFullOuterMerge coalesces keys and zero-fills measures") {
    val l = Seq((1, 10.0)).toDF("k", "qty")
    val r = Seq((2, 99.0)).toDF("k", "amt")
    val out = Relational.coalescedFullOuterMerge(Seq("k"), Seq("qty", "amt"))(l, r)
      .select("k", "qty", "amt").as[(Int, Double, Double)].collect().toSet
    assert(out == Set((1, 10.0, 0.0), (2, 0.0, 99.0)))
  }

  test("upsertMerge: staging overrides, target survives, new keys insert; idempotent") {
    val target = Seq((1, "old"), (2, "keep")).toDF("k", "v")
    val staging = Seq((1, "new"), (3, "ins")).toDF("k", "v")
    val once = Relational.upsertMerge(Seq("k"))(target, staging)
    assert(once.as[(Int, String)].collect().toSet ==
      Set((1, "new"), (2, "keep"), (3, "ins")))
    val twice = Relational.upsertMerge(Seq("k"))(once, staging)
    assert(twice.as[(Int, String)].collect().toSet ==
      once.as[(Int, String)].collect().toSet)
  }

  test("regionRollup stamps labels via broadcast membership and aggregates once") {
    val data = Seq((10, "a", 1.0), (11, "a", 2.0), (20, "b", 4.0), (99, "x", 8.0))
      .toDF("site", "article", "qty")
    val membership = Seq((10, "R1"), (11, "R1"), (20, "R2")).toDF("site", "region")
    val out = Relational.regionRollup(membership, "site", "article",
      Seq(sum("qty").as("qty")))(data)
      .as[(String, String, Double)].collect().toSet
    assert(out == Set(("R1", "a", 3.0), ("R2", "b", 4.0))) // site 99 drops out
  }
}
