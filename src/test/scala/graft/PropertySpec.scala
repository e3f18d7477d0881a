package graft

import graft.clean.Clean
import graft.ops.Relational
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests from SURVEY.md §5: round-trip of the SAP number format
  * and algebraic laws of the upsert op. ScalaCheck generators drive the
  * data; each property runs as one batched Spark job to keep the suite
  * fast.
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val decimals: Gen[BigDecimal] = for {
    unscaled <- Gen.chooseNum(-999999999999L, 999999999999L)
    scale <- Gen.chooseNum(0, 6)
  } yield BigDecimal(unscaled, scale)

  /** Render a decimal the way SAP exports do: comma thousands grouping on
    * the integer part, trailing minus for negatives. */
  private def sapFormat(d: BigDecimal): String = {
    val abs = d.abs.bigDecimal.toPlainString
    val (intPart, fracPart) = abs.span(_ != '.')
    val grouped = intPart.reverse.grouped(3).mkString(",").reverse
    val s = grouped + fracPart
    if (d < 0) s + "-" else s
  }

  test("asofJoin equals the naive inequality-join formulation (property)") {
    import org.apache.spark.sql.expressions.Window
    val gk = Gen.chooseNum(1, 5); val gt = Gen.chooseNum(0, 50)
    val leftRows = Gen.listOfN(120, Gen.zip(gk, gt)).sample.get
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val rightRows = Gen.listOfN(120, Gen.zip(gk, gt)).sample.get
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong, k * 100.0 + t) }
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "t", "rid", "rv")

    val got = Relational.asofJoin(left, right, Seq("k"),
        col("t"), col("t"), col("rid"), Seq("rid", "rv"))
      .select(col("lid"), col("asof_rid"), col("asof_rv"))
      .as[(Long, Option[Long], Option[Double])].collect().toSet

    // naive O(L*R) reference: inequality join + latest-wins window
    val r2 = right.select(col("k").as("rk"), col("t").as("rt"), col("rid"), col("rv"))
    val w = Window.partitionBy(col("lid"))
      .orderBy(col("rt").desc_nulls_last, col("rid").desc_nulls_last)
    val naive = left.join(r2, col("k") === col("rk") && col("rt") <= col("t"), "left")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("lid"), col("rid"), col("rv"))
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(got == naive)
  }

  test("rangeJoin equals the naive inequality join (property)") {
    val gk = Gen.chooseNum(1, 4); val gt = Gen.chooseNum(0L, 60L)
    val pointRows = Gen.listOfN(100, Gen.zip(gk, gt)).sample.get
      .zipWithIndex.map { case ((k, p), i) => (k, p, i.toLong) }
    val ivRows = Gen.listOfN(60, Gen.zip(gk, gt, Gen.chooseNum(1L, 20L))).sample.get
      .zipWithIndex.map { case ((k, s, len), i) => (k, s, s + len, i.toLong) }
    val points = pointRows.toDF("k", "p", "pid")
    val intervals = ivRows.toDF("k", "s", "e", "iv")

    val got = Relational.rangeJoin(points, intervals, Seq("k"),
        col("p"), col("s"), col("e"), 7L)
      .select("pid", "iv").as[(Long, Long)].collect().toSet

    val iv2 = intervals.select(col("k").as("ik"), col("s"), col("e"), col("iv"))
    val naive = points
      .join(iv2, col("k") === col("ik") && col("p") >= col("s") && col("p") < col("e"))
      .select("pid", "iv").as[(Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("upsertPartitioned replay is idempotent and matches whole-table upsert (property)") {
    import graft.io.UpsertWriter
    val dir = java.nio.file.Files.createTempDirectory("pup_prop").toFile.getAbsolutePath
    val gk = Gen.chooseNum(1, 40); val gd = Gen.oneOf("d1", "d2", "d3")
    def batch(seed: Int) = Gen.listOfN(60, Gen.zip(gk, gd)).sample.get
      .distinctBy(x => (x._1, x._2))
      .map { case (k, d) => (k, d, s"v$seed-$k-$d") }.toDF("k", "day", "v")

    val b1 = batch(1); val b2 = batch(2)
    val pTarget = dir + "/part"; val wTarget = dir + "/whole"
    UpsertWriter.upsertPartitioned(spark, b1, pTarget, Seq("k", "day"), "day")
    UpsertWriter.upsertPartitioned(spark, b2, pTarget, Seq("k", "day"), "day")
    UpsertWriter.upsertPartitioned(spark, b2, pTarget, Seq("k", "day"), "day") // replay
    UpsertWriter.upsert(spark, b1, wTarget, Seq("k", "day"))
    UpsertWriter.upsert(spark, b2, wTarget, Seq("k", "day"))
    val p = spark.read.parquet(pTarget).select("k", "day", "v")
      .as[(Int, String, String)].collect().toSet
    val w = spark.read.parquet(wTarget).select("k", "day", "v")
      .as[(Int, String, String)].collect().toSet
    assert(p == w)
  }

  test("KMV sketch estimate stays within the expected error band (property)") {
    import graft.functions.TextFunctions.hash32
    import org.apache.spark.sql.expressions.Window
    val k = 128
    val trueDistinct = 5000
    val hashed = (1 to trueDistinct).map(i => s"key-$i").toDF("v")
      .select(hash32(col("v")).as("h")).distinct()
    val kept = hashed.withColumn("rn",
        row_number().over(Window.orderBy(col("h"))))
      .filter(col("rn") <= k)
    val r = kept.agg(count(lit(1)), max(col("h"))).head
    val est = (k - 1).toDouble * 4294967296.0 / r.getLong(1)
    // standard KMV error is ~1/sqrt(k) ≈ 8.8%; allow 4 sigma
    assert(math.abs(est - trueDistinct) / trueDistinct < 4.0 / math.sqrt(k),
      s"estimate $est vs $trueDistinct")
  }

  test("sapNumber round-trips SAP-formatted decimals (batch property)") {
    val samples = Gen.listOfN(300, decimals).sample.get
    val df = samples.map(d => (sapFormat(d), d.setScale(6).toString))
      .toDF("raw", "expected")
    val bad = df
      .withColumn("parsed", Clean.sapNumber(col("raw")))
      .filter(col("parsed").isNull || col("parsed") =!= col("expected").cast("decimal(18,6)"))
    assert(bad.count() == 0, s"mismatches: ${bad.take(5).mkString}")
  }

  test("upsertMerge is idempotent and staging-biased (batch property)") {
    val keys = Gen.listOfN(60, Gen.chooseNum(0, 19)).sample.get
    val target = keys.zipWithIndex.map { case (k, i) => (k, s"t$i") }
      .distinctBy(_._1).toDF("k", "v")
    val staging = Gen.listOfN(30, Gen.chooseNum(10, 29)).sample.get
      .zipWithIndex.map { case (k, i) => (k, s"s$i") }
      .distinctBy(_._1).toDF("k", "v")

    val once = Relational.upsertMerge(Seq("k"))(target, staging)
      .as[(Int, String)].collect().toSet
    val twice = Relational.upsertMerge(Seq("k"))(
      once.toSeq.toDF("k", "v"), staging).as[(Int, String)].collect().toSet
    assert(twice == once)

    val stagingKeys = staging.as[(Int, String)].collect().map(_._1).toSet
    // every staging key maps to the staging value
    assert(once.filter(r => stagingKeys(r._1)).forall(_._2.startsWith("s")))
    // non-staging target rows survive untouched
    val targetRows = target.as[(Int, String)].collect().toSet
    assert(targetRows.filter(r => !stagingKeys(r._1)).subsetOf(once))
  }

  test("graft_topk equals window top-k on random data at any partitioning (property)") {
    import graft.functions.GraftExpressions.topKBy
    import org.apache.spark.sql.expressions.Window
    val rows = Gen.listOfN(400,
      Gen.zip(Gen.chooseNum(0L, 6L), Gen.chooseNum(0L, 500L), Gen.chooseNum(0, 9)))
      .sample.get.map { case (g, id, s) => (g, id, s / 10.0) } // coarse scores -> many ties
    val df = rows.toDF("g", "id", "s")
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    val win = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select("g", "id", "s", "rn").collect().toSet
    for (parts <- Seq(1, 3, 17)) {
      val agg = df.repartition(parts).groupBy(col("g"))
        .agg(topKBy(col("s"), col("id"), 4).as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), col("col.id").as("id"), col("col.score").as("s"),
          (col("pos") + 1).cast("int").as("rn")).collect().toSet
      // identical except where equal (s, id) duplicates make row_number
      // order arbitrary — compare as multisets of (g, id, s)
      assert(agg.map(r => (r: Any)).size == win.size)
      val norm = (s: Set[org.apache.spark.sql.Row]) =>
        s.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .groupBy(identity).view.mapValues(_.size).toMap
      assert(norm(agg) == norm(win), s"parts=$parts")
    }
  }

  test("graft_argmax equals window keep-last on random data at any partitioning (property)") {
    import graft.functions.GraftExpressions.argMaxRow
    import org.apache.spark.sql.expressions.Window
    val rows = Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 1000L)))
      .sample.get.zipWithIndex.map { case ((g, o), i) => (g, o, i.toLong) }
    val df = rows.toDF("g", "o", "uid") // (o, uid) is a total order
    val w = Window.partitionBy(col("g")).orderBy(col("o").desc, col("uid").desc)
    val win = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("g", "uid").collect().toSet
    for (parts <- Seq(1, 5, 23)) {
      val agg = df.repartition(parts).groupBy(col("g"))
        .agg(argMaxRow(struct(col("o"), col("uid")), col("uid")).as("uid"))
        .select("g", "uid").collect().toSet
      assert(agg == win, s"parts=$parts")
    }
  }

  test("editDistance1Pairs equals brute force on random short strings") {
    // small alphabet + short lengths force dense distance-1 neighborhoods,
    // the regime where a blocking bug (missed variant family) would show
    val gen = Gen.listOfN(120, Gen.chooseNum(0, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (seedRun <- 1 to 3) {
      val vals = gen.sample.get
      val got = graft.ops.Dedup.editDistance1Pairs(vals.toDF("s"), "s")
        .as[(String, String)].collect().toSet
      val distinct = vals.distinct
      val want = (for {
        a <- distinct; b <- distinct if a < b && lev(a, b) <= 1
      } yield (a, b)).toSet
      assert(got == want, s"run $seedRun: ${got.diff(want)} / ${want.diff(got)}")
    }
    // the d = 2 generalization under the same property: two-char-deletion
    // blocks must find EVERY pair the brute force finds (substitutions,
    // transposed-adjacent = 2 substitutions, insert+delete, length gaps)
    for (seedRun <- 1 to 3) {
      val vals = gen.sample.get
      val got = graft.ops.Dedup.editDistancePairs(vals.toDF("s"), "s", 2)
        .as[(String, String)].collect().toSet
      val distinct = vals.distinct
      val want = (for {
        a <- distinct; b <- distinct if a < b && lev(a, b) <= 2
      } yield (a, b)).toSet
      assert(got == want, s"d2 run $seedRun: missing=${want.diff(got)} extra=${got.diff(want)}")
    }
  }

  test("Dv codec: encode/decode round-trips and union is set union (property)") {
    import graft.io.Dv
    // clustered ordinal sets (runs + gaps) exercise both the 1-byte-delta
    // and multi-byte-varint encodings; Long.MaxValue-scale values the
    // 9-byte tail
    val ordSet: Gen[Array[Long]] = for {
      n <- Gen.chooseNum(0, 300)
      base <- Gen.chooseNum(0L, 1L << 40)
      gaps <- Gen.listOfN(n, Gen.oneOf(Gen.chooseNum(1L, 3L), Gen.chooseNum(1L, 100000L)))
    } yield gaps.scanLeft(base)(_ + _).tail.toArray
    (1 to 50).foreach { run =>
      val a = ordSet.sample.getOrElse(Array.empty[Long])
      val b = ordSet.sample.getOrElse(Array.empty[Long])
      assert(Dv.decode(Dv.encode(a)).toSeq == a.toSeq, s"run $run round-trip")
      val u = Dv.union(a, b)
      assert(u.toSeq == (a.toSet ++ b.toSet).toSeq.sorted, s"run $run union")
      assert(Dv.union(a, a).toSeq == a.toSeq, s"run $run idempotent")
      assert(Dv.union(b, a).toSeq == u.toSeq, s"run $run commutative")
      // header cardinality is trusted by the whole-file-dead check:
      // it must equal the distinct ordinal count, always
      assert(Dv.decode(Dv.encode(u)).length == (a.toSet ++ b.toSet).size)
    }
    // the strictness contract: duplicates and disorder refuse loudly
    intercept[IllegalArgumentException](Dv.encode(Array(1L, 1L)))
    intercept[IllegalArgumentException](Dv.encode(Array(2L, 1L)))
    intercept[IllegalArgumentException](Dv.encode(Array(-1L)))
  }

  test("MetaPar.parMap preserves order, unwraps failures, and runs in parallel") {
    import graft.io.MetaPar
    // order: results line up with inputs whatever the completion order
    val xs = (1 to 500).toVector
    assert(MetaPar.parMap(xs)(_ * 2) == xs.map(_ * 2))
    assert(MetaPar.parMap(Seq.empty[Int])(_ * 2).isEmpty)
    assert(MetaPar.parMap(Seq(7))(_ + 1) == Seq(8)) // inline short-circuit
    // the ORIGINAL exception surfaces, not an ExecutionException wrapper
    val boom = intercept[IllegalArgumentException] {
      MetaPar.parMap(1 to 50)(i =>
        if (i == 33) throw new IllegalArgumentException("i=33") else i)
    }
    assert(boom.getMessage == "i=33")
    // genuinely parallel: 24 tasks each sleeping 100ms finish far faster
    // than the 2.4s serial floor (generous 1.5s bound absorbs host noise)
    val t0 = System.nanoTime()
    MetaPar.parMap(1 to 24)(_ => Thread.sleep(100))
    assert((System.nanoTime() - t0) / 1e9 < 1.5, "expected parallel execution")
  }

  test("Dv codec: decode re-validates what encode promised (corruption refuses)") {
    import graft.io.Dv
    val good = Dv.encode(Array(3L, 7L, 20L))
    // trailing garbage after the declared cardinality: a padded/overlong
    // vector must not silently decode into a shorter ordinal set
    intercept[IllegalArgumentException](Dv.decode(good ++ Array[Byte](1)))
    // truncation: fewer payload bytes than the header promises
    intercept[Exception](Dv.decode(good.dropRight(1)))
    // a zero delta is a duplicated ordinal — the header cardinality the
    // whole-file-dead check trusts would disagree with the distinct count
    val dupPayload = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(0x47445631); out.writeLong(2L)
      out.writeByte(5); out.writeByte(0) // ordinals 5, 5
      out.flush(); bos.toByteArray
    }
    intercept[IllegalArgumentException](Dv.decode(dupPayload))
    // bad magic and absurd cardinality still refuse
    intercept[IllegalArgumentException](Dv.decode(Array.fill[Byte](12)(0)))
  }
}
