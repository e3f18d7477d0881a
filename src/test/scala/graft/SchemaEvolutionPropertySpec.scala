package graft

import graft.io.Versioned
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StringType, StructField, StructType}

/** Model-based property test for the schema-evolution surface of mapped
  * (field-id) tables: a seeded random walk of
  * append / evolve-append / ADD COLUMN / DROP COLUMN / RENAME COLUMN /
  * compactLatest / restore against a pure in-memory model, asserting
  * after EVERY step that the newest snapshot reads exactly the model
  * state — dropped values never resurface (even when the name is
  * re-added or renamed onto), kept values never vanish (even across
  * replace-compaction id reassignment and restores that rewind the
  * schema) — and finally that every committed version still time-travels
  * to the model state it had when it was the head. Random sequences
  * stress interleavings (drop → re-add → restore → append …) no
  * example-based spec enumerates. */
class SchemaEvolutionPropertySpec extends SparkSpecBase {

  private def tmpRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_schemaprop").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private case class M(schema: Vector[String],
                       rows: Map[Long, Map[String, Option[String]]])

  private val pool = Vector("a", "b", "c", "d", "e")

  // every table in the walk also carries an embedding column
  // (array<float>) and a nested struct — the multimodal/LLM-table
  // shapes — with values DERIVED from the id, so each evolution step
  // (rename/drop/re-add/compact/restore on the flat columns, id
  // inheritance through every rewrite) is checked to leave the nested
  // columns bit-exact too
  private val fixedCols = Vector("emb", "s")
  private def embOf(id: Long): Seq[Float] = Seq(id.toFloat, (id * 2).toFloat)
  private def structOf(id: Long): Row = Row(id * 10, s"w$id")

  private def toDF(rows: Map[Long, Map[String, Option[String]]],
                   cols: Vector[String]) = {
    val st = StructType(
      Seq(StructField("id", LongType, nullable = false),
        StructField("emb", ArrayType(FloatType), nullable = true),
        StructField("s", StructType(Seq(
          StructField("u", LongType, nullable = true),
          StructField("w", StringType, nullable = true))), nullable = true)) ++
      cols.map(c => StructField(c, StringType, nullable = true)))
    val data = rows.toSeq.sortBy(_._1).map { case (id, vals) =>
      Row.fromSeq(Seq(id, embOf(id), structOf(id)) ++
        cols.map(c => vals.getOrElse(c, None).orNull))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(data).asJava), st)
  }

  private def snapshotOf(root: String, asOf: Option[Long]): (Seq[String], Map[Long, Vector[Option[String]]]) = {
    val df = Versioned.read(spark, root, asOf)
    val cols = df.columns.toSeq
    val dataCols = cols.filterNot(c => c == "id" || fixedCols.contains(c))
    val rows = df.collect().map { r =>
      val id = r.getLong(r.fieldIndex("id"))
      assert(r.getSeq[Float](r.fieldIndex("emb")).toSeq == embOf(id),
        s"embedding drifted for id $id")
      assert(r.getAs[Row]("s") == structOf(id),
        s"nested struct drifted for id $id")
      id -> dataCols.map(c => Option(r.getAs[String](c))).toVector
    }.toMap
    (cols, rows)
  }

  private def expect(m: M): Map[Long, Vector[Option[String]]] =
    m.rows.map { case (id, v) => id -> m.schema.map(c => v.getOrElse(c, None)).toVector }

  test("random evolution walks: reads always equal the model, at head and in history") {
    Seq(42, 7, 2026).foreach(walk)
  }

  private def walk(seed: Int): Unit = {
    val root = tmpRoot()
    val rnd = new scala.util.Random(seed)
    var nextId = 0L
    def freshRows(cols: Vector[String], k: Int, tag: Int) =
      (0 until k).map { _ =>
        val id = nextId; nextId += 1
        id -> cols.map(c => c -> Option(s"$c-$id-$tag")).toMap
      }.toMap
    var m = M(Vector("a", "b"), freshRows(Vector("a", "b"), 5, 0))
    val v1 = Versioned.commit(spark, toDF(m.rows, m.schema), root)
    var hist = Map(v1 -> m)
    for (step <- 1 to 24) {
      rnd.nextInt(7) match {
        case 0 | 1 => // append; sometimes evolving in a brand-new/re-added name
          val cands = pool.diff(m.schema)
          val addNew = rnd.nextBoolean() && cands.nonEmpty
          val cols = if (addNew) m.schema :+ cands(rnd.nextInt(cands.size)) else m.schema
          val batch = freshRows(cols, 1 + rnd.nextInt(3), step)
          Versioned.commit(spark, toDF(batch, cols), root)
          m = M(cols, m.rows ++ batch)
        case 2 if m.schema.size > 1 => // DROP a random column
          val c = m.schema(rnd.nextInt(m.schema.size))
          Versioned.dropColumns(spark, root, Seq(c))
          m = M(m.schema.filterNot(_ == c),
            m.rows.map { case (id, v) => id -> (v - c) })
        case 3 => // metadata ADD COLUMN (possibly a previously dropped name)
          val cands = pool.diff(m.schema)
          if (cands.nonEmpty) {
            val c = cands(rnd.nextInt(cands.size))
            Versioned.addColumns(spark, root, Seq(StructField(c, StringType)))
            m = M(m.schema :+ c, m.rows)
          }
        case 4 => // RENAME COLUMN (possibly onto a previously dropped name)
          val cands = pool.diff(m.schema)
          if (cands.nonEmpty) {
            val from = m.schema(rnd.nextInt(m.schema.size))
            val to = cands(rnd.nextInt(cands.size))
            Versioned.renameColumn(spark, root, from, to)
            m = M(m.schema.map(x => if (x == from) to else x),
              m.rows.map { case (id, v) =>
                id -> v.map { case (k, vv) => (if (k == from) to else k) -> vv }
              })
          }
        case 5 => // replace-compaction: fresh ids, same content
          Versioned.compactLatest(spark, root, nFiles = 1)
        case _ => // restore to a random committed version
          val vs = Versioned.versions(spark, root)
          val v = vs(rnd.nextInt(vs.size))
          if (v != vs.last) {
            Versioned.restore(spark, root, v)
            m = hist(v)
          }
      }
      val head = Versioned.versions(spark, root).last
      hist += head -> m
      val (cols, got) = snapshotOf(root, None)
      assert(cols == Seq("id") ++ fixedCols ++ m.schema,
        s"seed $seed step $step: columns $cols vs ${m.schema}")
      assert(got == expect(m), s"seed $seed step $step: rows diverge from the model")
    }
    // every version still serves EXACTLY the state it was committed with
    val live = Versioned.versions(spark, root).toSet
    hist.foreach { case (v, mv) =>
      if (live(v)) {
        val (cols, got) = snapshotOf(root, Some(v))
        assert(cols == Seq("id") ++ fixedCols ++ mv.schema,
          s"seed $seed asOf $v: columns $cols vs ${mv.schema}")
        assert(got == expect(mv), s"seed $seed asOf $v: rows diverge from the model")
      }
    }
  }
}
