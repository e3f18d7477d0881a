package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Structured Streaming CHANGE FEED over a [[Versioned]] table — the
  * Delta "readChangeFeed" analogue, and the row-level complement of the
  * append-only `graft-versioned` stream:
  *
  * {{{
  * spark.readStream.format("graft-versioned-cdf")
  *   .option("keys", "id")            // optional: classify updates
  *   .option("startingVersion", "3")  // optional: default = newest at first start
  *   .load(root)
  * }}}
  *
  * Offsets ARE version numbers. Each micro-batch is the row-level diff
  * between two committed versions ([[Versioned.diffVersions]], or
  * [[Versioned.diffVersionsKeyed]] when `keys` is set), so — unlike the
  * append-only stream, which REFUSES copy-on-write rewrites and
  * mid-stream deletion vectors — this source survives DELETE/UPDATE/
  * MERGE, merge-on-read vectors, and compaction: rewritten-but-unchanged
  * rows cancel in the diff and never re-emit. Schema = the table's
  * columns plus `_change` ('insert'|'delete'), or `_change_type`
  * ('insert'|'delete'|'update_preimage'|'update_postimage') when keyed.
  *
  * Semantics and contracts, stated plainly:
  *   - A batch spanning several versions emits the NET change across the
  *     window (two-snapshot diff): a row inserted then deleted inside
  *     one window never surfaces. Delta's per-commit CDF replays
  *     intermediate states; the net form is what incremental
  *     MERGE-downstream consumers actually apply, and it is bounded by
  *     table size, not history length.
  *   - The first batch starts at `startingVersion` (must be a committed
  *     version) or, by default, the newest version at FIRST start —
  *     tail-only, like Delta's default. The base version is persisted in
  *     the stream's checkpoint metadata dir, so a restarted stream
  *     resumes from its committed offset, never from a recomputed base.
  *   - Retention: `vacuum` must keep every version a lagging consumer
  *     still needs — a GC'd `from` version fails the batch loudly
  *     (version-not-found), never silently skips.
  *   - `keys` inherits [[Versioned.diffVersionsKeyed]]'s contract:
  *     duplicate changed keys in one window refuse loudly.
  */
class VersionedCdfProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-versioned-cdf"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-versioned-cdf requires a table root: .load(root)"))

  private def keysOf(parameters: Map[String, String]): Seq[String] =
    parameters.get("keys").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty, "graft-versioned-cdf derives its schema from the table")
    (shortName(), VersionedCdfSource.changeSchema(
      sqlContext.sparkSession, rootOf(parameters), keysOf(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new VersionedCdfSource(sqlContext.sparkSession, rootOf(parameters),
      keysOf(parameters),
      parameters.get("startingVersion").map(_.trim.toLong), metadataPath)
}

/** The typed evolution stop: a mid-stream schema change CANNOT be
  * adopted inside a running query (Structured Streaming pins every
  * source's schema at analysis for the lifetime of the run), so the
  * source stops LOUDLY — with this exception type, so an orchestrator
  * can auto-restart on exactly this condition (the Delta-style retry
  * loop) instead of pattern-matching message text. The NEXT start
  * adopts the evolved schema automatically: the source re-derives it
  * from the table and records the adoption in the checkpoint's
  * schema-tracking asset; the committed offset is unchanged, so the
  * missed window replays under the new shape — no rows lost, none
  * duplicated (VersionedCdfStreamSpec pins the exactly-once boundary). */
class SchemaEvolvedException(message: String)
  extends IllegalStateException(message)

private[graft] object VersionedCdfSource {

  /** Table columns (recorded schema, footer-inferred fallback) plus the
    * change column the diff emits. */
  def changeSchema(spark: SparkSession, root: String,
                   keys: Seq[String]): StructType = {
    val vs = Versioned.versions(spark, root)
    require(vs.nonEmpty,
      s"no committed versions at $root — create the table before tailing its changes")
    val base = Versioned.snapshotSchema(spark, root, Some(vs.last))
      .getOrElse(Versioned.read(spark, root).schema)
    val changeCol =
      if (keys.nonEmpty) StructField("_change_type", StringType, nullable = false)
      else StructField("_change", StringType, nullable = false)
    StructType(base.fields :+ changeCol)
  }
}

private[graft] class VersionedCdfSource(
    spark: SparkSession, root: String, keys: Seq[String],
    startingVersion: Option[Long], metadataPath: String) extends Source {

  private case class CdfOffset(v: Long) extends OffsetV1 {
    override def json(): String = v.toString
  }

  private def vOf(o: OffsetV1): Long = o.json().trim.toLong

  /** The version the FIRST batch diffs from — resolved once per stream
    * lifetime and pinned in the checkpoint metadata dir: a restart after
    * further commits must resume from its committed offset, not from a
    * freshly recomputed "newest at start" (which would silently swallow
    * the window the stream was down for). */
  private val base: Long = {
    val p = new Path(metadataPath, "graft-cdf-base")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readBase(): Long = {
      val in = f.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong finally in.close()
    }
    if (f.exists(p)) readBase()
    else {
      val vs = Versioned.versions(spark, root)
      require(vs.nonEmpty, s"no committed versions at $root")
      val b = startingVersion match {
        case Some(v) =>
          require(vs.contains(v),
            s"startingVersion $v not found at $root (have ${vs.mkString(",")})")
          v
        case None => vs.last
      }
      f.mkdirs(p.getParent)
      // atomic pin: write a uuid temp then rename-without-overwrite. A
      // crash mid-write can only orphan a temp (never a truncated pin
      // that would poison every later restart), and of two racing first
      // starts the rename loser falls back to READING the winner's pin
      // so both agree on one base.
      val tmp = new Path(metadataPath,
        s".graft-cdf-base.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
      val out = f.create(tmp, true)
      try out.write(s"$b\n".getBytes("UTF-8")) finally out.close()
      if (f.exists(p) || !f.rename(tmp, p)) {
        f.delete(tmp, false)
        readBase()
      } else b
    }
  }

  override val schema: StructType =
    VersionedCdfSource.changeSchema(spark, root, keys)

  // Schema-tracking checkpoint asset (Delta's schemaTrackingLocation
  // analogue, kept inside the stream's own metadata dir): records the
  // schema THIS generation of the query declared. On a start after an
  // evolution stop the re-derived schema differs from the recorded one
  // — that IS the adoption, made durable here so the checkpoint carries
  // an auditable record of which shape each generation ran under (and a
  // restart against an UNCHANGED table is verifiably a no-op).
  locally {
    val p = new Path(metadataPath, "graft-cdf-schema")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = schema.json
    val prior =
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
      }
    if (!prior.contains(current)) {
      f.mkdirs(p.getParent)
      val tmp = new Path(metadataPath,
        s".graft-cdf-schema.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
      val out = f.create(tmp, true)
      try out.write(current.getBytes("UTF-8")) finally out.close()
      // publish: try the direct rename first (atomic where the FS renames
      // over an existing target); only after it fails fall back to
      // delete-then-rename, so the no-record window exists only on
      // filesystems that refuse overwriting renames — and a publish that
      // STILL fails surfaces instead of silently leaving the checkpoint
      // without its audit asset
      val renamed = f.rename(tmp, p) ||
        { f.delete(p, false); f.rename(tmp, p) }
      if (!renamed) {
        f.delete(tmp, false)
        throw new java.io.IOException(
          s"graft-versioned-cdf: could not publish the schema-tracking " +
            s"asset at $p — the checkpoint would carry no record of the " +
            "schema this generation adopted")
      }
    }
  }

  override def getOffset: Option[OffsetV1] = {
    val vs = Versioned.versions(spark, root)
    // a table that HAD versions (base was pinned from them) and now
    // lists none was dropped or unmounted — fail loud, matching the
    // retention contract (a GC'd version throws; a GC'd table must not
    // stall the stream silently reporting healthy-no-data forever)
    require(vs.nonEmpty,
      s"versioned table at $root has no committed versions any more " +
        "(dropped or unmounted?) — the change feed cannot continue")
    val newest = vs.last
    if (newest <= base) None else Some(CdfOffset(newest))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(vOf).getOrElse(base)
    val to = vOf(end)
    // the defensive empty case must ALSO be streaming-marked — the V1
    // contract getBatch satisfies applies to every returned frame
    if (to <= from)
      return org.apache.spark.sql.graftx.Bridge.streamingBatch(spark, schema,
        spark.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow])
    val diff =
      if (keys.nonEmpty)
        Versioned.diffVersionsKeyed(spark, root, from, Some(to), keys)
      else Versioned.diffVersions(spark, root, from, Some(to))
    // pin column order to the declared schema, and fail loud on ANY
    // shape drift. A REMOVED column would die on its own as a
    // missing-column analysis error, but an ADDED one would not — a
    // select of the pinned names from a wider diff succeeds, silently
    // dropping the new column from every change row until a restart.
    // Both directions must stop the stream (restart re-pins the schema),
    // so compare the column sets explicitly before aligning.
    val declared = schema.fieldNames.map(_.toLowerCase).toSet
    val got = diff.columns.map(_.toLowerCase).toSet
    // TYPE drift is evolution too: a widening append (int -> long) or a
    // replace changing a column's type keeps the NAME set identical, but
    // serving the widened batch under the pinned narrower schema would
    // hand downstream operators attributes of the wrong type — detect it
    // and stop with the same typed signal the restart loop keys on
    // (shape compare ignores the field-id metadata the recorded side
    // carries)
    val declaredT = schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    val drifted = diff.schema.fields.filter(f =>
      declaredT.get(f.name.toLowerCase).exists(d =>
        !ColumnIds.sameShape(d, f.dataType)))
    if (drifted.nonEmpty)
      throw new SchemaEvolvedException(
        s"versioned table at $root changed column TYPE(s) mid-stream (" +
          drifted.map(f => s"${f.name}: " +
            s"${declaredT(f.name.toLowerCase).simpleString} -> " +
            s"${f.dataType.simpleString}").mkString(", ") +
          ") — a running query cannot change schema; the NEXT start " +
          "adopts the evolved shape automatically and replays this " +
          "window from the committed offset.")
    if (got != declared)
      throw new SchemaEvolvedException(
        s"versioned table at $root changed shape mid-stream " +
          s"(added: ${(got -- declared).mkString(", ")}; " +
          s"removed: ${(declared -- got).mkString(", ")}) — a running " +
          "query cannot change schema; the NEXT start adopts the evolved " +
          "shape automatically (schema-tracking asset in the checkpoint) " +
          "and replays this window from the committed offset. Restart, or " +
          "auto-restart on this exception type (SchemaEvolvedException).")
    // Backtick-quote: a raw col("a.b") would misparse a dotted column
    // name as nested-field access.
    val aligned = diff.select(schema.fieldNames
      .map(n => col("`" + n.replace("`", "``") + "`")).toSeq: _*)
    org.apache.spark.sql.graftx.Bridge.streamingBatch(
      spark, schema, aligned.queryExecution.toRdd)
  }

  override def stop(): Unit = ()

  override def toString: String = s"VersionedCdfSource[$root, keys=$keys]"
}
