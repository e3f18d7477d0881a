package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Column mapping by parquet FIELD IDS — the Iceberg/Delta mechanism that
  * makes RENAME/DROP COLUMN pure metadata operations, expressed through
  * Spark's own machinery instead of a custom reader:
  *
  *  - every column of a mapped table carries a stable integer id in its
  *    `StructField` metadata under Spark's native key `parquet.field.id`;
  *  - writers stamp the ids into the written parquet footers
  *    (`spark.sql.parquet.fieldId.write.enabled`);
  *  - readers hand the id-carrying schema to the (vectorized) parquet
  *    reader with `spark.sql.parquet.fieldId.read.enabled`, which then
  *    matches file columns BY ID, not by name.
  *
  * A rename is therefore one metadata commit: the logical name changes,
  * the id does not, and files written before and after the rename — which
  * disagree about the column's NAME — agree about its id. A re-added
  * column after a DROP gets a FRESH id (the `#colmaxid=` high-water mark
  * in the manifest is never reused), so old files' retired values can
  * never resurface under the new column: the resurrection hazard the
  * legacy tombstone machinery guards by refusal is structurally
  * impossible on mapped tables.
  *
  * Ids are assigned when a table is CREATED or REPLACED (conf
  * `spark.graft.columnMapping`, default on). Tables created before the
  * feature stay legacy — their files carry no ids, and retrofitting ids
  * into existing footers would mean rewriting them, so renames on legacy
  * tables refuse with the upgrade path (one replace commit, e.g.
  * `compactLatest`). A foreign file without ids slipped into a mapped
  * table fails LOUDLY at read (Spark's ignoreMissingIds default), never
  * silently as nulls.
  */
private[graft] object ColumnIds {

  /** Spark's native parquet field-id metadata key (ParquetUtils). */
  val IdKey = "parquet.field.id"

  /** Session conf: assign field ids to newly created/replaced tables. */
  val EnabledKey = "spark.graft.columnMapping"

  def enabled(spark: SparkSession): Boolean =
    spark.conf.get(EnabledKey, "true").toBoolean

  def hasIds(s: StructType): Boolean = s.fields.exists(_.metadata.contains(IdKey))

  def idOf(f: StructField): Option[Long] =
    if (f.metadata.contains(IdKey)) Some(f.metadata.getLong(IdKey)) else None

  def maxId(s: StructType): Long =
    s.fields.flatMap(idOf).maxOption.getOrElse(0L)

  /** Lower-cased name -> field id, for the fields that carry one — THE
    * id-matching projection (stamping, inheritance, and the OCC
    * footer-consistency checks all resolve through this one shape). */
  def idsByName(s: StructType): Map[String, Long] =
    s.fields.flatMap(f => idOf(f).map(f.name.toLowerCase -> _)).toMap

  private def withId(f: StructField, id: Long): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(IdKey, id).build())

  private def withoutId(f: StructField): StructField =
    if (!f.metadata.contains(IdKey)) f
    else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .remove(IdKey).build())

  /** Drop any field-id metadata — applied to every INCOMING batch schema
    * and every footer-INFERRED schema before it participates in schema
    * derivation: a user frame built from a mapped read carries the read's
    * ids on whatever columns survived its transformations, and trusting
    * them would let a renamed/derived column smuggle a wrong id into the
    * recorded schema. Only ids this module assigned are authoritative. */
  def stripIds(s: StructType): StructType = StructType(s.fields.map(withoutId))

  /** Assign fresh sequential ids (from `base + 1`) to every field that
    * does not already carry one. Carried fields keep theirs — the caller
    * passes a schema whose id-bearing fields came from the previous
    * recorded schema, and `base` is the table's id high-water mark, so a
    * fresh id can never collide with any id ever used by the table. */
  def completeIds(s: StructType, base: Long): StructType = {
    var next = math.max(base, maxId(s))
    StructType(s.fields.map { f =>
      if (f.metadata.contains(IdKey)) f
      else { next += 1; withId(f, next) }
    })
  }

  /** For rewrite commits that record the BATCH's own schema (not a merge
    * with the previous one): each field takes the id of the same-named
    * (case-insensitive) field of the previous recorded schema; genuinely
    * new names get fresh ids past `base`. */
  def inheritIds(prev: StructType, next: StructType, base: Long): StructType = {
    val byLower = idsByName(prev)
    completeIds(StructType(next.fields.map { f =>
      byLower.get(f.name.toLowerCase) match {
        case Some(id) => withId(f, id)
        case None => withoutId(f)
      }
    }), base)
  }

  /** Rewrite `df` so its output schema carries the recorded schema's
    * field-id metadata (matched by name, case-insensitive) — the step
    * that makes the parquet writer stamp ids into the footers. The id is
    * MERGED into each column's existing metadata (comments and other
    * keys the frame carries survive into the written footers); only the
    * id key itself is overwritten, so a lineage-smuggled id can never
    * beat the recorded one (see [[stripIds]]). No-op for legacy
    * (id-less) recorded schemas. */
  def stamp(df: DataFrame, recorded: StructType): DataFrame = {
    if (!hasIds(recorded)) return df
    ensureConfs(df.sparkSession)
    val ids = idsByName(recorded)
    val fieldMeta: Map[String, Metadata] =
      df.schema.fields.map(f => f.name -> f.metadata).toMap
    df.select(df.columns.toSeq.map { c =>
      val quoted = col("`" + c.replace("`", "``") + "`")
      ids.get(c.toLowerCase) match {
        case Some(id) => quoted.as(c,
          new MetadataBuilder()
            .withMetadata(fieldMeta.getOrElse(c, Metadata.empty))
            .putLong(IdKey, id).build(): Metadata)
        case None => quoted
      }
    }: _*)
  }

  /** Enable Spark's field-id read/write matching on the session. Write
    * stamping defaults on upstream but is pinned here; read matching
    * defaults OFF and must be on before any mapped-table scan is planned.
    *
    * Deliberately SESSION-WIDE, not scoped to graft reads: the conf is
    * consulted by the parquet reader at EXECUTION time, and mapped reads
    * are lazy DataFrames the caller may collect long after this call —
    * a set/restore window around planning cannot cover them, and
    * upstream exposes no per-relation option for field-id matching (a
    * cloned `newSession` would scope it but changes the frame's session
    * identity, a worse surprise). The exposure is narrow and one-sided:
    * schemas without ids keep plain name matching under these confs, so
    * nothing changes for ordinary reads; the only behavior shift is a
    * user-supplied read schema that ALREADY carries `parquet.field.id`
    * metadata (e.g. captured from an Iceberg dataset), which switches
    * from name- to id-matching — the semantics such a schema asks for.
    * A mapped (id-carrying) schema over an id-less file stays a LOUD
    * error (ignoreMissing left at its strict default). */
  def ensureConfs(spark: SparkSession): Unit = {
    if (spark.conf.get("spark.sql.parquet.fieldId.read.enabled", "false") != "true")
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    if (spark.conf.get("spark.sql.parquet.fieldId.write.enabled", "true") != "true")
      spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
  }
}
