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

  /** Highest field id anywhere in the schema — NESTED struct fields
    * included (at any depth, under arrays and maps too), so the
    * `#colmaxid=` high-water mark covers every id the table has ever
    * assigned and a retired nested id can never be reassigned. */
  def maxId(s: StructType): Long = {
    def ofType(dt: org.apache.spark.sql.types.DataType): Long = dt match {
      case st: StructType => maxId(st)
      case org.apache.spark.sql.types.ArrayType(e, _) => ofType(e)
      case org.apache.spark.sql.types.MapType(k, v, _) =>
        math.max(ofType(k), ofType(v))
      case _ => 0L
    }
    s.fields.map(f => math.max(idOf(f).getOrElse(0L), ofType(f.dataType)))
      .maxOption.getOrElse(0L)
  }

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

  /** Drop any field-id metadata, RECURSIVELY (nested struct fields at
    * any depth, under arrays and maps too) — applied to every INCOMING
    * batch schema and every footer-INFERRED schema before it
    * participates in schema derivation: a user frame built from a
    * mapped read carries the read's ids on whatever columns survived
    * its transformations, and trusting them would let a renamed/derived
    * column smuggle a wrong id into the recorded schema. Only ids this
    * module assigned are authoritative. */
  def stripIds(s: StructType): StructType =
    StructType(s.fields.map(f =>
      withoutId(f).copy(dataType = stripIdsIn(f.dataType))))

  private def stripIdsIn(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case st: StructType => stripIds(st)
    case org.apache.spark.sql.types.ArrayType(e, n) =>
      org.apache.spark.sql.types.ArrayType(stripIdsIn(e), n)
    case org.apache.spark.sql.types.MapType(k, v, n) =>
      org.apache.spark.sql.types.MapType(stripIdsIn(k), stripIdsIn(v), n)
    case o => o
  }

  /** Assign fresh sequential ids (from `base + 1`) to every top-level
    * field that does not already carry one — and, for exactly those
    * FRESH fields, to their nested struct fields at every depth (every
    * file that will ever store a brand-new column carries its nested
    * ids from the first write, so nested renames inside it stay
    * possible). A field that ALREADY carries its id is left completely
    * untouched, nested state included: its existing files may predate
    * nested mapping, and retro-assigning nested ids would make the
    * id-matched reader serve those files' nested fields as NULL (the
    * reader id-matches per level once the requested group carries ids —
    * measured upstream behavior, not a guess). An old table upgrades
    * its nested mapping the same way a legacy table upgrades at all:
    * one full-rewrite replace commit, which re-assigns every id. */
  def completeIds(s: StructType, base: Long): StructType = {
    var next = math.max(base, maxId(s))
    def fillType(dt: org.apache.spark.sql.types.DataType)
        : org.apache.spark.sql.types.DataType = dt match {
      case st: StructType => StructType(st.fields.map(fill))
      case org.apache.spark.sql.types.ArrayType(e, n) =>
        org.apache.spark.sql.types.ArrayType(fillType(e), n)
      case org.apache.spark.sql.types.MapType(k, v, n) =>
        org.apache.spark.sql.types.MapType(fillType(k), fillType(v), n)
      case o => o
    }
    def fill(f: StructField): StructField = {
      val nested = f.copy(dataType = fillType(f.dataType))
      if (nested.metadata.contains(IdKey)) nested
      else { next += 1; withId(nested, next) }
    }
    StructType(s.fields.map { f =>
      if (f.metadata.contains(IdKey)) f // frozen: see scaladoc
      else fill(f)
    })
  }

  /** For rewrite commits that record the BATCH's own schema (not a merge
    * with the previous one): each field takes the id of the same-named
    * (case-insensitive) field of the previous recorded schema — nested
    * struct fields inherit RECURSIVELY along matching names wherever
    * the type shapes align (a compaction must not silently shed the
    * nested mapping it rewrites under); genuinely new names get fresh
    * ids past `base`. */
  def inheritIds(prev: StructType, next: StructType, base: Long): StructType = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType}
    def inheritType(p: DataType, n: DataType): DataType = (p, n) match {
      case (ps: StructType, ns: StructType) => inheritStruct(ps, ns)
      case (ArrayType(pe, _), ArrayType(ne, nn)) =>
        ArrayType(inheritType(pe, ne), nn)
      case (MapType(pk, pv, _), MapType(nk, nv, nn)) =>
        MapType(inheritType(pk, nk), inheritType(pv, nv), nn)
      case _ => stripIdsIn(n) // shape changed: nothing to inherit below
    }
    def inheritStruct(p: StructType, n: StructType): StructType = {
      val byLower = p.fields.map(f => f.name.toLowerCase -> f).toMap
      StructType(n.fields.map { nf =>
        byLower.get(nf.name.toLowerCase) match {
          case Some(pf) =>
            val typed = nf.copy(dataType = inheritType(pf.dataType, nf.dataType))
            idOf(pf) match {
              case Some(id) => withId(typed, id)
              case None => withoutId(typed)
            }
          case None =>
            withoutId(nf.copy(dataType = stripIdsIn(nf.dataType)))
        }
      })
    }
    completeIds(inheritStruct(prev, next), base)
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
    val recByLower: Map[String, StructField] =
      recorded.fields.map(f => f.name.toLowerCase -> f).toMap
    val fieldMeta: Map[String, Metadata] =
      df.schema.fields.map(f => f.name -> f.metadata).toMap
    df.select(df.columns.toSeq.map { c =>
      val quoted = col("`" + c.replace("`", "``") + "`")
      ids.get(c.toLowerCase) match {
        case Some(id) =>
          // NESTED ids ride the column's DataType itself (StructFields
          // inside it carry the metadata), so a recorded type holding
          // them is imposed via cast — the cast node's output type IS
          // the recorded instance, nested metadata included, and the
          // parquet writer stamps every level from it. Identity on the
          // data when shapes already agree; plain columns skip it.
          val rec = recByLower(c.toLowerCase)
          val typed =
            if (hasNestedIds(rec.dataType)) quoted.cast(rec.dataType) else quoted
          typed.as(c,
            new MetadataBuilder()
              .withMetadata(fieldMeta.getOrElse(c, Metadata.empty))
              .putLong(IdKey, id).build(): Metadata)
        case None => quoted
      }
    }: _*)
  }

  /** Structural type equality ignoring StructField METADATA at every
    * level — the shape test schema evolution needs: a recorded struct
    * whose nested fields carry ids is the SAME shape as the incoming
    * (stripped) batch struct; only genuine shape/nullability changes
    * may refuse. */
  private[io] def sameShape(a: org.apache.spark.sql.types.DataType,
                            b: org.apache.spark.sql.types.DataType): Boolean =
    clearMeta(a) == clearMeta(b)

  private def clearMeta(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(metadata = Metadata.empty, dataType = clearMeta(f.dataType))))
    case org.apache.spark.sql.types.ArrayType(e, n) =>
      org.apache.spark.sql.types.ArrayType(clearMeta(e), n)
    case org.apache.spark.sql.types.MapType(k, v, n) =>
      org.apache.spark.sql.types.MapType(clearMeta(k), clearMeta(v), n)
    case o => o
  }

  /** Does this type transitively contain a struct field carrying an id? */
  private def hasNestedIds(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case st: StructType =>
        st.fields.exists(f => f.metadata.contains(IdKey) || hasNestedIds(f.dataType))
      case org.apache.spark.sql.types.ArrayType(e, _) => hasNestedIds(e)
      case org.apache.spark.sql.types.MapType(k, v, _) =>
        hasNestedIds(k) || hasNestedIds(v)
      case _ => false
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

  /** Read-side conf for a SPECIFIC mapped schema. When it carries
    * NESTED ids, nested schema pruning must also come off: Spark's
    * pruning rule rebuilds the requested struct for a partial
    * projection in a way that breaks field-id matching for a RENAMED
    * struct column — `select("payload.u")` over files written under
    * the old name reads SILENT NULLS while the full-struct read serves
    * the values (verified against Spark 4.1.2; pruning off restores
    * the pruned projection). Correctness over the optimization.
    *
    * The disable is a ONE-WAY SESSION LATCH, stated plainly: once any
    * nested-id table is read, nested pruning stays off for the rest of
    * the session — later reads of flat tables and of non-graft nested
    * data also plan without it. Deliberate, for the same laziness
    * reason as [[ensureConfs]]: the nested-mapped frame is lazy and the
    * pruning rule consults the conf when the OPTIMIZER runs, which is
    * at first action — restoring the conf on a later flat read would
    * re-poison any still-unevaluated nested frame the caller holds
    * (back to silent nulls). The cost is an optimization, never
    * correctness: un-pruned nested reads return identical rows and
    * top-level column pruning (ReadSchema) still applies; sessions that
    * never read a nested-id table never pay it. Pinned by
    * RenameColumnSpec's latch test. */
  def ensureReadConfs(spark: SparkSession, schema: StructType): Unit = {
    ensureConfs(spark)
    if (schema.fields.exists(f => hasNestedIds(f.dataType)) &&
        spark.conf.get("spark.sql.optimizer.nestedSchemaPruning.enabled",
          "true") != "false")
      spark.conf.set("spark.sql.optimizer.nestedSchemaPruning.enabled", "false")
  }
}
