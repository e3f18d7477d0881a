package graft.io

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, NoSuchNamespaceException}
import org.apache.spark.sql.connector.catalog.{Column, Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog plugin mapping identifiers to [[Versioned]] table roots under a
  * warehouse directory, so versioned tables get the full SQL time-travel
  * surface Spark reserves for catalog tables:
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.io.VersionedCatalog
  *   spark.sql.catalog.graft.warehouse = /data/warehouse
  *
  *   SELECT * FROM graft.sales.orders                    -- newest snapshot
  *   SELECT * FROM graft.sales.orders VERSION AS OF 3    -- loadTable(ident, "3")
  *   SELECT * FROM graft.sales.orders TIMESTAMP AS OF '2026-08-01 00:00:00'
  *   SHOW TABLES IN graft.sales
  * }}}
  *
  * `graft.ns1.ns2.tbl` resolves to `<warehouse>/ns1/ns2/tbl`; a table exists
  * iff that directory has committed manifests. `TIMESTAMP AS OF` resolves to
  * the newest version whose manifest publish time (the atomic-rename commit
  * point) is at or before the asked instant.
  *
  * Mutations are allowed exactly where they route through the manifest
  * protocol: CREATE TABLE publishes an empty v1 carrying the declared
  * schema (so CTAS = create + INSERT works end-to-end in SQL), INSERT
  * INTO/OVERWRITE and DELETE go through the live table's write/delete
  * surface ([[VersionedDataSource]]), and DROP TABLE removes the whole
  * root. ALTER and RENAME reject: schema evolves through append commits,
  * and a rename would silently break every reader holding the old path.
  */
class VersionedCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  /** Table root under THIS warehouse. Every identifier part must be a
    * plain path segment: a part containing a separator or dot-dot would
    * let a quoted identifier (`` `ns`.`/tmp/evil` ``) or a CALL's string
    * table argument resolve OUTSIDE the warehouse root — with the clone
    * procedure that would even CREATE a table at an arbitrary path. */
  private def rootFor(ident: Identifier): String = {
    val parts = ident.namespace() :+ ident.name()
    parts.foreach(p => require(
      p.nonEmpty && !p.contains("/") && !p.contains("\\") && p != "." && p != "..",
      s"illegal identifier part '$p': table names must not traverse paths"))
    parts.foldLeft(new Path(warehouse))(new Path(_, _)).toString
  }

  private def exists(root: String): Boolean =
    Versioned.versions(spark, root).nonEmpty

  override def tableExists(ident: Identifier): Boolean = exists(rootFor(ident))

  // one _manifests LIST per load: snapshotFiles' own "no committed
  // versions" failure IS the existence check — mapping it to
  // NoSuchTableException avoids a second LIST on the SQL hot path
  // (an object-store round trip per catalog resolution at scale)
  private def load(ident: Identifier, asOf: Option[Long]): Table =
    try VersionedDataSource.snapshotTable(spark, rootFor(ident), asOf)
    catch {
      case e: IllegalArgumentException if e.getMessage != null &&
          e.getMessage.contains("no committed versions") =>
        throw new NoSuchTableException(ident)
    }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** SQL `VERSION AS OF v`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"graft-versioned versions are integers, got '$version'"))
    load(ident, Some(v))
  }

  /** SQL `TIMESTAMP AS OF t` (micros since epoch per the connector API). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootFor(ident)
    val v = Versioned.versionAt(spark, root, timestamp / 1000L)
      .getOrElse {
        if (!exists(root)) throw new NoSuchTableException(ident)
        throw new IllegalArgumentException(
          s"no version committed at or before timestamp $timestamp at $root")
      }
    load(ident, Some(v))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(new Path(warehouse))(new Path(_, _))
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(dir)) throw new NoSuchNamespaceException(
      catalogName +: namespace)
    f.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(p => exists(p.toString))
      .map(p => Identifier.of(namespace, p.getName))
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName does not support $op: schema evolves through append " +
        "commits and paths are stable — renames would break readers")

  /** CREATE TABLE: publish an empty v1 whose manifest records the declared
    * schema — zero data files, but the table immediately reads (0 rows),
    * lists, and accepts INSERT. This is also the non-atomic half of CTAS
    * (Spark creates, then INSERTs, and drops on failure). */
  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      "partition transforms are not supported; use commitZOrdered / " +
        "writeBucketed layouts instead")
    val root = rootFor(ident)
    if (exists(root)) throw new org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException(ident.toString)
    val schema = org.apache.spark.sql.types.StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    Versioned.commit(spark, empty, root)
    load(ident, None)
  }

  /** ALTER TABLE: ADD COLUMNS (metadata-only schema commit under the
    * additive-evolution rules — existing files read the new columns as
    * null), DROP COLUMNS (metadata-only — id-guarded on mapped tables,
    * tombstoned on legacy ones, see [[Versioned.dropColumns]]), and
    * RENAME COLUMN (metadata-only via field-id column mapping — see
    * [[Versioned.renameColumn]]; legacy tables refuse with the upgrade
    * path). NOT NULL adds are impossible for existing rows and
    * positioned adds would reorder what append commits define as stable
    * — those stay refused loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    // IF EXISTS on a missing column leaves zero changes (the analyzer
    // filters it out, Spark still calls alterTable) — SQL semantics
    // require a silent no-op, not a refusal
    if (changes.isEmpty) return loadTable(ident)
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    if (renames.nonEmpty) {
      // ONE rename per statement: each rename is its own commit, so a
      // multi-rename list failing midway would leave the statement
      // half-applied with no rollback — refuse the shape instead (the
      // SQL grammar only produces one RenameColumn per ALTER anyway)
      require(renames.length == changes.length && renames.length == 1,
        "RENAME COLUMN supports exactly one column per ALTER TABLE " +
          "statement and cannot be combined with other changes")
      val r = renames.head
      require(r.fieldNames.length == 1,
        s"nested column renames are not supported: ${r.fieldNames.mkString(".")}")
      Versioned.renameColumn(spark, rootFor(ident), r.fieldNames.head, r.newName)
      return loadTable(ident)
    }
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    // DROP COLUMN: metadata-only via Versioned.dropColumns (tombstoned —
    // the name cannot come back while old files hold its values)
    if (drops.nonEmpty && drops.length == changes.length) {
      val names = drops.map { d =>
        require(d.fieldNames.length == 1,
          s"nested column drops are not supported: ${d.fieldNames.mkString(".")}")
        d.fieldNames.head
      }
      // honor per-change IF EXISTS for the names the analyzer passed
      // through (e.g. a concurrent drop raced this statement)
      val current = Versioned.snapshotSchema(spark, rootFor(ident), None)
        .map(_.fieldNames.map(_.toLowerCase).toSet)
      val (present, absent) = names.partition(n =>
        current.forall(_.contains(n.toLowerCase)))
      val hardMisses = drops.zip(names).collect {
        case (d, n) if absent.contains(n) && !d.ifExists() => n
      }
      require(hardMisses.isEmpty,
        s"column(s) not in the table schema: ${hardMisses.mkString(", ")}")
      if (present.nonEmpty)
        Versioned.dropColumns(spark, rootFor(ident), present.toSeq)
      return loadTable(ident)
    }
    if (adds.length != changes.length || adds.isEmpty)
      readOnly(s"ALTER TABLE $ident (only ADD COLUMNS / DROP COLUMNS / " +
        "RENAME COLUMN)")
    val fields = adds.map { a =>
      require(a.fieldNames.length == 1,
        s"nested column adds are not supported: ${a.fieldNames.mkString(".")}")
      require(a.isNullable,
        s"ADD COLUMN ${a.fieldNames.head} NOT NULL is impossible: existing " +
          "rows would read null")
      require(a.position() == null,
        s"positioned ADD COLUMN (${a.fieldNames.head}) is not supported: " +
          "new columns append after the existing ones")
      org.apache.spark.sql.types.StructField(a.fieldNames.head, a.dataType,
        nullable = true)
    }
    Versioned.addColumns(spark, rootFor(ident), fields)
    loadTable(ident)
  }

  /** DROP TABLE: remove the root (manifests + data). Returns false for a
    * table that never committed, per the TableCatalog contract. */
  override def dropTable(ident: Identifier): Boolean = {
    val root = new Path(rootFor(ident))
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    exists(root.toString) && f.delete(root, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly(s"RENAME TABLE $oldIdent")

  /** SQL `CALL graft.system.<proc>('ns.tbl', …)` — the maintenance surface
    * ([[VersionedProcedures]]). Table arguments are catalog-relative
    * (`'ns.tbl'`), resolved under THIS warehouse — a CALL can never reach
    * outside the warehouse root. Existence policy lives with each
    * procedure body (maintenance requires an existing table; clone's
    * TARGET must be fresh), so this lambda only maps names to roots. */
  override def loadProcedure(ident: Identifier): UnboundProcedure =
    VersionedProcedures.load(ident, tbl => {
      val parts = tbl.split("\\.").filter(_.nonEmpty)
      require(parts.nonEmpty, s"empty table name in CALL argument")
      rootFor(Identifier.of(parts.init, parts.last))
    })

  override def listProcedures(namespace: Array[String]): Array[Identifier] = {
    val ns = namespace.map(_.toLowerCase(java.util.Locale.ROOT))
    if (ns.isEmpty || ns.sameElements(Array("system")))
      VersionedProcedures.names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty
  }
}
