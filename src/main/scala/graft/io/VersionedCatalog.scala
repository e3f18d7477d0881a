package graft.io

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, NoSuchNamespaceException}
import org.apache.spark.sql.connector.catalog.{Column, Identifier, Table, TableCatalog, TableChange}
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
  * point) is at or before the asked instant. The catalog is read-only by
  * policy — mutation goes through [[Versioned.commit]] or
  * `Streams.versionedSink`, never DDL/DML that could bypass the manifest —
  * so create/alter/drop/rename all reject loudly.
  */
class VersionedCatalog extends TableCatalog {

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

  private def rootFor(ident: Identifier): String =
    (ident.namespace() :+ ident.name())
      .foldLeft(new Path(warehouse))(new Path(_, _)).toString

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
      s"$catalogName is read-only: $op must go through Versioned.commit / " +
        "Streams.versionedSink so the manifest protocol is never bypassed")

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    readOnly(s"CREATE TABLE $ident")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly(s"ALTER TABLE $ident")

  override def dropTable(ident: Identifier): Boolean =
    readOnly(s"DROP TABLE $ident")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly(s"RENAME TABLE $oldIdent")
}
