package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionDirectory, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType

/** Structured Streaming source over a [[Versioned]] table: offsets ARE
  * version numbers, so `spark.readStream.format("graft-versioned")` tails
  * commits with exactly-once semantics — each micro-batch reads precisely
  * the files appended between two committed versions (the same file-diff
  * as [[Versioned.readChanges]]), and a restarted stream resumes from the
  * checkpointed version. The first batch processes the whole table as of
  * stream start (offset 0 → newest), matching file-source semantics.
  *
  * Row reading delegates to the native vectorized parquet reader: the
  * batch [[ParquetScan]] built by the scan builder (with whatever column
  * pruning the streaming query pushed) provides the PartitionReaderFactory;
  * this class only plans WHICH files make up each batch. Retention
  * contract: `vacuum` must keep at least the versions a lagging consumer
  * still needs — the standard lake-streaming tradeoff, surfaced loudly as
  * a missing-version error rather than silent skipped data.
  */
private[graft] class VersionedMicroBatchStream(
    spark: SparkSession, root: String, template: ParquetScan,
    maxVersionsPerTrigger: Option[Long] = None)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  private case class VOffset(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  // The table's recorded schema as of THIS RUN's start — what the
  // consumer's pinned scan was planned against. The evolution guard in
  // planInputPartitions compares batch-end schemas against THIS (not
  // from-vs-to: the restart that adopts an evolution legitimately spans
  // the version that evolved, and must pass). One manifest read per
  // stream start.
  private val pinnedSchema: Option[StructType] =
    Versioned.versions(spark, root).lastOption
      .flatMap(v => Versioned.snapshotSchema(spark, root, Some(v)))

  override def initialOffset(): Offset = VOffset(0L)

  override def latestOffset(): Offset =
    VOffset(Versioned.versions(spark, root).lastOption.getOrElse(0L))

  /** Admission control: cap each micro-batch at `maxVersionsPerTrigger`
    * commits past the start offset — the lake-streaming backpressure knob
    * (a stream started against years of history catches up in bounded
    * batches instead of one giant first batch). The cap advances along the
    * COMMITTED version list, not offset arithmetic: after a vacuum the
    * surviving versions need not start at start+1 (a fresh stream over
    * versions [6,7] must plan v6, not a nonexistent v1). Uncapped without
    * the option. */
  override def latestOffset(start: Offset,
                            limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val vs = Versioned.versions(spark, root)
    val newest = vs.lastOption.getOrElse(0L)
    val s = start.asInstanceOf[VOffset].v
    VOffset(maxVersionsPerTrigger.fold(newest)(m =>
      vs.filter(_ > s).take(math.min(m, Int.MaxValue.toLong).toInt)
        .lastOption.getOrElse(s)))
  }

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset = VOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = () // progress lives in the checkpoint

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[VOffset].v
    val to = end.asInstanceOf[VOffset].v
    if (to <= from) return Array.empty
    // Append-only guard: a copy-on-write rewrite (DELETE/UPDATE/MERGE,
    // compaction, replace) between the offsets REMOVES files, and the
    // added-file diff would then re-emit every surviving row of the
    // rewritten files as if it were new data. Fail loudly instead of
    // silently duplicating — the consumer must restart from a fresh
    // snapshot (or switch to diffVersions for row-level changes). Both
    // boundary manifests are read ONCE and the removed-set check and the
    // added-file diff derive from the same two lists (metadata RPCs are
    // the steady-state cost of a low-latency tail).
    // Deletion-vector guard, the merge-on-read twin of the removed-file
    // check below: a vector landing between the offsets deletes rows the
    // stream may already have emitted (or is about to emit from raw
    // files the template scan cannot vector-filter). Fail loudly — the
    // consumer materializes (Versioned.dvMaterialize) and restarts.
    val dvTo = Versioned.dvEntries(spark, root, Some(to))
    if (from == 0L)
      require(dvTo.isEmpty,
        s"versioned stream cannot start from a snapshot carrying deletion " +
          s"vectors (v$to at $root): the micro-batch scan reads raw files " +
          "and would resurrect deleted rows — run Versioned.dvMaterialize / " +
          "CALL graft.system.dv_materialize first")
    else
      require(Versioned.dvEntries(spark, root, Some(from)) == dvTo,
        s"versioned stream requires append-only history, but v$from..v$to " +
          s"changed deletion vectors (merge-on-read delete landed mid-stream); " +
          "restart from a materialized snapshot or use Versioned.diffVersions " +
          "for row-level changes")
    // Schema-evolution guard, the append-only sibling of the CDF
    // source's typed stop. The micro-batch reads RAW FILES under the
    // scan pinned at stream start, so:
    //  - an ADDED column's values in the new files would be SILENTLY
    //    dropped from every emitted row until a restart (the rows are
    //    never re-emitted — permanent loss for the consumer), and
    //  - a WIDENED column would surface as a raw vectorized-reader
    //    type error, loud but untyped.
    // Both stop with SchemaEvolvedException — the signal auto-restart
    // loops key on; the NEXT start re-pins the evolved schema. A pure
    // RENAME keeps field ids and types and passes (the spec-pinned
    // posture: metadata-only renames keep the tail flowing under the
    // pinned names); a metadata-only DROP also passes (the subscribed
    // columns' data still flows from the unchanged files).
    (pinnedSchema, Versioned.snapshotSchema(spark, root, Some(to))) match {
        case (Some(a), Some(b)) =>
          val mapped = ColumnIds.hasIds(a) && ColumnIds.hasIds(b)
          def keyOf(f: org.apache.spark.sql.types.StructField): String =
            if (mapped) ColumnIds.idOf(f).map(_.toString)
              .getOrElse(f.name.toLowerCase)
            else f.name.toLowerCase
          val aByKey = a.fields.map(f => keyOf(f) -> f).toMap
          val added = b.fields.filterNot(f => aByKey.contains(keyOf(f)))
          if (added.nonEmpty)
            throw new SchemaEvolvedException(
              s"versioned table at $root gained column(s) " +
                s"${added.map(_.name).mkString(", ")} mid-stream " +
                s"(v$from..v$to): the pinned scan would silently drop " +
                "their values from every emitted row — restart to adopt " +
                "the evolved schema (auto-restart on this exception type).")
          val widened = b.fields.flatMap(f => aByKey.get(keyOf(f))
            .filterNot(pf => ColumnIds.sameShape(pf.dataType, f.dataType))
            .map(pf => s"${f.name}: ${pf.dataType.simpleString} -> " +
              s"${f.dataType.simpleString}"))
          if (widened.nonEmpty)
            throw new SchemaEvolvedException(
              s"versioned table at $root changed column TYPE(s) " +
                s"mid-stream (${widened.mkString(", ")}, v$from..v$to) — " +
                "restart to adopt the evolved schema (auto-restart on " +
                "this exception type).")
        case _ => () // legacy pre-schema-tracking: no recorded shapes
    }
    val files =
      if (from == 0L) Versioned.snapshotFiles(spark, root, Some(to))
      else {
        val fromFiles = Versioned.snapshotFiles(spark, root, Some(from)).toSet
        val toFiles = Versioned.snapshotFiles(spark, root, Some(to))
        val removed = fromFiles -- toFiles.toSet
        require(removed.isEmpty,
          s"versioned stream requires append-only history, but v$from..v$to " +
            s"removed ${removed.size} file(s) (copy-on-write rewrite, compaction, " +
            "or replace landed mid-stream); restart from a fresh snapshot or use " +
            "Versioned.diffVersions for row-level changes")
        toFiles.filterNot(fromFiles)
      }
    if (files.isEmpty) return Array.empty
    val statuses = files.map { f =>
      val p = new Path(f)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p)
    }
    val partitioned = statuses.map { s =>
      PartitionedFile(InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPath(s.getPath),
        0L, s.getLen, Array.empty[String], s.getModificationTime, s.getLen)
    }
    val maxSplit = FilePartition.maxSplitBytes(spark,
      Seq(PartitionDirectory(InternalRow.empty, statuses.toArray)))
    FilePartition.getFilePartitions(spark, partitioned, maxSplit).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    template.createReaderFactory()

  override def stop(): Unit = ()
}

/** Scan wrapper handed out by the versioned table: batch reads delegate
  * untouched to the native parquet scan (pushdown already happened on the
  * builder); streaming reads get the version-offset micro-batch stream.
  * Statistics and columnar hints are forwarded so batch planning (broadcast
  * decisions, vectorized reads) is identical to the unwrapped scan.
  *
  * Also implements DYNAMIC FILE PRUNING via [[SupportsRuntimeFiltering]]:
  * when the table is the probe side of a broadcast join, Spark's dynamic
  * partition pruning hands this scan the build side's join-key values at
  * runtime, and any file whose sidecar min/max excludes every value is
  * skipped before it is opened — the join-driven analog of the static
  * WHERE-range pruning, and the piece that makes "join 100 TB of facts to
  * this week's dim slice" open ~the matching files instead of all of them.
  * The runtime filter never mutates the table's shared file index (a
  * self-join's two scans carry different predicates): it swaps in a fresh
  * scan over a derived index with the keep-set baked in. Conservative by
  * construction — unknown filter shapes, columns without sidecar stats,
  * or unconvertible values prune nothing, and the join itself re-checks
  * every surviving row. */
private[graft] class VersionedScan(spark: SparkSession, root: String,
                                   inner: ParquetScan,
                                   maxVersionsPerTrigger: Option[Long] = None)
  extends Scan with SupportsReportStatistics with SupportsRuntimeFiltering {

  // the scan batch reads plan against; replaced by a runtime filter
  @volatile private var current: ParquetScan = inner

  /** Files kept by the last runtime filter (-1 until one ran) — spec hook. */
  @volatile private[graft] var lastRuntimeKept: Int = -1

  private def statsIndex: Option[StatsPrunedFileIndex] = inner.fileIndex match {
    case s: StatsPrunedFileIndex => Some(s)
    case _ => None
  }

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String = s"graft-versioned $root ${inner.description()}"
  override def toBatch: Batch = current.toBatch
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new VersionedMicroBatchStream(spark, root, inner, maxVersionsPerTrigger)
  override def estimateStatistics(): Statistics = inner.estimateStatistics()
  override def supportedCustomMetrics(): Array[CustomMetric] = inner.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[CustomTaskMetric] = inner.reportDriverMetrics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode = inner.columnarSupportMode()

  override def filterAttributes(): Array[NamedReference] =
    statsIndex.fold(Array.empty[NamedReference]) { idx =>
      // only columns the scan actually OUTPUTS: Spark binds these
      // references against the PRUNED read schema, so naming a
      // stats-tracked column that the projection dropped fails the
      // whole query at analysis ("unable to resolve <col> given
      // [<projected cols>]") — surfaced the moment a table harvested
      // stats for a column some reader never selects (the codes
      // table's cluster stats vs the sink's vec_id-only guard probe)
      val out = inner.readSchema().fieldNames.toSet
      idx.runtimeColumns.filter(out).toArray.sorted.map(Expressions.column)
    }

  override def filter(filters: Array[Filter]): Unit = statsIndex.foreach { idx =>
    // IN / = over a stats- or bloom-tracked column -> candidate value set;
    // null literals can never equi-join, so they add no candidates.
    // Anything else: no-op.
    val sets = filters.toSeq.collect {
      case In(col, vs) if idx.runtimeColumns(col) => col -> vs.toSeq.filter(_ != null)
      case EqualTo(col, v) if idx.runtimeColumns(col) && v != null => col -> Seq(v)
    }.filter(_._2.nonEmpty)
    if (sets.nonEmpty) {
      val keep = idx.runtimeSurvivors(sets)
      lastRuntimeKept = keep.size
      idx.lastRuntimeKept = keep.size // spec observability on the shared index
      current = inner.copy(fileIndex = idx.withRuntimeKeep(keep))
    }
  }
}

/** ScanBuilder that keeps the native [[ParquetScanBuilder]] pushdown path
  * (columns, Catalyst filters, aggregates) but wraps the built scan in
  * [[VersionedScan]] so `readStream.format("graft-versioned")` works. */
private[graft] class VersionedScanBuilder(spark: SparkSession, root: String,
                                          inner: ParquetScanBuilder,
                                          maxVersionsPerTrigger: Option[Long] = None)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates {
  override def build(): Scan =
    new VersionedScan(spark, root, inner.build(), maxVersionsPerTrigger)
  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner.pushFilters(filters)
  override def pushedFilters: Array[Predicate] = inner.pushedFilters
  override def pushAggregation(aggregation: Aggregation): Boolean =
    inner.pushAggregation(aggregation)
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    inner.supportCompletePushDown(aggregation)
}
