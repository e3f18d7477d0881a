package graft.clean

import graft.io.Versioned
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, length, max}

/** Declared-width string contracts — the engine's answer to the
  * reference's per-column `NVARCHAR(n)` declarations
  * (`pipelines/etl_zmb51.py:89-96`, `pipelines/etl_upload_excel.py:12-139`).
  * The reference's SQL Server target REFUSES an over-width value at
  * upload time ("string or binary data would be truncated"); Spark's
  * StringType carries no length, so without this glue a declared width
  * was documentation only. Widths become either
  *
  *  - a one-pass pre-write batch assertion ([[assertLengths]]) for plain
  *    parquet sinks (DimLoader targets) — fail BEFORE the write, target
  *    untouched, same observable behavior as the reference's server; or
  *  - persistent `length(c) <= n` CHECK constraints on a versioned table
  *    ([[installLengthChecks]] → [[Versioned.addConstraint]]), enforced
  *    against the WRITTEN files of every future commit/merge/update.
  *
  * Lengths are character counts (Spark `length` on strings), matching
  * NVARCHAR semantics. NULL passes (SQL CHECK on unknown) — schemaAlign
  * null-fills strings upstream anyway.
  */
object SchemaContracts {

  private def checkName(c: String): String =
    "len_" + c.toLowerCase.replaceAll("[^a-z0-9]+", "_")

  /** Derived (name, expression) CHECK pairs for a declared width map —
    * deterministic order so repeated installs compare stably. */
  def lengthChecks(widths: Map[String, Int]): Seq[(String, String)] = {
    widths.foreach { case (c, n) =>
      require(n > 0, s"declared width for `$c` must be positive, got $n")
    }
    widths.toSeq.sortBy(_._1).map { case (c, n) =>
      checkName(c) -> s"length(`$c`) <= $n"
    }
  }

  /** Validate a staged batch against declared widths in ONE aggregate
    * pass (a per-column max(length), no per-row driver work) and throw
    * BEFORE anything is written. Columns absent from the batch are
    * ignored (they'd write as NULL, which a width cannot bound). */
  def assertLengths(df: DataFrame, widths: Map[String, Int]): Unit = {
    val present = widths.toSeq.sortBy(_._1)
      .filter { case (c, _) => df.columns.contains(c) }
    if (present.isEmpty) return
    val aggs = present.map { case (c, _) => max(length(col(s"`$c`"))).as(c) }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val bad = present.zipWithIndex.flatMap { case ((c, n), i) =>
      if (!row.isNullAt(i) && row.getInt(i) > n)
        Some(s"`$c` has length ${row.getInt(i)} > NVARCHAR($n)")
      else None
    }
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"declared-width contract violated: ${bad.mkString(", ")} — " +
          "nothing was written (the reference's SQL Server target refuses " +
          "over-width values the same way)")
  }

  /** Install the derived length CHECKs on a versioned table. Idempotent:
    * an existing identical constraint is skipped; an existing SAME-NAMED
    * constraint with a DIFFERENT expression (a changed declared width) is
    * refused loudly — widening a column's contract is a deliberate
    * `dropConstraint` + reinstall, not a silent overwrite. Returns the
    * versions of the metadata commits actually made. */
  def installLengthChecks(spark: SparkSession, root: String,
                          widths: Map[String, Int]): Seq[Long] = {
    val existing = Versioned.constraints(spark, root).toMap
    lengthChecks(widths).flatMap { case (name, e) =>
      existing.get(name) match {
        case Some(cur) if cur == e => None
        case Some(cur) => throw new IllegalArgumentException(
          s"constraint `$name` already exists as '$cur' but the declared " +
            s"width derives '$e' — drop it first if the contract changed")
        case None => Some(Versioned.addConstraint(spark, root, name, e))
      }
    }
  }
}
