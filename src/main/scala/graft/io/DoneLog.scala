package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S11 — restartable-extraction ledger, batch form (SURVEY.md §2.1).
  *
  * The reference appends `"_".join(keys)` lines to a per-flow done-log
  * file and skips work units already present
  * (sap_scripts/sap_utils.py:20-31 record_done / is_already_done), making
  * crashed extraction runs resumable. The distributed restatement is a
  * processed-key ledger table plus a `left_anti` of the candidate work
  * units — the same semantics without a driver-side file read:
  *
  *   - `pending` is replay-idempotent: recording the same completions
  *     twice changes nothing (the ledger is key-distinct on read);
  *   - processing any partition of the pending set in any order converges
  *     to the same final ledger (property-tested in RelationalSpec).
  *
  * 100 TB note: the ledger carries keys only (units processed, not rows),
  * so it stays tiny relative to the data and broadcasts; for ledgers past
  * broadcast size, drop the hint and the anti-join shuffles on the key
  * like any equi-join.
  */
object DoneLog {

  /** The reference's composite done_key = "_".join(str(k) for k in keys). */
  def doneKey(keyCols: Seq[Column]): Column = concat_ws("_", keyCols: _*)

  /** Work units not yet processed: anti-join against the ledger keys. */
  def pending(units: DataFrame, done: DataFrame, keys: Seq[String]): DataFrame =
    units.join(broadcast(done.select(keys.map(col): _*).distinct()), keys, "left_anti")

  /** Record completions: append the processed unit keys to the ledger.
    * Append-only like the reference's `open(..., "a")`; duplicates are
    * harmless because readers distinct the keys. */
  def recordDone(processed: DataFrame, keys: Seq[String], ledgerPath: String): Unit =
    processed.select(keys.map(col): _*).distinct()
      .write.mode(SaveMode.Append).parquet(ledgerPath)

  /** Read the ledger; an absent ledger means nothing processed yet
    * (the reference's `if not os.path.exists(filepath): return False`).
    * `like` supplies the key schema for the empty-ledger frame so the
    * anti-join types line up on first run. */
  def readLedger(spark: SparkSession, ledgerPath: String, like: DataFrame,
                 keys: Seq[String]): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(ledgerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(ledgerPath)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      like.select(keys.map(col): _*).schema)
  }
}
