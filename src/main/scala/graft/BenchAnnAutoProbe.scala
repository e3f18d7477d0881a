package graft

import org.apache.spark.sql.functions.col

/** Focused diagnostic for the AUTO serve dial on a prebuilt (model,
  * codes) pair: for each probe width, print the auto cap, the probe's
  * ACTUAL kept bytes (resolved exactly as eligibility resolves them),
  * which branch the dial took, and min-of-N timings of auto vs
  * distributed — so a bench row like "auto:mid 2.1 s" is attributable
  * to the branch it took rather than guessed at. Env:
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_ANN_MODEL, SPARK_GRAFT_ANN_CODES,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_ITERS. */
object BenchAnnAutoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scaledata/sf50e")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.{AnnIndex, PreparedAnnSearch}
    val modelRoot = sys.env("SPARK_GRAFT_ANN_MODEL")
    val codesRoot = sys.env("SPARK_GRAFT_ANN_CODES")
    val emb = Tables.table(spark, sfDir, "embeddings")
    val q1Sel = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id"), col("embedding"))
    val q1 = spark.createDataFrame(
      java.util.Arrays.asList(q1Sel.collect(): _*), q1Sel.schema)
    val handle = AnnIndex.prepare(spark, modelRoot, codesRoot)
    def isLocal(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r
      }.isEmpty
    Seq(1, 16, 128).foreach { np =>
      val cap = handle.autoLocalBytesCap
      val probe = handle.search(q1, k = 3, nprobe = np,
        localBytesCap = PreparedAnnSearch.LocalBytesAuto)
      val branch = if (isLocal(probe)) "LOCAL" else "distributed"
      probe.queryExecution.executedPlan.executeCollect()
      val tAuto = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        handle.search(q1, k = 3, nprobe = np,
          localBytesCap = PreparedAnnSearch.LocalBytesAuto)
          .queryExecution.executedPlan.executeCollect()
        (System.nanoTime() - t0) / 1e9
      }.min
      val tDist = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        handle.search(q1, k = 3, nprobe = np)
          .queryExecution.executedPlan.executeCollect()
        (System.nanoTime() - t0) / 1e9
      }.min
      val kept = handle.probedKeptBytes(q1, np)
        .map(b => f"${b / 1024.0 / 1024}%.2f MB").getOrElse("unpriced")
      println(f"[auto-probe] nprobe=$np%-4d cap=${cap / 1024.0 / 1024}%.2f MB " +
        f"kept=$kept%-9s branch=$branch%-11s auto=$tAuto%.3f s " +
        f"dist=$tDist%.3f s")
    }
    spark.stop()
  }
}
