package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Search-only measurement for the candidate-pruned IVF-PQ persisted
  * path ([[graft.ops.Similarity.ivfPqTopKIndexed]]): the model and codes
  * tables are built ONCE (untimed — that is the index build, priced by
  * the ann_index_lifecycle bench), then `AnnIndex.search` is timed for a
  * NARROW query set (few probed cells) against a WIDE one (every cell),
  * at each scale fixture. The pruning claim is that search work tracks
  * the PROBED CELLS' code volume, not the corpus: the narrow search must
  * cost a fraction of the wide one on the same corpus (the fixtures
  * carry 10 IVF cells, so 1 probed cell ≈ 10% of the codes), and both
  * must stay linear across fixtures. Env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_ITERS. */
object BenchAnnSearch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scaledata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.AnnIndex

    val emb = Tables.table(spark, sfDir, "embeddings")
    val modelRoot = java.nio.file.Files.createTempDirectory("annbench_model").toString
    val codesRoot = java.nio.file.Files.createTempDirectory("annbench_codes").toString
    AnnIndex.train(spark, emb, m = 16, dsub = 4, modelRoot)
    AnnIndex.rebuild(spark, emb, modelRoot, codesRoot)
    val n = emb.count()

    def time(label: String, queries: org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        AnnIndex.search(spark, queries, modelRoot, codesRoot, k = 3)
          .queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ann-search] $label%-10s min=${runs.min}%.3f s n=$n sf=$sfDir")
    }
    // one query -> one probed cell; the 30-query set covers ~every cell
    time("narrow", emb.filter(col("vec_id") === 0L))
    time("wide", emb.filter(col("vec_id") < 30))
    spark.stop()
  }
}
