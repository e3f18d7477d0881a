package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Quantizer-depth measurement for [[graft.ops.Similarity.semDedupAuto]]:
  * times the default two-level route against the forced THREE-level
  * route (tiny `maxBroadcastSeeds`) on the same corpus, so the depth-3
  * branch — which only self-activates once √k outgrows the broadcast
  * budget, i.e. at corpus sizes no local fixture reaches — has a
  * measured cost curve on the sf fixtures. Env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_ITERS (min-of-N), SPARK_GRAFT_TARGET
  * (targetClusterSize; small values push k up so the tree matters). */
object BenchSemDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scaledata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val target = sys.env.getOrElse("SPARK_GRAFT_TARGET", "20").toLong
    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val kept = f
        ((System.nanoTime() - t0) / 1e9, kept)
      }
      println(f"[semdedup-depth] $label%-12s min=${runs.map(_._1).min}%.3f s " +
        s"kept=${runs.head._2} sf=$sfDir target=$target")
    }
    time("two-level") {
      graft.ops.Similarity.semDedupAuto(emb, 0.2,
        targetClusterSize = target).count()
    }
    time("three-level") {
      graft.ops.Similarity.semDedupAuto(emb, 0.2,
        targetClusterSize = target, maxBroadcastSeeds = 2L).count()
    }
    spark.stop()
  }
}
