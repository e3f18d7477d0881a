package graft

import org.apache.spark.sql.functions.col

/** Search-only measurement for the binary-fingerprint persisted path —
  * the binary twin of [[BenchAnnSearch]]: a celled fingerprint index and
  * a versioned corpus are built ONCE from the saved ANN model's
  * centroids (untimed; SPARK_GRAFT_ANN_FP / SPARK_GRAFT_ANN_CORPUS reuse
  * a built pair), then the SAME single query is timed at nprobe
  * 1 / cells/8 / cells through (a) the direct celled
  * `AnnIndex.binarySearch(corpusRoot)` — which pays a model read, a
  * width-probe job, an assignment job and fresh scan resolution per
  * call — and (b) a `prepareBinary` handle, which pays them once.
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_ITERS,
  * SPARK_GRAFT_ANN_MODEL (required: a trained model whose cells the
  * index adopts), SPARK_GRAFT_ANN_FP, SPARK_GRAFT_ANN_CORPUS. */
object BenchBinarySearch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scaledata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val modelRoot = sys.env.getOrElse("SPARK_GRAFT_ANN_MODEL",
      sys.error("SPARK_GRAFT_ANN_MODEL is required (a trained model root)"))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.AnnIndex

    val emb = Tables.table(spark, sfDir, "embeddings")
    val (fpRoot, corpusRoot) =
      (sys.env.get("SPARK_GRAFT_ANN_FP"), sys.env.get("SPARK_GRAFT_ANN_CORPUS")) match {
        case (Some(f), Some(c)) => (f, c)
        case _ =>
          val f = java.nio.file.Files.createTempDirectory("annbench_fp").toString
          val c = java.nio.file.Files.createTempDirectory("annbench_corpus").toString
          AnnIndex.buildBinaryIndex(spark, emb, dim = 64, f, modelRoot)
          graft.io.Versioned.commit(spark,
            emb.select(col("vec_id"), col("embedding"))
              .repartitionByRange(64, col("vec_id")),
            c, replace = true, statsCols = Seq("vec_id"),
            bloomCols = Seq("vec_id"))
          println(s"[bin-search] built fp=$f corpus=$c")
          (f, c)
      }
    val n = emb.count()
    val cells = AnnIndex.model(spark, modelRoot)._1.count().toInt

    val q1Sel = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val q1 = spark.createDataFrame(
      java.util.Arrays.asList(q1Sel.collect(): _*), q1Sel.schema)
    def time(label: String, f: () => org.apache.spark.sql.DataFrame): Double = {
      val runs = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        f().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bin-search] $label%-16s min=${runs.min}%.3f s")
      runs.min
    }
    val dNarrow = time("direct:narrow", () => AnnIndex.binarySearch(
      spark, q1, fpRoot, corpusRoot, dim = 64, k = 5, shortlist = 100,
      modelRoot, nprobe = 1))
    time("direct:mid", () => AnnIndex.binarySearch(
      spark, q1, fpRoot, corpusRoot, dim = 64, k = 5, shortlist = 100,
      modelRoot, nprobe = math.max(1, cells / 8)))
    val dWide = time("direct:wide", () => AnnIndex.binarySearch(
      spark, q1, fpRoot, corpusRoot, dim = 64, k = 5, shortlist = 100,
      modelRoot, nprobe = cells))
    println(f"[bin-search] direct wide/narrow = ${dWide / dNarrow}%.2f")

    val tp0 = System.nanoTime()
    val handle = AnnIndex.prepareBinary(spark, fpRoot, corpusRoot, dim = 64,
      modelRoot)
    println(f"[bin-search] prepare (one-time) = ${(System.nanoTime() - tp0) / 1e9}%.3f s")
    val hNarrow = time("handle:narrow", () =>
      handle.search(q1, k = 5, shortlist = 100, nprobe = 1))
    time("handle:mid", () =>
      handle.search(q1, k = 5, shortlist = 100, nprobe = math.max(1, cells / 8)))
    val hWide = time("handle:wide", () =>
      handle.search(q1, k = 5, shortlist = 100, nprobe = cells))
    println(f"[bin-search] handle wide/narrow = ${hWide / hNarrow}%.2f " +
      f"(cells=$cells, n=$n, sf=$sfDir)")
    spark.stop()
  }
}
