package graft

import graft.io.Compact
import java.nio.file.Files

class CompactSpec extends SparkSpecBase {
  import spark.implicits._

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  test("compactDir folds many small files into few, preserving the data") {
    val dir = Files.createTempDirectory("compact").toFile
    val path = s"$dir/t"
    val data = (1 to 1000).map(i => (i.toLong, s"v$i"))
    data.toDF("k", "v").repartition(12).write.parquet(path)
    assert(parquetFiles(new java.io.File(path)).size == 12)

    val n = Compact.compactDir(spark, path, targetFileBytes = 1L << 30)
    assert(n == 1)
    assert(parquetFiles(new java.io.File(path)).size == 1)
    val back = spark.read.parquet(path).as[(Long, String)].collect().toSet
    assert(back == data.toSet)
    // no staging litter next to the table
    assert(!Option(dir.listFiles()).get.exists(f =>
      f.getName.endsWith(".__compact") || f.getName.endsWith(".__old")))
  }

  test("compactDir with sortCols produces range-sorted files for pruning") {
    val dir = Files.createTempDirectory("compactsort").toFile
    val path = s"$dir/t"
    val data = scala.util.Random.shuffle((1 to 2000).toList).map(i => (i.toLong, i % 7))
    data.toDF("k", "grp").repartition(10).write.parquet(path)

    Compact.compactDir(spark, path, targetFileBytes = 16L * 1024, sortCols = Seq("k"))
    val files = parquetFiles(new java.io.File(path))
    assert(files.size > 1, "expected multiple range files at this target size")
    // each file must hold a disjoint k-range (range partitioning + in-file
    // sort), which is exactly what parquet min/max pruning needs
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath).agg(
        org.apache.spark.sql.functions.min("k"),
        org.apache.spark.sql.functions.max("k"))
        .as[(Long, Long)].head()
      d
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi < lo, s"overlapping file ranges: $ranges")
      case _ =>
    }
    assert(spark.read.parquet(path).count() == 2000)
  }

  test("streaming append sink + compaction maintenance compose") {
    // the lifecycle a streaming parquet sink needs: micro-batches append
    // small files per partition; a maintenance pass folds them without
    // touching quiet partitions or losing rows
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Files.createTempDirectory("streamcompact").toFile.getAbsolutePath
    val src = MemoryStream[(Long, String)]
    val q = src.toDF().toDF("k", "day").writeStream
      .format("parquet").option("path", s"$base/t")
      .option("checkpointLocation", s"$base/ckpt")
      .partitionBy("day").start()
    try {
      (1 to 4).foreach { b =>
        src.addData((b.toLong, "d1"), (100L + b, if (b == 1) "d2" else "d1"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val d1 = new java.io.File(s"$base/t", "day=d1")
    assert(parquetFiles(d1).size >= 4, "expected one-plus small file per batch")
    val before = spark.read.parquet(s"$base/t").select("k", "day")
      .as[(Long, String)].collect().toSet

    // compacting under a live sink log must refuse: batch readers resolve
    // files through _spark_metadata and would be stranded
    val e = intercept[IllegalArgumentException] {
      Compact.compactPartitioned(spark, s"$base/t",
        targetFileBytes = 1L << 30, maxFilesPerPartition = 2)
    }
    assert(e.getMessage.contains("_spark_metadata"))

    // retiring the log converts the dir to a plain parquet table, then
    // compaction proceeds and nothing is lost
    val compacted = Compact.compactPartitioned(spark, s"$base/t",
      targetFileBytes = 1L << 30, maxFilesPerPartition = 2, retireMetadata = true)
    assert(compacted.keySet == Set("day=d1"))
    assert(parquetFiles(d1).size == 1)
    assert(spark.read.parquet(s"$base/t").select("k", "day")
      .as[(Long, String)].collect().toSet == before)
  }

  test("compactPartitioned touches only partitions over the file threshold") {
    val dir = Files.createTempDirectory("compactpart").toFile
    val path = s"$dir/t"
    val many = (1 to 500).map(i => (i.toLong, "d1"))
    val few = (1 to 10).map(i => (i.toLong, "d2"))
    many.toDF("k", "day").repartition(10).write.partitionBy("day").parquet(path)
    few.toDF("k", "day").write.mode("append").partitionBy("day").parquet(path)
    val d2Before = parquetFiles(new java.io.File(path, "day=d2")).map(_.getName).toSet

    val compacted = Compact.compactPartitioned(spark, path,
      targetFileBytes = 1L << 30, maxFilesPerPartition = 3)
    assert(compacted.keySet == Set("day=d1"))
    assert(parquetFiles(new java.io.File(path, "day=d1")).size == 1)
    // untouched partition keeps its exact files
    assert(parquetFiles(new java.io.File(path, "day=d2")).map(_.getName).toSet == d2Before)
    val back = spark.read.parquet(path).select("k", "day").as[(Long, String)].collect()
    assert(back.count(_._2 == "d1") == 500 && back.count(_._2 == "d2") == 10)
    // staging must never appear INSIDE the table root (phantom partitions
    // to concurrent readers) and the external staging root is cleaned up
    assert(!new java.io.File(path).listFiles().exists(_.getName.contains(".__")),
      "staging dirs leaked inside the table root")
    assert(!new java.io.File(path + ".__compactstage").exists())
  }
}
