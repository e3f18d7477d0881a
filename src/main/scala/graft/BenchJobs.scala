package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job-level profiler for single queries: runs each named query once
  * (after one warmup run at the same scale so codegen/classloading is
  * paid), recording every Spark job's wall time, description and task
  * count plus the driver-side gaps between jobs. The diagnostic that
  * answers "where do the seconds of a tiny-input query go" — job count ×
  * scheduling floor vs actual compute vs driver work between jobs.
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BenchJobs ann_drift_stats ann_recell"
  */
object BenchJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(id: Int, start: Long, var end: Long = 0L,
                            var desc: String = "", var stages: Int = 0,
                            var tasks: Int = 0)
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val r = JobRec(e.jobId, e.time)
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("")
        r.stages = e.stageInfos.size
        r.tasks = e.stageInfos.map(_.numTasks).sum
        jobs(e.jobId) = r
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()
    }

    def releasePins(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))

    val names = if (args.nonEmpty) args.toSeq else Seq("ann_drift_stats")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warmup at the same scale: codegen + shuffle topology identical
      fn(spark, sfDir).queryExecution.toRdd.count()
      releasePins()
      jobs.synchronized(jobs.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      releasePins()
      val recs = jobs.synchronized(jobs.values.toSeq.sortBy(_.start))
      val jobSec = recs.map(r => math.max(0L, r.end - r.start)).sum / 1e3
      println(s"\n===== $name wall=${f"$wall%.2f"}s jobs=${recs.size} " +
        s"jobTime=${f"$jobSec%.2f"}s driverGaps=${f"${wall - jobSec}%.2f"}s =====")
      var prevEnd = 0L
      recs.foreach { r =>
        val gap = if (prevEnd == 0L) 0.0 else math.max(0L, r.start - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, r.end)
        val dur = math.max(0L, r.end - r.start) / 1e3
        println(f"job ${r.id}%4d ${dur}%7.3fs gapBefore=${gap}%6.3fs " +
          f"stages=${r.stages}%2d tasks=${r.tasks}%4d  ${r.desc.take(90)}")
      }
    }
    spark.stop()
  }
}
