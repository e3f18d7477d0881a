package graft

import org.apache.spark.sql.SparkSession

/** Job labeling (optimization guide §1.5): wrap a multi-job operation so
  * every Spark job it launches carries a readable description in the UI
  * and in the job-level profiler ([[BenchJobs]]) — the attribution that
  * turns "43 anonymous 30 ms jobs" into "6 commit, 9 encode, …".
  * Thread-local like the underlying property; restores the caller's
  * description on exit so nested labels compose (innermost wins). */
object JobDesc {
  def apply[A](spark: SparkSession, desc: String)(body: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body
    finally sc.setJobDescription(prev)
  }
}
