package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Job-level profiler for composite queries: runs each named query once
  * (after one untimed warm-up) with a listener that records every Spark
  * job's wall time and description, then prints a per-job table. The
  * multi-job store-maintenance queries (x185/x187/x188/x189/x76/x190/
  * x191) spend their time across many small jobs — per-query totals
  * alone cannot say which pass to optimize (guide §1.1: find where the
  * time actually goes before changing anything).
  *
  * Usage: `runMain graft.Profile <sfDir> <queryName...]`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class Job(id: Int, desc: String, start: Long, var end: Long = -1L)
    val jobs = mutable.ArrayBuffer.empty[Job]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobs += Job(js.jobId, desc, js.time)
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == je.jobId).foreach(_.end = je.time)
        }
    }
    // session warm-up
    spark.range(1000).selectExpr("sum(id)").collect()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm-up, unprofiled
      graft.util.Caches.releaseAll(spark)
      spark.catalog.clearCache()
      System.gc()
      jobs.synchronized(jobs.clear())
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain the last JobEnd
      spark.sparkContext.removeSparkListener(listener)
      println(f"\n=== $name total ${total}%.3f s, ${jobs.size} jobs ===")
      jobs.synchronized {
        jobs.sortBy(_.start).foreach { j =>
          val dur = if (j.end >= 0) (j.end - j.start) / 1e3 else -1.0
          println(f"  job ${j.id}%3d ${dur}%7.3f s  ${j.desc.take(100)}")
        }
        val accounted = jobs.filter(_.end >= 0)
          .map(j => (j.end - j.start) / 1e3).sum
        println(f"  accounted in jobs: ${accounted}%.3f s " +
          f"(gaps = planning/FS/driver: ${total - accounted}%.3f s)")
      }
      graft.util.Caches.releaseAll(spark)
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
