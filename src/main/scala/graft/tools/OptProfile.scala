package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import scala.util.control.NonFatal

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round attribution profiler (guide §1: measure first).
  *
  * Runs named declared entries once (after one warm-up) and prints a
  * per-entry job/stage breakdown: number of Spark jobs, total job wall
  * vs entry wall (the gap = driver-side planning/analysis time), task
  * counts, and the slowest jobs. Separates "compute-bound" entries
  * (few jobs, high task time) from "latency-bound" ones (hundreds of
  * tiny jobs whose scheduling dominates).
  *
  * Usage: sbt "runMain graft.tools.OptProfile <sfDir> <name> [name...]"
  */
object OptProfile {

  private final case class JobRec(id: Int, start: Long, var end: Long,
      var stages: Int, var tasks: Int)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: OptProfile <sfDir> <name> [name...]")
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new ConcurrentLinkedQueue[JobRec]()
    val byId = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRec(e.jobId, System.nanoTime(), 0L, e.stageIds.size, 0)
        byId.put(e.jobId, r); jobs.add(r); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = byId.get(e.jobId)
        if (r != null) r.end = System.nanoTime()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        taskTimeMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
        ()
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()

    def dropPersisted(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      try {
        fn(spark, sfDir).queryExecution.toRdd.count() // warm-up
        dropPersisted()
        Thread.sleep(100)
        jobs.clear(); byId.clear(); taskTimeMs.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        dropPersisted()
        Thread.sleep(100)
        import scala.jdk.CollectionConverters._
        val js = jobs.iterator().asScala.toSeq.filter(_.end > 0)
        val jobWall = js.map(j => (j.end - j.start) / 1e9)
        val totJob = jobWall.sum
        println(f"===== $name%s wall=$wall%.3f s =====")
        println(f"  jobs=${js.size}%d  sum(job wall)=$totJob%.3f s  " +
          f"gap(plan/driver)=${wall - totJob}%.3f s  " +
          f"task run time=${taskTimeMs.get / 1e3}%.1f s")
        val slow = js.sortBy(j => -(j.end - j.start)).take(8)
        for (j <- slow)
          println(f"    job ${j.id}%4d  ${(j.end - j.start) / 1e9}%7.3f s  " +
            f"stages=${j.stages}%d")
        val hist = jobWall.groupBy { w =>
          if (w < 0.02) "<20ms" else if (w < 0.05) "20-50ms"
          else if (w < 0.1) "50-100ms" else if (w < 0.3) "0.1-0.3s"
          else ">=0.3s"
        }.map { case (k, v) => k -> ((v.size, v.sum)) }
        for (k <- Seq("<20ms", "20-50ms", "50-100ms", "0.1-0.3s", ">=0.3s");
            (n, s) <- hist.get(k))
          println(f"    $k%-9s n=$n%4d  sum=$s%7.3f s")
      } catch {
        case NonFatal(e) =>
          println(s"===== $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
