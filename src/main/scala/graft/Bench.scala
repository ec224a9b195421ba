package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract + BASELINE.md protocol: one warm-up
  * run, then median of 3 timed runs, per query). Prints exactly one
  * JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // global session warmup so the first query doesn't absorb JVM/
    // codegen/FileIndex initialization
    spark.range(1000).selectExpr("sum(id)").collect()

    // toRdd.count materializes every output row through the full plan;
    // a plain count() would let Catalyst prune the projections away and
    // time only scan+count.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.declared.map(_.name) // stable contract order
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t =
        try {
          timeOnce(fn) // warm-up
          val runs = Seq.fill(3)(timeOnce(fn)).sorted
          runs(1) // median
        } catch { case _: Throwable => -1.0 }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
