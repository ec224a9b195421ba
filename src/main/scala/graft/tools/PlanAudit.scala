package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints formatted physical plans for the named
  * declared queries (default: a representative core set). Used to
  * check pushdown / broadcast / TakeOrderedAndProject / codegen spans
  * after changes — see PLANS.md for the audited expectations.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_filter", "q16_topk", "q29_star", "q09_agg_having",
        "q01_project")
    for (name <- names) {
      println(s"===== $name =====")
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .explain("formatted")
    }
    spark.stop()
  }
}
