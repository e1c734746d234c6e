package graft

/** Dev tool: print the formatted physical plan (and optionally run) of
  * named SparkEntry queries — the `.explain("formatted")` loop the
  * plan-audit discipline runs before pinning a shape in PlanAuditSpec.
  *
  * Usage: runMain graft.Explain <sfDir> <query> [query ...]
  *        SPARK_GRAFT_EXPLAIN_RUN=1 also executes each query (so AQE's
  *        final plan is the one printed, not the initial estimate).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      // layered-table front door + SQL functions (analyzer rule
      // injection applies at session construction only)
      .config("spark.sql.extensions",
        "graft.functions.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .appName("graft-explain")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"==== $name ====")
      if (sys.env.get("SPARK_GRAFT_EXPLAIN_RUN").contains("1")) {
        val n = df.count()
        println(s"-- rows: $n (plan below is AQE-final)")
      }
      df.explain("formatted")
    }
    spark.stop()
  }
}
