package graft.jobs

import org.apache.spark.sql.SparkSession

/** Sweep every catalog query's PHYSICAL plan for scale-hostile shapes.
  *
  * This is the plan-level audit the per-operator OpsSpec asserts sample:
  * instead of asserting a handful of known-fixed plans, it prints one line
  * per catalog query with the operators that become bottlenecks at 100 TB —
  * CartesianProduct (a join that lost its equi-condition), WindowExec (a
  * per-key sort funnel unless the key cardinality provably scales),
  * BroadcastNestedLoopJoin (fine for a tiny side, fatal for two big ones),
  * and the Exchange / SortMergeJoin counts. Usage:
  *
  *   PlanAudit [sfDir]            — plan-only sweep (no query execution
  *                                  beyond what a builder runs eagerly)
  *   PlanAudit [sfDir] dump <q>   — print one query's full physical plan
  *
  * The output is for HUMAN review: WindowExec over (doc_id) is fine (bounded
  * rows per doc), WindowExec over (q_id) against a corpus cross product is
  * the round-2 funnel. The audit surfaces them; the operator's comment must
  * justify them.
  */
object PlanAudit {
  // NB physical nodes print with the Exec suffix STRIPPED: the window node
  // is "Window [", never "WindowExec" (grepping the latter passes vacuously).
  // "Window \[" deliberately excludes WindowGroupLimit, which is the GOOD
  // shape (rank predicates pre-limited before the per-key sort).
  private val Flags = Seq(
    "CartesianProduct" -> "CartesianProduct",
    "Window" -> "Window \\[",
    "WindowGroupLimit" -> "WindowGroupLimit",
    "BroadcastNestedLoopJoin" -> "BroadcastNestedLoopJoin",
    "SortMergeJoin" -> "SortMergeJoin",
    "Exchange hashpartitioning" -> "Exchange hashpartitioning",
    "Exchange rangepartitioning" -> "Exchange rangepartitioning",
    "Exchange SinglePartition" -> "Exchange SinglePartition")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.length >= 3 && args(1) == "dump") {
      val df = graft.SparkEntry.queries(args(2))(spark, sfDir)
      println(df.queryExecution.executedPlan.toString)
      graft.ops.Queries.releaseCaches()
      spark.stop()
      return
    }

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val line =
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          val hits = Flags.flatMap { case (label, re) =>
            val n = re.r.findAllIn(plan).size
            if (n > 0) Some(s"$label=$n") else None
          }
          if (hits.isEmpty) s"$name: clean" else s"$name: ${hits.mkString(" ")}"
        } catch { case e: Throwable => s"$name: ERROR ${e.getClass.getSimpleName}: ${e.getMessage}" }
        finally graft.ops.Queries.releaseCaches()
      println(s"PLAN $line")
    }
    spark.stop()
  }
}
