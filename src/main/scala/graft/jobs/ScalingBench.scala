package graft.jobs

import graft.layout.ExtractConfig
import graft.model.Doc
import graft.pipeline.{DocsGen, Extract}
import org.apache.spark.sql.functions._

/** Two-parallelism scaling-efficiency evidence (north_rule: ≥0.8 throughput
  * scaling efficiency between N and 4N executors; sandbox proxy is the same
  * job at `local[N]` pinned to N cores and `local[4N]` pinned to 4N cores on
  * the same input — see BASELINE.md protocol).
  *
  * Shape matches the production job: the docs table is materialized to
  * parquet ONCE (untimed; it plays the role of the input Iceberg snapshot),
  * then each timed run does read → extract (narrow mapPartitions) → count
  * consume. Two untimed warm-ups absorb JIT/codegen; best-of-`repeats` is
  * reported.
  *
  * Run: `sbt "runMain graft.jobs.ScalingBench <cores> <nDocs> <repeats>"`
  * (pin with `taskset -c 0-<cores-1>` for a faithful N-core proxy).
  */
object ScalingBench {

  def main(argv: Array[String]): Unit = {
    val cores = if (argv.length > 0) argv(0) else "8"
    val nDocs = if (argv.length > 1) argv(1).toLong else 50000L
    val repeats = if (argv.length > 2) argv(2).toInt else 3
    val spark = ExtractJob.session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val input = s"/tmp/graft_bench_docs_$nDocs"
    if (!new java.io.File(s"$input/_SUCCESS").exists()) {
      DocsGen.docs(spark, nDocs, seed = 42L, partitions = 256)
        .write.mode("overwrite").parquet(input)
    }

    // "typed" = Dataset[Doc] encoder path; "native" = the custom
    // ExtractSpansExec InternalRow path (no encoder round-trip)
    val mode = if (argv.length > 3) argv(3) else "typed"

    def once(): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val extracted =
        if (mode == "native") graft.plans.ExtractSpans.run(spark.read.parquet(input))
        else Extract.run(spark.read.parquet(input).as[Doc], ExtractConfig.Default).toDF()
      val res = extracted
        .select(count(lit(1)).as("docs"), sum(size(col("spans"))).as("spans"))
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, res.getLong(0), res.getLong(1))
    }

    once(); once() // warm-ups (JIT, codegen, parquet footers, page cache)
    val runs = (1 to repeats).map { i =>
      val (sec, d, s) = once()
      println(f"""{"bench":"scaling","cores":$cores,"run":$i,"docs":$d,"spans":$s,"sec":$sec%.3f,"docs_per_sec":${d / sec}%.1f,"spans_per_sec":${s / sec}%.1f}""")
      sec -> d
    }
    val best = runs.map(_._1).min
    val docs = runs.head._2
    println(f"""{"bench":"scaling-best","cores":$cores,"docs":$docs,"sec":$best%.3f,"docs_per_sec":${docs / best}%.1f}""")
    spark.stop()
  }
}
