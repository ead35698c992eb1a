package graft.jobs

import graft.layout.ExtractConfig
import graft.pipeline.{DocsGen, Extract}
import org.apache.spark.sql.functions._

/** Two-parallelism scaling-efficiency evidence (north_rule: ≥0.8 throughput
  * scaling efficiency between N and 4N executors; sandbox proxy is the same
  * job at local[N] and local[4N] on the same deterministic input — see
  * BASELINE.md protocol).
  *
  * Measures the end-to-end extract stage (generate → extract → exhaustive
  * span consumption) with one warm-up and `repeats` timed runs; prints one
  * JSON line per run plus a summary. Run via:
  * `sbt "runMain graft.jobs.ScalingBench <cores> <nDocs> <repeats>"`
  */
object ScalingBench {

  def main(argv: Array[String]): Unit = {
    val cores = if (argv.length > 0) argv(0) else "8"
    val nDocs = if (argv.length > 1) argv(1).toLong else 50000L
    val repeats = if (argv.length > 2) argv(2).toInt else 3
    val spark = ExtractJob.session(cores)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def once(): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val docs = DocsGen.docs(spark, nDocs, seed = 42L, partitions = cores.toInt * 4)
      val res = Extract.run(docs, ExtractConfig.Default)
        .select(count(lit(1)).as("docs"), sum(size(col("spans"))).as("spans"))
        .collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, res.getLong(0), res.getLong(1))
    }

    once() // warm-up (JIT, codegen, parquet-free path)
    val runs = (1 to repeats).map { i =>
      val (sec, d, s) = once()
      println(f"""{"bench":"scaling","cores":$cores,"run":$i,"docs":$d,"spans":$s,"sec":$sec%.3f,"docs_per_sec":${d / sec}%.1f}""")
      sec -> d
    }
    val best = runs.map(_._1).min
    val docs = runs.head._2
    println(f"""{"bench":"scaling-best","cores":$cores,"docs":$docs,"sec":$best%.3f,"docs_per_sec":${docs / best}%.1f}""")
    spark.stop()
  }
}
