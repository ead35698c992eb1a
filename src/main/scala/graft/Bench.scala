package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: times every catalog query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. The flagship extraction stage additionally reports
  * docs/sec and spans/sec (the BASELINE.json headline metric); the N-vs-4N
  * scaling protocol lives in [[graft.jobs.ScalingBench]].
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Full warm pass first: one untimed-for-the-headline run of the WHOLE
    // catalog so JIT + codegen + parquet-footer-cache cost stops landing on
    // whichever queries sort first alphabetically (round-4 driver window:
    // the same extraction plan read 23.2 s at the front of the run and
    // 1.3 s at the end of the same JVM). The reported per-query times are
    // the SECOND pass; the first pass's total is published as cold_total so
    // the first-vs-repeat spread stays observable.
    // a throwing query must NOT be timed-to-crash and reported as a healthy
    // small number: failures are marked with value -1 and collected into an
    // "errors" list the consumer can alert on
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def runCatalog(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            failed += name
            false
          }
          finally graft.ops.Queries.releaseCaches() // no storage residue between queries
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    val cold = runCatalog()
    val results = runCatalog()

    // Headline: end-to-end extraction throughput on the synthesized docs table.
    val nDocs = SparkEntry.docsTier(sfDir)
    val t0 = System.nanoTime()
    val agg = SparkEntry.pipelineExtract(spark, sfDir)
      .agg(count(lit(1)).as("rows"), countDistinct(col("doc_id")).as("docs"))
      .collect()(0)
    val extractSec = (System.nanoTime() - t0) / 1e9
    // the distinct count is paid inside the timed pass anyway — read it as
    // the free cross-check that extraction covered the whole tier
    require(agg.getLong(1) == nDocs,
      s"extraction produced ${agg.getLong(1)} distinct docs, expected $nDocs")
    val docsPerSec = nDocs / extractSec
    val spansPerSec = agg.getLong(0) / extractSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val coldTotal = cold.collect { case (_, v) if v >= 0 => v }.sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val stray = graft.ops.CacheTracker.sweepStray() // teardown backstop: must be 0
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cold_total":$coldTotal%.3f,"errors":$errs,"stray_caches":$stray,"extract_docs":$nDocs,"extract_sec":$extractSec%.3f,"docs_per_sec":$docsPerSec%.1f,"spans_per_sec":$spansPerSec%.1f}""")
    spark.stop()
  }
}
