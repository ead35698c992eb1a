package graft.jobs

import graft.ops.Queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-tier evidence for EXACT-SUBSTRING dedup (the q_substring_dedup
  * plan): the duplicated-gram removal chain at a 10×-rows tier over the
  * same family-chain corpus [[DedupScaleBench.synth]] uses — family members
  * share most of their 40 words, so the corpus carries HEAVY natural
  * 10-gram duplication (every shared run across 16 family members), the
  * adversarial load for this operator: a large dup-gram set, wide coverage
  * explosion, and most of every document erased. Reports the gram volume,
  * dup-set size, surviving docs/tokens, and wall time so BENCH.md can state
  * the measured per-gram cost instead of narrating one.
  *
  * Run: `runMain graft.jobs.SubstrScaleBench [nDocs] [cores]`
  * → one JSON line.
  */
object SubstrScaleBench {

  /** The REJECTED row-local shape, kept for the same-JVM A/B: collect
    * dup-gram start positions per doc (bounded by doc length), join them
    * back to the docs frame once, and erase/reassemble with higher-order
    * functions so no token row ever explodes. Plausible on paper — it
    * measured 2.2× SLOWER than the shipped explode-distinct shape
    * ([[Queries.substringDedupFrom]]): HOF lambdas evaluate interpreted
    * outside whole-stage codegen, erase costs O(len·coverage)
    * array_contains per doc, and the full words arrays still shuffle to
    * meet the start lists, while the explode shape's 10× coverage blow-up
    * collapses in the map-side partial distinct (one doc's positions are
    * co-located).
    */
  private def rowLocalShape(docsIn: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.ops.CacheTracker
    val k = Queries.SubstrGramLen
    val docs = docsIn.select(col("doc_id"), split(col("text"), " ").as("words"))
    val grams = CacheTracker.track(docs.select(col("doc_id"),
      posexplode(expr(
        s"""CASE WHEN size(words) >= $k THEN
           |  transform(sequence(0, size(words) - $k),
           |    i -> md5(concat_ws(' ', slice(words, i + 1, $k))))
           |ELSE CAST(array() AS array<string>) END""".stripMargin))
        .as(Seq("gpos", "gh"))))
    val dup = grams.groupBy(col("gh")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select(col("gh"))
    val dupStarts = grams.join(dup, Seq("gh"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_list(col("gpos")).as("starts"))
    docs.join(dupStarts, Seq("doc_id"), "left")
      .withColumn("cov", expr(
        s"""array_distinct(flatten(transform(
           |  coalesce(starts, CAST(array() AS array<int>)),
           |  s -> sequence(s, s + ${k - 1}))))""".stripMargin))
      .select(col("doc_id"), expr(
        "filter(transform(words, (w, i) -> struct(i AS pos, w AS w)), x -> NOT array_contains(cov, x.pos))")
        .as("kept"))
      .filter(size(col("kept")) > 0)
      .select(col("doc_id"), size(col("kept")).cast("bigint").as("n_kept"),
        md5(expr("array_join(transform(kept, x -> x.w), ' ')")).as("clean_sha"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(500000L)
    val cpus = args.lift(1).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = DedupScaleBench.synth(spark, nDocs)
      .repartition(spark.sparkContext.defaultParallelism)
    val gramsPerDoc = DedupScaleBench.WordsPerDoc - Queries.SubstrGramLen + 1

    val t0 = System.nanoTime()
    docs.persist()
    val nd = docs.count() // corpus synthesis off the clock of the operator
    require(nd == nDocs)
    val synthSec = (System.nanoTime() - t0) / 1e9

    // same-JVM A/B: warm both shapes once (JIT/codegen), then time each —
    // separate-JVM runs on this shared host swing ±40% and can't rank shapes
    def timed(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : (Double, org.apache.spark.sql.Row) = {
      val t = System.nanoTime()
      val r = build(docs).agg(
        count(lit(1)).as("surviving_docs"),
        sum(col("n_kept")).as("tokens_kept")).collect()(0)
      val s = (System.nanoTime() - t) / 1e9
      Queries.releaseCaches()
      (s, r)
    }
    timed(Queries.substringDedupFrom); timed(rowLocalShape) // warm pass
    // alternate the timed runs so neither shape owns a position in the JVM
    val (shipSec1, stats) = timed(Queries.substringDedupFrom)
    val (rowSec1, rowStats) = timed(rowLocalShape)
    val (shipSec2, _) = timed(Queries.substringDedupFrom)
    val (rowSec2, _) = timed(rowLocalShape)
    val sec = math.min(shipSec1, shipSec2)
    val rowLocalSec = math.min(rowSec1, rowSec2)
    require(rowStats.getLong(0) == stats.getLong(0) &&
      rowStats.getLong(1) == stats.getLong(1), "shapes must agree")
    docs.unpersist()

    val surviving = stats.getLong(0)
    val kept = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    val tokensTotal = nDocs * DedupScaleBench.WordsPerDoc
    println(s"""{"job":"substr_scale","docs":$nDocs,"grams":${nDocs * gramsPerDoc},""" +
      s""""surviving_docs":$surviving,"tokens_total":$tokensTotal,"tokens_kept":$kept,""" +
      s""""synth_sec":${math.round(synthSec * 1000) / 1000.0},""" +
      s""""sec":${math.round(sec * 1000) / 1000.0},""" +
      s""""row_local_shape_sec":${math.round(rowLocalSec * 1000) / 1000.0},""" +
      s""""docs_per_sec":${math.round(nDocs / sec)},"cores":"$cpus"}""")
    spark.stop()
  }
}
