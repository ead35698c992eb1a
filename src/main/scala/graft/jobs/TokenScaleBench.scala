package graft.jobs

import graft.ops.{CacheTracker, Queries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-tier evidence for the token-frequency join's Zipf-head skew split
  * (VERDICT r4 task 7): the rarity aggregation over a 500k-doc corpus whose
  * token distribution has a REAL head — half of all instances land on four
  * tokens — measured both ways: the naive single `toks JOIN freq ON w`
  * (every "the" instance shuffles to one reducer key; AQE skew splitting is
  * the only guard) vs the head/tail split
  * ([[graft.ops.Queries.tokenRarityFrom]]: head keys broadcast map-side,
  * the shuffling join keeps only the bounded tail). Both produce identical
  * results (asserted); results land in BENCH.md §8.
  *
  * Run: `runMain graft.jobs.TokenScaleBench [nDocs] [cores]`
  * → one JSON line {docs, tokens, distinct_tokens, head_frac,
  *   naive_sec, split_sec}.
  */
object TokenScaleBench {

  val WordsPerDoc = 40
  val TailVocab = 50000

  /** Deterministic Zipf-headed corpus: each word position draws h =
    * hash(id, j); h even → one of 4 head tokens (50% of ALL instances),
    * h odd → one of [[TailVocab]] tail tokens (~200 instances each at
    * 500k docs — the bounded tail).
    */
  def synth(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      expr(
        s"""concat_ws(' ', transform(sequence(0, ${WordsPerDoc - 1}), j ->
           |  IF(pmod(hash(CAST(id AS INT), j), 2) = 0,
           |     element_at(array('the','of','and','to'), pmod(hash(CAST(id AS INT), j, 1), 4) + 1),
           |     concat('t', pmod(hash(CAST(id AS INT), j, 2), $TailVocab)))))""".stripMargin)
        .as("text"))

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(500000L)
    val cpus = args.lift(1).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // the A/B must compare JOIN STRATEGIES, not broadcast-threshold luck:
      // freq at 50k rows auto-broadcasts under the default 10 MB threshold,
      // which would make both variants broadcast joins at this tier (at a
      // real corpus's billions of distinct tokens freq cannot broadcast —
      // that regime is the one the split exists for)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = CacheTracker.track(
      synth(spark, nDocs).repartition(spark.sparkContext.defaultParallelism))
    docs.count()

    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val stats = toks.agg(count(lit(1)), countDistinct(col("w")),
      sum(when(col("w").isin("the", "of", "and", "to"), 1L).otherwise(0L))).collect()(0)
    val (nTok, nDistinct, nHead) = (stats.getLong(0), stats.getLong(1), stats.getLong(2))

    // naive: one hash join keyed on w — the Zipf head rides the shuffle
    val t0 = System.nanoTime()
    val freqN = toks.groupBy(col("w")).agg(count(lit(1)).as("wc"))
    val naive = toks.join(freqN, "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("wc")).as("freq_sum"), count(lit(1)).as("n_tokens"))
    val naiveRows = naive.count()
    val naiveSec = (System.nanoTime() - t0) / 1e9

    // split: head broadcast map-side, tail through the hash join (the
    // escape-hatch variant — see Queries.tokenRaritySplitFrom scaladoc)
    val t1 = System.nanoTime()
    val splitDf = Queries.tokenRaritySplitFrom(docs)
    val splitRows = splitDf.count()
    val splitSec = (System.nanoTime() - t1) / 1e9

    // identical results (order-free compare via checksum of the per-doc sums)
    val chk = (df: DataFrame) => df
      .agg(sum(expr("freq_sum * (doc_id + 1)")), sum(expr("n_tokens * (doc_id + 1)")))
      .collect()(0).toSeq
    require(naiveRows == splitRows && chk(naive.withColumnRenamed("freq_sum", "freq_sum")) ==
      chk(splitDf.select(col("doc_id"), col("freq_sum"), col("n_tokens"))),
      "split result diverged from the naive join")
    CacheTracker.releaseAll()

    println(s"""{"job":"token_scale","docs":$nDocs,"tokens":$nTok,""" +
      s""""distinct_tokens":$nDistinct,"head_frac":${math.round(nHead * 10000.0 / nTok) / 10000.0},""" +
      s""""naive_sec":${math.round(naiveSec * 1000) / 1000.0},""" +
      s""""split_sec":${math.round(splitSec * 1000) / 1000.0}}""")
    spark.stop()
  }
}
