package graft.jobs

import graft.ops.{CacheTracker, Queries}
import org.apache.spark.sql.SparkSession

/** Scale-tier evidence for the BPE trainer's vocabulary-bounded loop: the
  * corpus-scale cost is ONE word-count aggregation, and every merge round
  * runs over the bounded distinct-word table. [[TokenScaleBench.synth]]'s
  * Zipf-headed corpus has a ~50k-word vocabulary REGARDLESS of row count,
  * so scaling docs 10× should scale the corpus pass while the merge rounds
  * stay FLAT — the signature of the shape that lets tokenizer training run
  * over 10^12 docs (the loop never re-reads the corpus). Results land in
  * BENCH.md.
  *
  * Run: `runMain graft.jobs.BpeScaleBench [nDocs] [cores]` → one JSON line
  * {docs, vocab, merges, corpus_pass_sec, rounds_sec, round_avg_sec}.
  */
object BpeScaleBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(500000L)
    val cpus = args.lift(1).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = CacheTracker.track(TokenScaleBench.synth(spark, nDocs))
    docs.count() // input off the clock

    var vocab = 0L
    var corpusPassMs = 0L
    var roundsMs = 0L
    var rounds = 0
    val merges = Queries.bpeMergesFrom(spark, docs, (step, detail, ms) =>
      if (step == 0) { vocab = detail; corpusPassMs = ms }
      else { roundsMs += ms; rounds = step }).collect()
    require(merges.length == Queries.BpeMergeRounds,
      s"expected ${Queries.BpeMergeRounds} merges, got ${merges.length}")
    CacheTracker.releaseAll()
    println(f"""{"bench":"bpe","docs":$nDocs,"vocab":$vocab,"merges":$rounds,""" +
      f""""corpus_pass_sec":${corpusPassMs / 1000.0}%.3f,"rounds_sec":${roundsMs / 1000.0}%.3f,""" +
      f""""round_avg_sec":${roundsMs / 1000.0 / math.max(1, rounds)}%.3f}""")
    spark.stop()
  }
}
