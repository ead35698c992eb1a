package graft.jobs

import graft.ops.{AnnKMeans, CacheTracker, TopM}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-tier evidence for the ANN family: the trained-quantizer IVF search
  * at 100× the oracle fixture (160k vectors, 256 clusters, 64 dims, 100
  * queries vs the catalog's 1,600/16/5) with recall@3 measured against
  * in-run exact brute force. Same construction as [[graft.ops.AnnKMeans]]
  * (integer-hash clustered fixture, bounded md5-ranked training sample,
  * driver Lloyd iterations, zero-Exchange argmax assignment against the
  * centroid literal, TopM probe lists and re-rank) with the sizes
  * parameterized — the oracle fixture stays frozen to its Python twin,
  * this job answers "does the plan hold when everything is 100× bigger".
  *
  * Run: `runMain graft.jobs.AnnScaleBench [clusters] [perCluster] [queries] [cores]`
  * → one JSON line {n, index_sec, search_sec, bf_sec, recall3, scanned_frac}.
  */
object AnnScaleBench {

  val TrainSampleN = 4096
  val TopK = 3

  def main(args: Array[String]): Unit = {
    val clusters = args.headOption.map(_.toInt).getOrElse(256)
    val perCluster = args.lift(1).map(_.toInt).getOrElse(625)
    val nq = args.lift(2).map(_.toInt).getOrElse(100)
    val cpus = args.lift(3).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // default = the catalog's 25% budget; arg 5 overrides (scan/recall curve)
    val probes = args.lift(4).map(_.toInt).getOrElse(math.max(1, clusters / 4))
    val n = clusters * perCluster
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cands = CacheTracker.track(AnnKMeans.candidates(spark, n, perCluster)
      .repartition(spark.sparkContext.defaultParallelism))
    cands.count() // materialize the corpus outside the timed sections

    val t0 = System.nanoTime()
    val cents = AnnKMeans.trainCentroidsFor(cands, clusters, TrainSampleN)
    val centsLit = typedlit(cents.map(_.toSeq).toSeq)
    // zero-Exchange assignment + posting-list materialization = the index
    val assigned = CacheTracker.track(
      cands.withColumn("cent_id",
        graft.functions.ChurroFunctions.argmax_cosine(col("v"), centsLit)))
    assigned.count()
    val indexSec = (System.nanoTime() - t0) / 1e9

    import spark.implicits._
    val qs = CacheTracker.track(AnnKMeans.queries(spark, nq))
    val centsDf = cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cent_id", "cv")
    def cosC(a: String, b: String) =
      graft.functions.ChurroFunctions.cosine_sim(col(a), col(b))

    val t1 = System.nanoTime()
    // probe pairs (q_id, cent_id) are broadcast WITHOUT the query vectors
    // (nq × probes × 8B — tiny at any query volume), and the vectors
    // attach through a second broadcast of the query table: the CORPUS
    // side never shuffles. The naive `probeLists.join(assigned)` — probe
    // rows carrying qv — exceeded the broadcast threshold at 1000 queries
    // and fell back to a shuffle join that exchanged 41M vector-carrying
    // rows across only 256 join keys (measured: 4.5 s naive vs 3.9 s
    // broadcast at the same 25% scan — BENCH.md §7). Tracked: the pairs
    // also feed the scanned-fraction audit after the timed section.
    val probePairs = CacheTracker.track(TopM.topM(
      qs.crossJoin(broadcast(centsDf)).withColumn("qcos", cosC("qv", "cv"))
        .select(col("q_id"), col("cent_id"), col("qcos")),
      "q_id", Seq(("qcos", false), ("cent_id", true)), probes, "prn")
      .select(col("q_id"), col("cent_id")))
    val ivf3 = TopM.topM(
      assigned.join(broadcast(probePairs), "cent_id")
        .join(broadcast(qs), "q_id")
        .withColumn("c", cosC("qv", "v"))
        .select(col("q_id"), col("vec_id"), col("c")),
      "q_id", Seq(("c", false), ("vec_id", true)), TopK, "rn")
      .select(col("q_id"), col("vec_id")).collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val searchSec = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val bf3 = TopM.topM(
      cands.crossJoin(broadcast(qs)).withColumn("c", cosC("qv", "v"))
        .select(col("q_id"), col("vec_id"), col("c")),
      "q_id", Seq(("c", false), ("vec_id", true)), TopK, "rn")
      .select(col("q_id"), col("vec_id")).collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val bfSec = (System.nanoTime() - t2) / 1e9

    val recall = (ivf3 & bf3).size.toDouble / bf3.size
    // SUM over zero rows is NULL (empty probePairs / no assigned vectors
    // in any probed centroid) — guard instead of NPE-ing after all the
    // timed work has finished
    val scannedRow = probePairs
      .join(assigned.groupBy("cent_id").agg(count(lit(1)).as("csz")), "cent_id")
      .agg(sum("csz")).collect()(0)
    val scanned =
      (if (scannedRow.isNullAt(0)) 0.0 else scannedRow.getLong(0).toDouble) / (nq.toLong * n)
    CacheTracker.releaseAll()

    println(s"""{"job":"ann_scale","n":$n,"clusters":$clusters,"queries":$nq,""" +
      s""""probes":$probes,"index_sec":${math.round(indexSec * 1000) / 1000.0},""" +
      s""""search_sec":${math.round(searchSec * 1000) / 1000.0},""" +
      s""""bf_sec":${math.round(bfSec * 1000) / 1000.0},""" +
      s""""recall3":$recall,"scanned_frac":${math.round(scanned * 10000) / 10000.0}}""")
    spark.stop()
  }
}
