package graft

import graft.ops.AnnKMeans
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Trained-quantizer IVF on the clustered fixture: determinism, recall vs
  * scan budget (the round-2 verification gap: on structureless noise no
  * quantizer can beat random partitioning, so the claim needs clusterable
  * data), and the plan contract (no per-query single-task WindowExec).
  */
class AnnKMeansSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    // release before stop: tracked handles must not outlive their session
    // (a stopped context's cache blocks are gone; late unpersist NPEs)
    graft.ops.Queries.releaseCaches()
    spark.stop()
  }

  test("fixture is deterministic and clustered (member closest to own center)") {
    val c1 = AnnKMeans.candidates(spark).orderBy("vec_id").collect()
    val c2 = AnnKMeans.candidates(spark).orderBy("vec_id").collect()
    assert(c1.length == AnnKMeans.nCandidates)
    assert(c1.map(_.getSeq[Double](1)).toSeq == c2.map(_.getSeq[Double](1)).toSeq)
  }

  test("k-means centroids are deterministic across trainings") {
    val a = AnnKMeans.trainCentroids(spark)
    val b = AnnKMeans.trainCentroids(spark)
    assert(a.length == AnnKMeans.Clusters)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("ivf top-k returns 3 ranked neighbors per query") {
    val rows = AnnKMeans.ivfTopK(spark).collect()
    assert(rows.length == AnnKMeans.NumQueries * AnnKMeans.TopK)
    assert(rows.map(_.getInt(3)).forall(rn => rn >= 1 && rn <= 3))
    // each query's neighbors should come from its own planted cluster
    rows.foreach { r =>
      val q = r.getInt(0); val v = r.getInt(1)
      assert(v / AnnKMeans.PerCluster == q,
        s"query $q matched vec $v from cluster ${v / AnnKMeans.PerCluster}")
    }
  }

  test("recall@3 >= 0.9 for both scale paths at <= 25% scanned") {
    val rows = AnnKMeans.annRecall(spark).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val method = r.getString(0)
      val frac = r.getDouble(1)
      val recall = r.getDouble(2)
      assert(frac <= 0.30, s"$method scanned $frac")
      assert(recall >= 0.9, s"$method recall $recall at $frac scanned")
    }
  }

  test("no per-query WindowExec in the ivf plan (two-phase TopM)") {
    val plan = AnnKMeans.ivfTopK(spark).queryExecution.sparkPlan.toString
    // windows keyed by vec_id (bounded 16 rows/key) are fine; q_id must not
    // be a window partition key anywhere
    assert(!plan.contains("windowspecdefinition(q_id"),
      s"per-query window found in:\n$plan")
    graft.ops.Queries.releaseCaches()
  }

  test("persisted index: committed snapshots, partition-pruned search, same answer") {
    import graft.storage.Snapshots
    val root = java.nio.file.Files.createTempDirectory("ivf_index_spec").toString
    AnnKMeans.buildIndex(spark, AnnKMeans.candidates(spark), root)
    assert(Snapshots.isCommitted(s"$root/centroids", 1L))
    assert(Snapshots.isCommitted(s"$root/postings", 1L))
    // posting lists land as hive-style cent_id directories
    val dirs = new java.io.File(Snapshots.snapshotDir(s"$root/postings", 1L))
      .listFiles().filter(_.isDirectory).map(_.getName).filter(_.startsWith("cent_id="))
    assert(dirs.length == AnnKMeans.Clusters, dirs.toSeq)
    val res = AnnKMeans.searchIndex(spark, root, AnnKMeans.queries(spark))
    // the probe read PRUNES partitions: the scan carries a cent_id
    // PartitionFilter, so unprobed centroid directories are never opened
    // (string assert — AQE wraps the plan, hiding scan nodes from collect)
    val planStr = res.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [cent_id"),
      s"posting scan must carry a cent_id PartitionFilter:\n${planStr.take(4000)}")
    // same answer as the oracle-checked search path (which reads this index)
    val viaIndex = res.select("q_id", "vec_id", "rn").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    graft.ops.Queries.releaseCaches()
    val viaCatalog = AnnKMeans.ivfTopK(spark).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(3))).toSet
    graft.ops.Queries.releaseCaches()
    assert(viaIndex == viaCatalog)
  }
}
