package graft.jobs

import graft.layout.ExtractConfig
import graft.model.{Doc, DocOut, LineageRow}
import graft.pipeline.{DocsGen, Extract}
import graft.storage.Lineage
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The spark-submit entry point: resumable, lineage-tracked span extraction.
  *
  * Shape (north_rule): read the interleaved `docs` table → hash-bucket by
  * `doc_id` → per bucket-group: narrow `mapPartitions` extraction → salted,
  * range-balanced write → lineage rows (bucket hash, doc/span counts,
  * divergence) committed atomically. A rerun reads the lineage table and
  * anti-joins committed buckets, so a kill between group commits loses at
  * most one group of work and never recomputes committed buckets.
  *
  * Skew: 0.1% of documents carry 5–10k spans (multi-page folios). Extraction
  * itself is row-local so skew only manifests at the shuffle for the
  * partitioned write; `repartition(salt)` inside each bucket plus AQE
  * (adaptive coalescing + skew splitting, enabled in [[session]]) keeps the
  * long tail from serializing a task.
  */
object ExtractJob {

  final case class Args(
      nDocs: Long = 20000L,
      seed: Long = 42L,
      out: String = "/tmp/graft_extract",
      buckets: Int = 64,
      groupSize: Int = 16,
      cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      failAfterGroups: Int = -1, // test hook: simulate a crash
      expected: Option[String] = None, // prior run's data dir → divergence metric
      clock: () => Long = () => System.currentTimeMillis())

  def session(cores: String): SparkSession =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  /** Deterministic bucket of one document (stable across runs/partitionings).
    * The DataFrame-side twin is [[graft.functions.ChurroFunctions.bucket_of]]
    * — a codegen'd native expression over the same MurmurHash3, so the write
    * and lineage plans stay inside whole-stage codegen (no ScalaUDF node).
    */
  def bucketOf(docId: String, buckets: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(docId, 42), buckets)

  private def bucketCol(buckets: Int) =
    graft.functions.ChurroFunctions.bucket_of(col("doc_id"), lit(buckets))

  /** Exploded, bucketed, salted span rows for one group's extraction — the
    * write-side plan. Salting on the SPAN order (not the doc hash) splits a
    * single 10k-span folio across 16 tasks; a per-doc salt would
    * re-serialize it (round-1 defect). Whole plan stays in codegen: the
    * bucket is a native expression, no ScalaUDF node (asserted in JobSpec).
    */
  def spanRows(extracted: Dataset[DocOut], buckets: Int): DataFrame =
    extracted
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.order").as("order"), col("s.kind").as("kind"),
        col("s.media_ref").as("media_ref"), col("s.text").as("text"))
      .withColumn("bucket", bucketCol(buckets))
      .withColumn("salt", pmod(col("order"), lit(16)))
      .repartition(col("bucket"), col("salt"))
      .drop("salt")

  /** One resumable run. Returns (processedBuckets, processedDocs). */
  def run(spark: SparkSession, args: Args): (Int, Long) = {
    import spark.implicits._
    val committed = Lineage.committedPartitions(spark, args.out)
    val todo = (0 until args.buckets).filterNot(committed.contains)
    var processedDocs = 0L
    var groupsDone = 0
    // per-run progress surface (tail -f <out>/progress.jsonl mid-run)
    new java.io.File(args.out).mkdirs()
    val heartbeat = new graft.metrics.Heartbeat(spark, args.out).start()

    // generate (≅ read the input snapshot) once; group loops filter from it.
    // At scale this is a bucket-partition-pruned table read, not a cache.
    val allDocs: Dataset[Doc] = DocsGen.docs(spark, args.nDocs, args.seed, partitions = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    try todo.grouped(args.groupSize).foreach { group =>
      if (args.failAfterGroups >= 0 && groupsDone >= args.failAfterGroups)
        throw new RuntimeException(s"injected failure after $groupsDone groups")
      val groupSet = group.toSet
      val docs: Dataset[Doc] =
        allDocs.filter((d: Doc) => groupSet.contains(bucketOf(d.doc_id, args.buckets)))
      // NOTE: extraction runs once for the write and once for the lineage
      // stats — caching the extracted rows was measured slower than
      // recomputing them (span arrays are expensive to spill)
      val extracted: Dataset[DocOut] = Extract.run(docs, ExtractConfig.Default, Some(heartbeat))

      val out = spanRows(extracted, args.buckets)
      out.write.mode(SaveMode.Append).partitionBy("bucket").parquet(s"${args.out}/data")

      // lineage rows: per-bucket doc/span counts + order-insensitive doc hash
      val stats = extracted
        .withColumn("bucket", bucketCol(args.buckets))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("docs"), sum(size(col("spans"))).as("spans"),
          expr("bit_xor(xxhash64(doc_id))").as("hash")) // order-insensitive, overflow-free
        .collect()

      // CER-style divergence vs an expected table (north_rule lineage metric):
      // full-outer span join per bucket; divergence = 1 - avg(nls), with
      // missing/extra spans scored 0 similarity. 0.0 when byte-identical.
      val divergenceByBucket: Map[Int, Double] = args.expected match {
        case None => Map.empty
        case Some(expectedDir) =>
          val fresh = extracted
            .select(col("doc_id"), explode(col("spans")).as("s"))
            .select(col("doc_id"), col("s.order").as("order"), col("s.text").as("new_text"))
          // the expected table is written partitionBy(bucket) with the same
          // bucketing, so filtering on the partition column prunes the scan
          // to this group's directories (round 1 re-scanned the whole table
          // per group through an unprunable UDF predicate); if the dir has
          // no bucket column, fall back to the native expression (codegen'd,
          // still no ScalaUDF, just not prunable)
          val expRaw = spark.read.parquet(expectedDir)
          val expBucketed =
            if (expRaw.columns.contains("bucket")) expRaw
            else expRaw.withColumn("bucket", bucketCol(args.buckets))
          val exp = expBucketed
            .filter(col("bucket").isInCollection(group))
            .select(col("doc_id"), col("order"), col("text").as("exp_text"))
          fresh.join(exp, Seq("doc_id", "order"), "full_outer")
            .withColumn("sim",
              when(col("new_text").isNull || col("exp_text").isNull, lit(0.0))
                .otherwise(graft.functions.ChurroFunctions.nls(col("new_text"), col("exp_text"))))
            .withColumn("bucket", bucketCol(args.buckets))
            .groupBy(col("bucket"))
            .agg((lit(1.0) - avg(col("sim"))).as("divergence"))
            .collect()
            .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      }

      val now = args.clock()
      val rows = group.map { b =>
        val r = stats.find(_.getInt(0) == b)
        LineageRow(
          snapshot_id = args.seed,
          partition_id = b,
          partition_hash = r.map(x => java.lang.Long.toHexString(x.getLong(3))).getOrElse("0"),
          doc_count = r.map(_.getLong(1)).getOrElse(0L),
          span_count = r.map(_.getLong(2)).getOrElse(0L),
          divergence = divergenceByBucket.getOrElse(b, 0.0),
          committed_at = now)
      }
      Lineage.append(spark, args.out, rows)
      processedDocs += rows.map(_.doc_count).sum
      groupsDone += 1
      heartbeat.groupsDone.add(1L)
    } finally { heartbeat.stop(); allDocs.unpersist() }
    (todo.size, processedDocs)
  }

  def main(argv: Array[String]): Unit = {
    var args = Args()
    argv.sliding(2, 2).foreach {
      case Array("--docs", v) => args = args.copy(nDocs = v.toLong)
      case Array("--seed", v) => args = args.copy(seed = v.toLong)
      case Array("--out", v) => args = args.copy(out = v)
      case Array("--buckets", v) => args = args.copy(buckets = v.toInt)
      case Array("--group-size", v) => args = args.copy(groupSize = v.toInt)
      case Array("--cores", v) => args = args.copy(cores = v)
      case Array("--fail-after", v) => args = args.copy(failAfterGroups = v.toInt)
      case Array("--expected", v) => args = args.copy(expected = Some(v))
      case other => throw new IllegalArgumentException(other.mkString(" "))
    }
    val spark = session(args.cores)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val (buckets, docs) = run(spark, args)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"job":"extract","buckets":$buckets,"docs":$docs,"sec":$sec%.3f,"docs_per_sec":${docs / math.max(sec, 1e-9)}%.1f}""")
    spark.stop()
  }
}
