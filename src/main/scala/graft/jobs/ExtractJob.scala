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
  * long tail from serializing a task. The north_rule's range-partitioned
  * write was measured against this salt on the production group shape
  * (BENCH.md §17, [[spanRows]]): range wins only on a materialized input —
  * fused behind the extraction it re-executes the upstream via its
  * sampling pass — so the salt ships here and range ships where tables are
  * rewritten from disk.
  */
object ExtractJob {

  /** Span-write salt modulus: spreads one bucket — and one folio — across
    * this many tasks. Shared with [[WriteScaleBench]] so the published
    * BENCH.md §17 adjudication cannot silently drift from the shipped plan.
    */
  val WriteSaltFactor = 16

  /** Default bucket count (resume granularity); shared with
    * [[WriteScaleBench]] for the same no-drift reason.
    */
  val DefaultBuckets = 64

  final case class Args(
      nDocs: Long = 20000L,
      seed: Long = 42L,
      out: String = "/tmp/graft_extract",
      buckets: Int = DefaultBuckets,
      groupSize: Int = 16,
      cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      failAfterGroups: Int = -1, // test hook: crash BEFORE a group's write
      failAfterWrite: Int = -1, // test hook: crash AFTER a group's write, BEFORE its lineage commit
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
    *
    * Adjudicated against `repartitionByRange(bucket, doc_id, order)` — the
    * north_rule's named mechanism — by measurement (WriteScaleBench,
    * BENCH.md §17): on a MATERIALIZED input the range write is ~1.6×
    * faster and doc-clusters the files, but its RangePartitioner SAMPLES
    * its child, which here is the un-cached generate→extract pipeline —
    * the sampling pass re-executes the whole extraction (HeartbeatSpec's
    * exactly-once-per-group docs counter read 2× when a range write was
    * tried), and doubling the narrow CPU stage costs far more than the
    * write saves. So the FUSED pipeline ships the salt; range is the
    * right shape when the written table already exists (CompactJob's
    * partition-aligned rewrite regime).
    */
  def spanRows(extracted: Dataset[DocOut], buckets: Int): DataFrame =
    extracted
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.order").as("order"), col("s.kind").as("kind"),
        col("s.media_ref").as("media_ref"), col("s.text").as("text"))
      .withColumn("bucket", bucketCol(buckets))
      .withColumn("salt", pmod(col("order"), lit(WriteSaltFactor)))
      .repartition(col("bucket"), col("salt"))
      .drop("salt")

  /** One resumable run. Returns (processedBuckets, processedDocs). */
  def run(spark: SparkSession, args: Args): (Int, Long) = {
    import spark.implicits._
    val committed = Lineage.committedPartitions(spark, args.out)
    val todo = (0 until args.buckets).filterNot(b => committed.contains(b.toLong))
    var processedDocs = 0L
    var groupsDone = 0
    // per-run progress surface (tail -f <out>/progress.jsonl mid-run)
    new java.io.File(args.out).mkdirs()
    val heartbeat = new graft.metrics.Heartbeat(spark, args.out).start()

    // Each group generates ONLY its own documents: the doc id (and so its
    // bucket) is derivable from the index before the expensive span
    // synthesis runs — the faithful model of a bucket-partition-pruned input
    // scan. (Round 1 persisted the whole Dataset[Doc], which paid full
    // encoder serialization up front and a full-cache deserialize per group.)
    val buckets = args.buckets
    try todo.grouped(args.groupSize).foreach { group =>
      if (args.failAfterGroups >= 0 && groupsDone >= args.failAfterGroups)
        throw new RuntimeException(s"injected failure after $groupsDone groups")
      val groupSet = group.toSet
      val docs: Dataset[Doc] = DocsGen.docsWhere(spark, args.nDocs, args.seed, partitions = 64) {
        docId => groupSet.contains(bucketOf(docId, buckets))
      }
      val extracted: Dataset[DocOut] = Extract.run(docs, ExtractConfig.Default, Some(heartbeat))

      // Lineage stats ride INSIDE the write job via Dataset.observe — no
      // second extraction pass and no read-back job. Per bucket: span count,
      // doc count (each doc contributes exactly its order-0 span) and the
      // order-insensitive doc hash (bit_xor over order-0 spans only, so each
      // doc is xored once; bit_xor ignores the CASE's nulls).
      val obs = org.apache.spark.sql.Observation(s"graft_stats_$groupsDone")
      val statCols: Seq[org.apache.spark.sql.Column] = group.toSeq.flatMap { b =>
        Seq(
          sum(when(col("bucket") === b, 1L).otherwise(0L)).as(s"spans_$b"),
          sum(when(col("bucket") === b && col("order") === 0, 1L).otherwise(0L)).as(s"docs_$b"),
          expr(s"bit_xor(CASE WHEN bucket = $b AND `order` = 0 THEN xxhash64(doc_id) END)").as(s"hash_$b"))
      }
      val out = spanRows(extracted, args.buckets)
        .observe(obs, statCols.head, statCols.tail: _*)
      // Idempotent group write: DYNAMIC partition overwrite replaces exactly
      // this group's bucket directories, so a crash BETWEEN the write and the
      // lineage commit cannot duplicate rows on resume (Append mode would) —
      // the retried group simply overwrites its own orphan files. Set as a
      // per-write option (a session-wide conf.set would silently change
      // overwrite semantics for every later partitioned write that shares
      // the session).
      out.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(s"${args.out}/data")
      val observed: Map[String, Any] = obs.get

      if (args.failAfterWrite >= 0 && groupsDone >= args.failAfterWrite)
        throw new RuntimeException(s"injected failure after write of group $groupsDone")

      // CER-style divergence vs an expected table (north_rule lineage metric):
      // full-outer span join per bucket; divergence = 1 - avg(nls), with
      // missing/extra spans scored 0 similarity. 0.0 when byte-identical.
      val divergenceByBucket: Map[Int, Double] = args.expected match {
        case None => Map.empty
        case Some(expectedDir) =>
          // the just-written group partitions ARE the fresh extraction —
          // a pruned read-back instead of a re-extraction pass
          val fresh = spark.read.parquet(s"${args.out}/data")
            .filter(col("bucket").isInCollection(group))
            .select(col("doc_id"), col("order"), col("text").as("new_text"),
              col("bucket").as("fresh_bucket"))
          // the expected table is written partitionBy(bucket) with the same
          // bucketing, so filtering on the partition column prunes the scan
          // to this group's directories (round 1 re-scanned the whole table
          // per group through an unprunable UDF predicate); if the dir has
          // no bucket column, fall back to the native expression (codegen'd,
          // still no ScalaUDF, just not prunable)
          val expRaw = spark.read.parquet(expectedDir)
          // normalize the partition column's type: an externally written
          // expected table may carry bucket as BIGINT (e.g. a DuckDB COPY),
          // and a long surviving through the coalesce below would poison
          // the getInt on the collected row
          val expBucketed =
            if (expRaw.columns.contains("bucket"))
              expRaw.withColumn("bucket", col("bucket").cast("int"))
            else expRaw.withColumn("bucket", bucketCol(args.buckets))
          val exp = expBucketed
            .filter(col("bucket").isInCollection(group))
            .select(col("doc_id"), col("order"), col("text").as("exp_text"),
              col("bucket").as("exp_bucket"))
          fresh.join(exp, Seq("doc_id", "order"), "full_outer")
            .withColumn("sim",
              when(col("new_text").isNull || col("exp_text").isNull, lit(0.0))
                .otherwise(graft.functions.ChurroFunctions.nls(col("new_text"), col("exp_text"))))
            // both sides carry their partition column — reuse it instead of
            // re-hashing doc_id per span row (coalesce covers the outer join)
            .withColumn("bucket", coalesce(col("fresh_bucket"), col("exp_bucket")))
            .groupBy(col("bucket"))
            .agg((lit(1.0) - avg(col("sim"))).as("divergence"))
            .collect()
            .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      }

      val now = args.clock()
      val rows = group.map { b =>
        val hash = observed.get(s"hash_$b").collect { case l: java.lang.Long => l.longValue() }
        LineageRow(
          snapshot_id = args.seed,
          partition_id = b,
          partition_hash = hash.map(java.lang.Long.toHexString).getOrElse("0"),
          doc_count = observed(s"docs_$b").asInstanceOf[Long],
          span_count = observed(s"spans_$b").asInstanceOf[Long],
          divergence = divergenceByBucket.getOrElse(b, 0.0),
          committed_at = now)
      }
      Lineage.append(spark, args.out, rows)
      processedDocs += rows.map(_.doc_count).sum
      groupsDone += 1
      heartbeat.groupsDone.add(1L)
    } finally heartbeat.stop()
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
      case Array("--fail-after-write", v) => args = args.copy(failAfterWrite = v.toInt)
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
