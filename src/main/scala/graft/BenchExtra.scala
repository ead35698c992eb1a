package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 optimization magnifying glass (guide §1.4): per-STAGE timings for
  * the expensive catalog queries, with noop-sink isolation and per-round
  * instrumentation for the iterative loops. Purely additive — `graft.Bench`
  * is the frozen driver artifact; numbers from here are cited in
  * OPTIMIZATION_r06.md only.
  *
  * `runMain graft.BenchExtra [cc|bpe|minhash|noop <query> ...]`
  */
object BenchExtra {
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
    if (sys.env.contains("GRAFT_SIZE_COALESCE")) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"""{"stage":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.3f}""")
    }

    // per-phase job/stage/task-time counters (guide §7.1 without the UI)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        if (sys.env.contains("GRAFT_STAGE_DETAIL")) {
          val i = s.stageInfo
          println(s"""{"st":${i.stageId},"tasks":${i.numTasks},""" +
            s""""run_ms":${i.taskMetrics.executorRunTime},""" +
            s""""cpu_ms":${i.taskMetrics.executorCpuTime / 1000000},""" +
            s""""deser_ms":${i.taskMetrics.executorDeserializeTime},""" +
            s""""name":"${i.name.takeWhile(_ != '\n').take(60)}"}""")
        }
      }
    })
    def counters(): String = {
      val s = s"""{"jobs":${jobs.get},"stages":${stages.get},"task_ms":${taskMs.get}}"""
      jobs.set(0); stages.set(0); taskMs.set(0); s
    }

    val modes = if (args.isEmpty) Seq("cc", "bpe") else args.toSeq
    modes.foreach {
      case "cc" =>
        // isolate the pairs prefix from the CC propagation loop, twice
        // (cold + warm in one JVM)
        (1 to 2).foreach { pass =>
          spark.sparkContext.setJobDescription(s"cc pairs pass $pass")
          val pairs = graft.ops.CacheTracker.track(
            graft.ops.Queries.minhashStarEdges(
              graft.ops.Queries.minhashSigCoreFrom(
                graft.ops.Queries.shingledFrom(
                  graft.ops.Queries.docsWithDups(spark, sfDir)))))
          time(s"cc.pairs.$pass") { println(s"""{"pairs":${pairs.count()}}""") }
          spark.sparkContext.setJobDescription(s"cc loop pass $pass")
          time(s"cc.loop.$pass") {
            println(counters())
            val comp = graft.ops.Queries.dedupComponentsFrom(spark, pairs,
              (r, changed, ms) => println(
                s"""{"cc_round":$r,"changed":$changed,"ms":$ms,"c":${counters()}}"""))
            time(s"cc.final.$pass") { noop(comp) }
          }
          graft.ops.Queries.releaseCaches()
        }
      case "ccdiag" =>
        // one manual propagation round with the executed plan printed —
        // confirms whether the edges/labels caches are actually hit
        val pairs = graft.ops.CacheTracker.track(
          graft.ops.Queries.minhashPairsCore(
            graft.ops.Queries.minhashSigCoreFrom(
              graft.ops.Queries.shingledFrom(
                graft.ops.Queries.docsWithDups(spark, sfDir))))
            .select(col("a"), col("b")))
        pairs.count()
        val edges = graft.ops.CacheTracker.track(
          pairs.unionAll(pairs.select(col("b").as("a"), col("a").as("b"))))
        val labels = graft.ops.CacheTracker.track(
          edges.select(col("a").as("id")).distinct().withColumn("label", col("id")))
        labels.count()
        labels.count()
        counters()
        (1 to 2).foreach { p =>
          time(s"ccdiag.edges_scan.$p") { edges.count() }
          println(counters())
          time(s"ccdiag.labels_scan.$p") { labels.count() }
          println(counters())
          val joined = edges.join(labels.select(col("id").as("b"), col("label")), "b")
            .select(col("a").as("id"), col("label"))
          time(s"ccdiag.join.$p") { joined.count() }
          println(counters())
          val nbrMin = joined
            .unionAll(labels.select(col("id"), col("label")))
            .groupBy(col("id")).agg(min(col("label")).as("label"))
          time(s"ccdiag.round.$p") { nbrMin.count() }
          println(counters())
          val nbrMinP = graft.ops.CacheTracker.track(nbrMin)
          val jumped = nbrMinP
            .join(nbrMinP.select(col("id").as("label"), col("label").as("jlabel")), "label")
            .select(col("id"), col("jlabel").as("label"))
          time(s"ccdiag.jump.$p") { jumped.count() }
          println(counters())
          val cut = org.apache.spark.sql.graftshim.InternalRows.cutLineage(jumped)
          time(s"ccdiag.cut.$p") { cut.count() }
          println(counters())
          graft.ops.CacheTracker.release(nbrMinP)
        }
        graft.ops.Queries.releaseCaches()
      case "dataprep" =>
        (1 to 2).foreach { pass =>
          import graft.ops.Queries
          time(s"dp.full.$pass") { noop(Queries.dataprepPipeline(spark, sfDir)) }
          Queries.releaseCaches()
          val clean = Queries.boilerplateCleaned(
            Queries.docsWithDups(spark, sfDir).select(col("doc_id"), col("text")))
            .select(col("doc_id"), col("text"))
          time(s"dp.clean.$pass") { noop(clean) }
          var exactKept: DataFrame = null
          time(s"dp.exact.$pass") {
            exactKept = graft.ops.CacheTracker.track(Queries.exactDedupKeep(clean))
            exactKept.count(); ()
          }
          var nearKept: DataFrame = null
          time(s"dp.near.$pass") {
            nearKept = graft.ops.CacheTracker.track(Queries.nearDupKeep(spark, exactKept))
            nearKept.count(); ()
          }
          time(s"dp.decon.$pass") { noop(Queries.decontaminateKeep(spark, sfDir, nearKept)) }
          Queries.releaseCaches()
        }
      case "neardup" =>
        (1 to 2).foreach { pass =>
          import graft.ops.Queries
          val clean = Queries.boilerplateCleaned(
            Queries.docsWithDups(spark, sfDir).select(col("doc_id"), col("text")))
            .select(col("doc_id"), col("text"))
          val exactKept = graft.ops.CacheTracker.track(Queries.exactDedupKeep(clean))
          exactKept.count()
          val grams = graft.ops.CacheTracker.track(Queries.shingledFrom(exactKept))
          time(s"nd.grams.$pass") { grams.count(); () }
          val pairs = Queries.minhashPairsCore(Queries.minhashSigCoreFrom(grams))
          var verified: DataFrame = null
          time(s"nd.pairs_verify.$pass") {
            verified = graft.ops.CacheTracker.track(
              Queries.jaccardVerifyProbe(grams, pairs).select(col("a"), col("b")))
            verified.count(); ()
          }
          time(s"nd.cc.$pass") {
            val comp = Queries.dedupComponentsFrom(spark, verified,
              (r, changed, ms) => println(
                s"""{"nd_cc_round":$r,"changed":$changed,"ms":$ms}"""))
            noop(comp)
          }
          graft.ops.Queries.releaseCaches()
        }
      case "bpe" =>
        (1 to 2).foreach { pass =>
          spark.sparkContext.setJobDescription(s"bpe pass $pass")
          time(s"bpe.total.$pass") {
            val m = graft.ops.Queries.bpeMergesFrom(spark,
              spark.read.parquet(s"$sfDir/documents.parquet"),
              (step, detail, ms) => println(
                s"""{"bpe_step":$step,"detail":$detail,"ms":$ms}"""))
            noop(m)
          }
          graft.ops.Queries.releaseCaches()
        }
      case "minhash" =>
        (1 to 2).foreach { pass =>
          val docs = graft.ops.Queries.docsWithDups(spark, sfDir)
          spark.sparkContext.setJobDescription(s"minhash stages pass $pass")
          time(s"mh.docs.$pass") { noop(docs) }
          val sh = graft.ops.Queries.shingledFrom(docs)
          time(s"mh.shingle.$pass") { noop(sh) }
          val sig = graft.ops.Queries.minhashSigCoreFrom(sh)
          time(s"mh.sig.$pass") { noop(sig) }
          time(s"mh.pairs.$pass") { noop(graft.ops.Queries.minhashPairsCore(sig)) }
          graft.ops.Queries.releaseCaches()
        }
      case "noop" => // handled below via trailing query names
      case s if s.startsWith("conf:") =>
        // conf:key=value — session-conf experiment knob for A/Bs
        val kv = s.stripPrefix("conf:").split("=", 2)
        spark.conf.set(kv(0), kv(1))
        println(s"""{"conf_set":"${kv(0)}","value":"${kv(1)}"}""")
      case s if s.startsWith("explain:") =>
        // explain:<suffix>:<query> → plans/r06/<query>_<suffix>.txt
        val parts = s.split(":", 3)
        val (suffix, name) = (parts(1), parts(2))
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        graft.ops.Queries.releaseCaches()
        val dir = java.nio.file.Paths.get("plans/r06")
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"""{"explained":"$name","suffix":"$suffix"}""")
      case name if SparkEntry.queries.contains(name) =>
        (1 to 2).foreach { pass =>
          spark.sparkContext.setJobDescription(s"$name pass $pass")
          time(s"$name.noop.$pass") { noop(SparkEntry.queries(name)(spark, sfDir)) }
          graft.ops.Queries.releaseCaches()
        }
      case other => System.err.println(s"[bench-extra] unknown mode/query: $other")
    }
    spark.stop()
  }
}
