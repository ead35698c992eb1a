package graft.jobs

import graft.layout.ExtractConfig
import graft.model.Doc
import graft.pipeline.{DocsGen, Extract}
import java.util.concurrent.atomic.AtomicInteger

/** Spark-free thread-scaling microbenchmark of the pure per-document
  * extraction function — separates engine-code scaling from Spark
  * encoder/scan overheads when diagnosing the N→4N efficiency number.
  *
  * `sbt "runMain graft.jobs.MicroBench <threads> <nDocs> <repeats>"`
  */
object MicroBench {
  def main(argv: Array[String]): Unit = {
    val threads = if (argv.length > 0) argv(0).toInt else 8
    val nDocs = if (argv.length > 1) argv(1).toInt else 200000
    val repeats = if (argv.length > 2) argv(2).toInt else 3

    val docs: Array[Doc] = {
      val arr = new Array[Doc](nDocs)
      val genThreads = Runtime.getRuntime.availableProcessors()
      val gen = (0 until genThreads).map { t =>
        new Thread(() => {
          var i = t
          while (i < nDocs) { arr(i) = DocsGen.genDoc(i.toLong, 42L); i += genThreads }
        })
      }
      gen.foreach(_.start()); gen.foreach(_.join())
      arr
    }
    val totalSpans = docs.map(_.spans.length.toLong).sum

    def once(): Double = {
      val cursor = new AtomicInteger(0)
      val t0 = System.nanoTime()
      val pool = (0 until threads).map { _ =>
        new Thread(() => {
          var i = cursor.getAndAdd(64)
          while (i < nDocs) {
            val end = math.min(i + 64, nDocs)
            var j = i
            while (j < end) {
              val r = Extract.extractDoc(docs(j), ExtractConfig.Default)
              if (r.spans.length < 0) throw new IllegalStateException
              j += 1
            }
            i = cursor.getAndAdd(64)
          }
        })
      }
      pool.foreach(_.start())
      pool.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    once(); once() // warm-ups (C2 needs a couple of passes over the hot loop)
    val best = (1 to repeats).map(_ => once()).min
    println(f"""{"bench":"micro","threads":$threads,"docs":$nDocs,"spans":$totalSpans,"sec":$best%.3f,"docs_per_sec":${nDocs / best}%.1f}""")
  }
}
