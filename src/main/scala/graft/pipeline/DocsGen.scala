package graft.pipeline

import graft.model.{Doc, Span}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthesized `docs` table (FIXTURES.md §1).
  *
  * Seeded, reproducible, no external data. The template pool exercises every
  * normalizer/layout branch: output tags, chat scaffold, stop tokens, markup,
  * HistoricalDocument XML, MinerU layout token streams with containment
  * cases, OTSL tables (with absorbed-image tokens), equations + equation
  * blocks, CJK merge_prev continuations, and media spans. 0.1% of docs get a
  * multi-thousand-span long tail (skew case for salting/AQE evidence).
  *
  * Determinism: per-doc splitmix64 stream seeded by (seed, docIndex); no
  * wall-clock, no JVM hash randomization.
  */
object DocsGen {

  final class Rng(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int =
      java.lang.Long.remainderUnsigned(nextLong(), bound.toLong).toInt
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  private val words = Vector(
    "history", "archive", "folio", "ledger", "charter", "codex", "scribe",
    "margin", "vellum", "quill", "parish", "census", "deed", "seal",
    "witness", "clause", "tithe", "manor", "grant", "abbey")

  private def sentence(rng: Rng, n: Int): String =
    (0 until n).map(_ => words(rng.nextInt(words.length))).mkString(" ")

  /** One plain-text payload with normalizer-branch variety. */
  private def textPayload(rng: Rng, docId: String, i: Int): String = {
    rng.nextInt(8) match {
      case 0 => s"<output>\n${sentence(rng, 6)}\n</output>"
      case 1 => s"assistant:\n${sentence(rng, 5)} of $docId"
      case 2 => s"**${sentence(rng, 3)}** and `${words(rng.nextInt(words.length))}` [link](http://x) ![img](y.png)"
      case 3 => s"${sentence(rng, 4)}<|im_end|>"
      case 4 => s"# Heading $i\n- ${sentence(rng, 3)}\n- ${sentence(rng, 3)}"
      case 5 => s"Teſt-\n ing ${sentence(rng, 3)} , done"
      case 6 => s"```\n${sentence(rng, 5)}\n```"
      case _ => sentence(rng, 8) + s" #$i"
    }
  }

  private def xmlPayload(rng: Rng): String =
    s"""<HistoricalDocument xmlns="urn:hd"><Page><Header>Fol. ${rng.nextInt(99)}</Header>""" +
      s"""<Body>${sentence(rng, 6)}<Description>ignored</Description></Body>""" +
      s"""<Footer>${sentence(rng, 2)}</Footer></Page></HistoricalDocument>"""

  private def layoutPayload(rng: Rng): String = {
    // two text blocks, the second a merge_prev continuation; plus a title
    val y1 = 50 + rng.nextInt(100)
    s"<|box_start|>100 $y1 900 ${y1 + 100}<|box_end|><|ref_start|>title<|ref_end|>${sentence(rng, 2)}" +
      s"<|box_start|>100 ${y1 + 120} 900 ${y1 + 220}<|box_end|><|ref_start|>text<|ref_end|>${sentence(rng, 6)}" +
      s"<|box_start|>100 ${y1 + 240} 900 ${y1 + 340}<|box_end|><|ref_start|>text<|ref_end|><|txt_contd_tgt|>${sentence(rng, 4)}"
  }

  private def tableLayoutPayload(rng: Rng): String =
    // a table covering an image (absorption case) plus a caption inside a chart
    "<|box_start|>100 100 900 500<|box_end|><|ref_start|>table<|ref_end|>" +
      s"<fcel>${words(rng.nextInt(words.length))}<lcel><nl><fcel>${rng.nextInt(100)}<fcel>${rng.nextInt(100)}<nl>" +
      "<|box_start|>150 150 400 300<|box_end|><|ref_start|>image<|ref_end|>" +
      "<|box_start|>100 600 900 800<|box_end|><|ref_start|>chart<|ref_end|>chart of values" +
      "<|box_start|>120 620 880 680<|box_end|><|ref_start|>image_caption<|ref_end|>a covered caption"

  private def equationLayoutPayload(rng: Rng): String =
    // both equations cover >90% of the equation_block → combine branch fires
    "<|box_start|>100 100 900 400<|box_end|><|ref_start|>equation_block<|ref_end|>" +
      s"<|box_start|>100 100 900 400<|box_end|><|ref_start|>equation<|ref_end|>x_{${rng.nextInt(9)}} = ${rng.nextInt(50)}" +
      s"<|box_start|>105 105 895 395<|box_end|><|ref_start|>equation<|ref_end|>y = x \\times ${rng.nextInt(9)}"

  private def cjkPayload(rng: Rng): String =
    "<|box_start|>100 100 900 200<|box_end|><|ref_start|>text<|ref_end|>First part" +
      "<|box_start|>100 220 900 320<|box_end|><|ref_start|>text<|ref_end|><|txt_contd_tgt|>世界" + sentence(rng, 1)

  /** The one id format — docsWhere's pre-synthesis filter depends on it. */
  def docIdOf(docIndex: Long): String = f"doc_$docIndex%08d"

  def genDoc(docIndex: Long, seed: Long, skewEvery: Long = 1000L): Doc = {
    val rng = new Rng(seed ^ (docIndex * 0x2545F4914F6CDD1DL))
    val docId = docIdOf(docIndex)
    val isSkewed = skewEvery > 0 && docIndex % skewEvery == skewEvery - 1
    val nSpans =
      if (isSkewed) 5000 + rng.nextInt(5001)
      else 1 + math.min(63, (-12.0 * math.log(math.max(1e-12, rng.nextDouble()))).toInt)

    val spans = (0 until nSpans).map { i =>
      val roll = rng.nextInt(20)
      if (isSkewed || roll < 12) Span("text", textPayload(rng, docId, i), "", i)
      else roll match {
        case 12 => Span("xml", xmlPayload(rng), "", i)
        case 13 | 14 => Span("layout", layoutPayload(rng), "", i)
        case 15 => Span("layout", tableLayoutPayload(rng), s"media://$docId/$i", i)
        case 16 => Span("layout", equationLayoutPayload(rng), "", i)
        case 17 => Span("layout", cjkPayload(rng), "", i)
        case 18 => Span("image", s"figure: ${sentence(rng, 3)}", s"media://$docId/$i", i)
        case _ => Span("table", s"<fcel>a<fcel>b<nl><fcel>1<fcel>2<nl>", "", i)
      }
    }
    Doc(docId, spans)
  }

  /** Distributed deterministic generation: `spark.range` partitions the index
    * space; each row derives its own RNG stream, so the table is identical at
    * any parallelism/partitioning (safe under task retry, AQE re-plan).
    */
  def docs(spark: SparkSession, nDocs: Long, seed: Long = 42L, skewEvery: Long = 1000L,
           partitions: Int = 0): Dataset[Doc] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0L, nDocs, 1L, partitions) else spark.range(nDocs)
    base.as[Long].mapPartitions(_.map(genDoc(_, seed, skewEvery)))
  }

  /** Pruned generation: only documents whose id passes `docIdFilter` are
    * materialized — the doc id is derivable from the index alone, so the
    * filter runs BEFORE the expensive span synthesis. This models a
    * bucket-partition-pruned input scan (the production shape), and beats
    * caching the whole table: a persisted Dataset[Doc] pays full encoder
    * serialization once plus a full deserialize per group filter.
    */
  def docsWhere(spark: SparkSession, nDocs: Long, seed: Long = 42L, skewEvery: Long = 1000L,
                partitions: Int = 0)(docIdFilter: String => Boolean): Dataset[Doc] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0L, nDocs, 1L, partitions) else spark.range(nDocs)
    base.as[Long].mapPartitions(_.flatMap { i =>
      if (docIdFilter(docIdOf(i))) Iterator.single(genDoc(i, seed, skewEvery)) else Iterator.empty
    })
  }
}
