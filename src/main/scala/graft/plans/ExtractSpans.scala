package graft.plans

import graft.layout.ExtractConfig
import graft.model.{Doc, Span}
import graft.pipeline.Extract
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator extraction as a first-class Catalyst node — the custom
  * `LogicalPlan + SparkStrategy + SparkPlan` integration path:
  * `ExtractSpansExec` maps `InternalRow → InternalRow` directly, with no
  * `Dataset[Doc]`/`Dataset[DocOut]` encoder round-trip, and because the
  * node declares its references/producedAttributes, Catalyst composes
  * around it (column pruning below, filters/aggregates above) like any
  * built-in operator. Semantics are byte-identical to the typed
  * `Extract.run` (asserted in PlanSpec) and the plan stays narrow — zero
  * exchanges.
  *
  * Measured honestly (ScalingBench `typed` vs `native`, pinned 8 cores,
  * 1M docs, interleaved A/B): throughput parity within run noise — Spark's
  * generated encoder is already efficient, and the Generic output rows
  * give back what the skipped deserializer saves. The node's value is the
  * integration point (SQL-visible operator, strategy-planned, prunable),
  * not a speedup; the typed path remains the production default.
  */
object ExtractSpans {

  val spanStruct: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = false),
    StructField("order", IntegerType, nullable = false)))

  def outputAttrs: Seq[Attribute] = Seq(
    AttributeReference("doc_id", StringType, nullable = false)(),
    AttributeReference("spans", ArrayType(spanStruct, containsNull = false), nullable = false)())

  /** Plan extraction over a docs DataFrame
    * `(doc_id string, spans array<struct<kind,text,media_ref,offset>>)`.
    * Registers the strategy on the session once (idempotent).
    */
  def run(df: DataFrame, cfg: ExtractConfig = ExtractConfig.Default): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    DatasetBridge.ofRows(spark,
      ExtractSpansPlan(DatasetBridge.logicalPlan(df), cfg, outputAttrs))
  }

  def register(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.exists(_.isInstanceOf[ExtractStrategy]))
      spark.experimental.extraStrategies = strategies :+ new ExtractStrategy
  }
}

case class ExtractSpansPlan(child: LogicalPlan, cfg: ExtractConfig,
                            override val output: Seq[Attribute]) extends UnaryNode {
  // this node PRODUCES its output attributes (they don't come from the
  // child), and their expression ids are part of the node's identity: a
  // copy for a new child must keep them or upstream references dangle
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // the operator consumes the child's doc_id/spans columns — declaring the
  // reference stops ColumnPruning from projecting the child down to nothing
  // (while still pruning any unrelated columns)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      child.output.filter(a => a.name == "doc_id" || a.name == "spans"))
  override protected def withNewChildInternal(newChild: LogicalPlan): ExtractSpansPlan =
    copy(child = newChild)
}

class ExtractStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: ExtractSpansPlan => ExtractSpansExec(planLater(p.child), p.cfg, p.output) :: Nil
    case _ => Nil
  }
}

case class ExtractSpansExec(child: SparkPlan, cfg: ExtractConfig,
                            override val output: Seq[Attribute]) extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.schema
    val docIdOrd = schema.fieldIndex("doc_id")
    val spansOrd = schema.fieldIndex("spans")
    val spanFields = schema(spansOrd).dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    val kindOrd = spanFields.fieldIndex("kind")
    val textOrd = spanFields.fieldIndex("text")
    val mediaOrd = spanFields.fieldIndex("media_ref")
    val offsetOrd = spanFields.fieldIndex("offset")
    val config = cfg
    child.execute().mapPartitions({ it =>
      it.map { row =>
        val docId = row.getUTF8String(docIdOrd).toString
        val arr = row.getArray(spansOrd)
        val n = arr.numElements()
        val spans = new Array[Span](n)
        var i = 0
        while (i < n) {
          val s = arr.getStruct(i, 4)
          spans(i) = Span(
            s.getUTF8String(kindOrd).toString,
            s.getUTF8String(textOrd).toString,
            s.getUTF8String(mediaOrd).toString,
            s.getInt(offsetOrd))
          i += 1
        }
        val out = Extract.extractDoc(
          Doc(docId, scala.collection.immutable.ArraySeq.unsafeWrapArray(spans)), config)
        val outSpans = new Array[Any](out.spans.length)
        var j = 0
        while (j < out.spans.length) {
          val os = out.spans(j)
          outSpans(j) = new GenericInternalRow(Array[Any](
            UTF8String.fromString(os.kind),
            UTF8String.fromString(os.text),
            UTF8String.fromString(os.media_ref),
            os.order))
          j += 1
        }
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(out.doc_id),
          new GenericArrayData(outSpans))): InternalRow
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): ExtractSpansExec =
    copy(child = newChild)
}
