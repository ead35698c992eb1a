package graft.functions

import graft.text.{Levenshtein, Normalization, Repetition, TagStrip, XmlFlatten}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Static entry points the generated code calls — one virtual-free static
  * call per row keeps the expressions inside whole-stage codegen.
  */
object ExprImpl {
  def normalizeForEval(s: UTF8String): UTF8String =
    UTF8String.fromString(Normalization.normalizeTextForEvaluation(s.toString))
  def stripOutputTag(s: UTF8String): UTF8String =
    UTF8String.fromString(TagStrip.stripOcrOutputTag(s.toString))
  def xmlFlatten(s: UTF8String): UTF8String =
    UTF8String.fromString(XmlFlatten.extractActualTextFromXml(s.toString))
  def hasRepetition(s: UTF8String): Boolean =
    Repetition.hasLongRepetition(s.toString)
  def nls(a: UTF8String, b: UTF8String): Double =
    Levenshtein.nls(a.toString, b.toString)
  def bucketOf(docId: UTF8String, buckets: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(docId.toString, 42), buckets)
}

/** `churro_normalize(text)` — the reference's full evaluation normalizer
  * (`normalization.py:87-121`) as a native Catalyst expression with codegen
  * (a static call inside the generated loop; no Scala-UDF encoder overhead).
  */
case class ChurroNormalize(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    ExprImpl.normalizeForEval(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.normalizeForEval($c)")
  override protected def withNewChildInternal(newChild: Expression): ChurroNormalize =
    copy(child = newChild)
}

/** `churro_strip_output_tag(text)` (`prompts/ocr.py:106-122`). */
case class StripOutputTag(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    ExprImpl.stripOutputTag(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.stripOutputTag($c)")
  override protected def withNewChildInternal(newChild: Expression): StripOutputTag =
    copy(child = newChild)
}

/** `churro_xml_flatten(text)` (`xml_utils.py:27-55`). */
case class XmlFlattenExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    ExprImpl.xmlFlatten(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.xmlFlatten($c)")
  override protected def withNewChildInternal(newChild: Expression): XmlFlattenExpr =
    copy(child = newChild)
}

/** `has_long_repetition(text)` (`repetition.py:6-32`). */
case class HasLongRepetition(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(v: Any): Any =
    ExprImpl.hasRepetition(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.hasRepetition($c)")
  override protected def withNewChildInternal(newChild: Expression): HasLongRepetition =
    copy(child = newChild)
}

/** `nls(pred, gold)` — normalized Levenshtein similarity with the
  * both-empty → 1.0 convention (`evaluate_page.py:97-103`).
  */
case class Nls(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprImpl.nls(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprImpl.nls($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Nls =
    copy(left = l, right = r)
}

/** `bucket_of(doc_id, buckets)` — the job's stable document→bucket hash as a
  * codegen'd native expression (replaces the round-1 Scala UDF that blocked
  * whole-stage codegen and made downstream filters unprunable).
  */
case class BucketOf(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprImpl.bucketOf(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprImpl.bucketOf($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BucketOf =
    copy(left = l, right = r)
}

/** Column surface + SQL registration. */
object ChurroFunctions {
  private def e(c: Column) = ColumnBridge.expression(c)
  private def col(x: Expression) = ColumnBridge.column(x)
  def churro_normalize(c: Column): Column = col(ChurroNormalize(e(c)))
  def churro_strip_output_tag(c: Column): Column = col(StripOutputTag(e(c)))
  def churro_xml_flatten(c: Column): Column = col(XmlFlattenExpr(e(c)))
  def has_long_repetition(c: Column): Column = col(HasLongRepetition(e(c)))
  def nls(a: Column, b: Column): Column = col(Nls(e(a), e(b)))
  def bucket_of(a: Column, b: Column): Column = col(BucketOf(e(a), e(b)))

  /** Register the SQL surface on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("churro_normalize", es => ChurroNormalize(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("churro_strip_output_tag", es => StripOutputTag(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("churro_xml_flatten", es => XmlFlattenExpr(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("has_long_repetition", es => HasLongRepetition(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("nls", es => Nls(es(0), es(1)), "scala_udf")
  }
}

/** `SparkSessionExtensions` injector:
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("churro_normalize"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "churro_normalize"),
        (es: Seq[Expression]) => ChurroNormalize(es.head)))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("churro_strip_output_tag"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "churro_strip_output_tag"),
        (es: Seq[Expression]) => StripOutputTag(es.head)))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("churro_xml_flatten"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "churro_xml_flatten"),
        (es: Seq[Expression]) => XmlFlattenExpr(es.head)))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("has_long_repetition"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "has_long_repetition"),
        (es: Seq[Expression]) => HasLongRepetition(es.head)))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("nls"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "nls"),
        (es: Seq[Expression]) => Nls(es(0), es(1))))
  }
}
