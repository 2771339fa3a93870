package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with doGenCode — they stay inside
  * WholeStageCodegen, unlike Scala UDFs) exposing the engine's scalar layer
  * to SQL / DataFrame users:
  *
  *   graft_shape(s): the dan2 word-shape string (WordShapeClassifier semantics,
  *     /root/reference/src/edu/stanford/nlp/process/WordShapeClassifier.java:232-265;
  *     without the corpus-dependent known-LC 'k' suffix, which needs model state)
  *   graft_fnv64(s): the engine's 64-bit FNV-1a hash (dedup keys / feature
  *     hashing, identical to graft.ops.Hashing.fnv1a64)
  */
case class GraftShape(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_shape requires STRING, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(graft.text.WordShape.dan2NoLC(v.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.text.WordShape.dan2NoLC($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): GraftShape = copy(newChild)
  override def prettyName: String = "graft_shape"
}

case class GraftFnv64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_fnv64 requires STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(graft.ops.Hashing.fnv1a64(v.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.Hashing.fnv1a64($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): GraftFnv64 = copy(newChild)
  override def prettyName: String = "graft_fnv64"
}

/** Cosine similarity of two float-array columns, accumulated in double with a
  * fixed left-to-right fold — bit-identical to the previous
  * zip_with+aggregate Catalyst formulation (and to the DuckDB oracle's
  * list_dot_product over DOUBLE[]), but ~300x cheaper per pair: the
  * higher-order-function route interprets the lambda per element with boxing,
  * while this stays a primitive loop inside WholeStageCodegen.
  */
case class GraftCosine(left: Expression, right: Expression) extends BinaryExpression {
  private def ok(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires (ARRAY<FLOAT>, ARRAY<FLOAT>), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftCosine.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftCosine.compute($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GraftCosine =
    copy(newLeft, newRight)
  override def prettyName: String = "graft_cosine"
}

object GraftCosine {
  /** dot over the common prefix; norms over each full array (embeddings are
    * fixed-dim, so lengths always match in practice).
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < a.numElements()) { val v = a.getFloat(i).toDouble; na += v * v; i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.numElements()) { val v = b.getFloat(i).toDouble; nb += v * v; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

object GraftFunctions {
  /** Column-API wrappers (require register(spark) once per session). */
  def graft_shape(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_shape", c)
  def graft_fnv64(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_fnv64", c)
  def graft_cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)

  /** Register for SQL: SELECT graft_shape(word), graft_fnv64(text) ... */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shape", exprs => GraftShape(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fnv64", exprs => GraftFnv64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => GraftCosine(exprs(0), exprs(1)), "built-in")
  }
}
