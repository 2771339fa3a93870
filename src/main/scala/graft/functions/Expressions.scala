package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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

object GraftFunctions {
  /** Column-API wrappers (require register(spark) once per session). */
  def graft_shape(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_shape", c)
  def graft_fnv64(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_fnv64", c)

  /** Register for SQL: SELECT graft_shape(word), graft_fnv64(text) ... */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shape", exprs => GraftShape(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fnv64", exprs => GraftFnv64(exprs.head), "built-in")
  }
}
