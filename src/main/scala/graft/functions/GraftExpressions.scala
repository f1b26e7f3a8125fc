package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.unsafe.types.UTF8String

/** Quantized exact dot product of two `array<float>` columns — the
  * engine's determinism contract for cosine similarity as a native
  * Catalyst expression with whole-stage codegen.
  *
  * Contract (mirrored verbatim by the DuckDB oracles): each element
  * product is computed in double (floats cast up first), quantized to
  * integer picos via `floor(p·1e12 + 0.5)` — floor/multiply/add are
  * exact IEEE ops, so both engines produce the identical long — then
  * summed exactly in 64-bit; the result is `sum / 1e12` as a double.
  * Order-free addition, so any partitioning/reordering yields the
  * same bits.
  *
  * vs. the previous Scala UDF: no ArrayData→Seq conversion, no row
  * boxing, and the loop inlines into the enclosing WholeStageCodegen
  * stage instead of breaking it.
  */
case class DotQuant(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot_quant"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var k = 0
    while (k < n) {
      sum += math.floor(x.getFloat(k).toDouble * y.getFloat(k).toDouble * 1e12 + 0.5).toLong
      k += 1
    }
    sum.toDouble / 1e12
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val k = ctx.freshName("k")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $k = 0; $k < $n; $k++) {
         |  $sum += (long) java.lang.Math.floor(
         |    ((double) $a.getFloat($k)) * ((double) $b.getFloat($k)) * 1e12 + 0.5);
         |}
         |${ev.value} = ((double) $sum) / 1e12;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Hamming distance between two equal-length ASCII bit strings (the
  * SimHash signatures), counted over the common prefix — a native
  * codegen'd expression so the candidate-verify filter stays inside
  * the WholeStageCodegen span of the candidate join. */
case class HammingDist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val n = math.min(x.numBytes(), y.numBytes())
    var c = 0L
    var k = 0
    while (k < n) {
      if (x.getByte(k) != y.getByte(k)) c += 1
      k += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      s"""
         |int $n = java.lang.Math.min($a.numBytes(), $b.numBytes());
         |long $c = 0L;
         |for (int $k = 0; $k < $n; $k++) {
         |  if ($a.getByte($k) != $b.getByte($k)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration for the engine's native expressions.
  *
  * Two sanctioned routes, both public API:
  *   - [[GraftFunctions.register]]: imperative, idempotent, safe to
  *     call at query-build time on any session (what the query packs
  *     do — the driver may hand us a session we didn't build);
  *   - [[GraftExtensions]]: `spark.sql.extensions`-style injection for
  *     sessions built with `.withExtensions(new GraftExtensions)`.
  */
object GraftFunctions {

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot_quant"),
      new ExpressionInfo(classOf[DotQuant].getName, "graft_dot_quant"),
      (es: Seq[Expression]) => DotQuant(es(0), es(1))),
    (FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingDist].getName, "graft_hamming"),
      (es: Seq[Expression]) => HammingDist(es(0), es(1))),
    (FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_top_k"),
      (es: Seq[Expression]) => {
        val k = es(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_top_k(score, id, k): k must be an integer literal, got $other")
        }
        TopKByScore(es(0), es(1), k).toAggregateExpression()
      }),
    (FunctionIdentifier("graft_collect_capped"),
      new ExpressionInfo(classOf[CappedCollectLong].getName, "graft_collect_capped"),
      (es: Seq[Expression]) => {
        val cap = es(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_collect_capped(value, cap): cap must be an integer literal, got $other")
        }
        CappedCollectLong(es(0), cap).toAggregateExpression()
      }),
    (FunctionIdentifier("graft_hll_unit"),
      new ExpressionInfo(classOf[HllUnit].getName, "graft_hll_unit"),
      (es: Seq[Expression]) => HllUnit(es(0))),
    (FunctionIdentifier("graft_hll_card"),
      new ExpressionInfo(classOf[HllCard].getName, "graft_hll_card"),
      (es: Seq[Expression]) => HllCard(es(0))),
    (FunctionIdentifier("graft_hll_merge"),
      new ExpressionInfo(classOf[HllMergeAgg].getName, "graft_hll_merge"),
      (es: Seq[Expression]) => HllMergeAgg(es(0)).toAggregateExpression()),
    (FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHitters].getName, "graft_heavy_hitters"),
      (es: Seq[Expression]) => {
        val cap = es(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_heavy_hitters(item, capacity): capacity must be an integer literal, got $other")
        }
        HeavyHitters(es(0), cap).toAggregateExpression()
      }),
  )

  def register(spark: SparkSession): Unit = {
    // Spark 4 splits the API class from the classic implementation;
    // the function registry lives on the latter.
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    all.foreach { case (ident, info, builder) =>
      if (!reg.functionExists(ident)) reg.registerFunction(ident, info, builder)
    }
  }

  /** Column builders (require [[register]] on the active session). */
  def dotQuant(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_udf("graft_dot_quant", a, b)
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_udf("graft_hamming", a, b)
  def topK(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_udf("graft_top_k", score, id,
      org.apache.spark.sql.functions.lit(k))
  def collectCapped(value: Column, cap: Int): Column =
    org.apache.spark.sql.functions.call_udf("graft_collect_capped", value,
      org.apache.spark.sql.functions.lit(cap))
  def heavyHitters(item: Column, capacity: Int): Column =
    org.apache.spark.sql.functions.call_udf("graft_heavy_hitters", item,
      org.apache.spark.sql.functions.lit(capacity))
  def hllUnit(hash: Column): Column =
    org.apache.spark.sql.functions.call_udf("graft_hll_unit", hash)
  def hllCard(regs: Column): Column =
    org.apache.spark.sql.functions.call_udf("graft_hll_card", regs)
  def hllMerge(regs: Column): Column =
    org.apache.spark.sql.functions.call_udf("graft_hll_merge", regs)
}

/** `SparkSessionExtensions` injection point (SURVEY §3's extension
  * preference order, route (c)): sessions built with
  * `.withExtensions(new GraftExtensions)` — or configured with
  * `spark.sql.extensions=graft.functions.GraftExtensions` — get the
  * native functions without any imperative registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(e.injectFunction)
}
