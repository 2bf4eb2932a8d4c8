package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for bbox IoU (reference: iou_batch,
  * sort.py:47-63) — `iou(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)`.
  *
  * Generates straight-line Java inside whole-stage codegen (doGenCode), so
  * a 40M-pair association join evaluates IoU without virtual calls or
  * boxing — the §4 "custom Expression" extension point where a plain UDF
  * would break the codegen pipeline.
  */
case class Iou(children: Seq[Expression]) extends Expression {
  require(children.length == 8, "iou takes 8 arguments")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)

  @inline private def compute(ax1: Double, ay1: Double, ax2: Double, ay2: Double,
                              bx1: Double, by1: Double, bx2: Double, by2: Double): Double = {
    val iw = math.max(0.0, math.min(ax2, bx2) - math.max(ax1, bx1))
    val ih = math.max(0.0, math.min(ay2, by2) - math.max(ay1, by1))
    val inter = iw * ih
    inter / ((ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter)
  }

  override def eval(input: InternalRow): Any = {
    val vs = new Array[Double](8)
    var i = 0
    while (i < 8) {
      val v = children(i).eval(input)
      if (v == null) return null
      vs(i) = v.asInstanceOf[Double]
      i += 1
    }
    compute(vs(0), vs(1), vs(2), vs(3), vs(4), vs(5), vs(6), vs(7))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val eval = gens.map(_.code.toString).mkString("\n")
    val nullCheck =
      if (nullable) gens.map(g => g.isNull.toString).mkString(" || ") else "false"
    val v = gens.map(_.value.toString)
    val iw = ctx.freshName("iw"); val ih = ctx.freshName("ih")
    val inter = ctx.freshName("inter")
    ev.copy(code = code"""
      $eval
      boolean ${ev.isNull} = $nullCheck;
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        double $iw = Math.max(0.0, Math.min(${v(2)}, ${v(6)}) - Math.max(${v(0)}, ${v(4)}));
        double $ih = Math.max(0.0, Math.min(${v(3)}, ${v(7)}) - Math.max(${v(1)}, ${v(5)}));
        double $inter = $iw * $ih;
        ${ev.value} = $inter / ((${v(2)} - ${v(0)}) * (${v(3)} - ${v(1)})
          + (${v(6)} - ${v(4)}) * (${v(7)} - ${v(5)}) - $inter);
      }""")
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Registration: `spark.sql.extensions=graft.plans.GraftExtensions` at
  * session build, or `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.iouFunction)
    ext.injectFunction(GraftExtensions.cosineFunction)
  }
}

object GraftExtensions {
  private def build(children: Seq[Expression]): Expression =
    Iou(children.map { c =>
      // children may still be unresolved when the parser calls the builder
      val isDouble = try c.dataType == DoubleType catch { case _: Throwable => false }
      if (isDouble) c else Cast(c, DoubleType)
    })

  private def buildCosine(children: Seq[Expression]): Expression = {
    require(children.length == 2, "cosine_sim takes 2 arguments")
    CosineSim(children.head, children(1))
  }

  private val iouFunction = (
    FunctionIdentifier("iou"),
    new ExpressionInfo(classOf[Iou].getName, "iou"),
    (children: Seq[Expression]) => build(children))

  private val cosineFunction = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
    (children: Seq[Expression]) => buildCosine(children))

  /** Idempotent registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "iou", build, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", buildCosine, "built-in")
  }
}
