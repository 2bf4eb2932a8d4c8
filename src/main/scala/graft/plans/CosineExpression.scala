package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity of two numeric
  * arrays — `cosine_sim(a, b)` over ARRAY<FLOAT|DOUBLE|BIGINT|INT>.
  *
  * The higher-order builtin form (aggregate ∘ zip_with, see
  * VectorFunctions.cosine) is evaluated interpreted — lambda closures per
  * element; this expression generates ONE fused Java loop inside
  * whole-stage codegen (dot and both norms in a single pass, no
  * intermediate arrays), which is the §4 "custom Expression" extension
  * point for the ANN probe's hot scoring path. Arithmetic order matches
  * the typed kernels (dot/na/nb accumulated in doubles, one final
  * division) so results are bit-identical across all three forms
  * (asserted in CosineExpressionSpec).
  *
  * Null semantics match the zip_with form it replaces: a length
  * mismatch or a null element yields NULL (a malformed vector must not
  * score a plausible cosine and enter a top-k). The per-element null
  * check is only COMPILED IN when the input array type admits nulls —
  * containsNull=false vectors keep the branch-free loop.
  */
case class CosineSim(left: Expression, right: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other => throw new IllegalArgumentException(s"cosine_sim needs arrays, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(FloatType | DoubleType | LongType | IntegerType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects numeric arrays, got ${children.map(_.dataType)}")
  }

  @inline private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case LongType => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case other => throw new IllegalArgumentException(other.toString)
  }

  override def eval(input: InternalRow): Any = {
    val av = left.eval(input)
    val bv = right.eval(input)
    if (av == null || bv == null) return null
    val a = av.asInstanceOf[ArrayData]; val b = bv.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val ta = elemType(left); val tb = elemType(right)
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(a, ta, i); val y = get(b, tb, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ag = left.genCode(ctx); val bg = right.genCode(ctx)
    val ta = elemType(left); val tb = elemType(right)
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    val inputNull =
      if (left.nullable || right.nullable) s"${ag.isNull} || ${bg.isNull}" else "false"
    val ax = CodeGenerator.getValue(ag.value.toString, ta, i)
    val by = CodeGenerator.getValue(bg.value.toString, tb, i)
    // element null checks compiled in only when the type admits nulls
    def admitsNull(e: Expression): Boolean = e.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }
    val elemNull =
      (if (admitsNull(left)) s"${ag.value}.isNullAt($i) || " else "") +
        (if (admitsNull(right)) s"${bg.value}.isNullAt($i) || " else "") + "false"
    ev.copy(code = code"""
      ${ag.code}
      ${bg.code}
      boolean ${ev.isNull} = $inputNull;
      double ${ev.value} = 0.0;
      if (!${ev.isNull} && ${ag.value}.numElements() != ${bg.value}.numElements()) {
        ${ev.isNull} = true;
      }
      if (!${ev.isNull}) {
        int $n = ${ag.value}.numElements();
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
          if ($elemNull) { ${ev.isNull} = true; break; }
          double $x = (double) $ax;
          double $y = (double) $by;
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        if (!${ev.isNull}) {
          ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
        }
      }""")
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}
