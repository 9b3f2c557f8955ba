package graft.wbot.exprs

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import graft.wbot.BloomSeen

/** Static evaluator shared by interpreted eval and generated code. */
object BloomProbe {
  def might(segs: Array[Array[Byte]], p: Int, h: Long): Boolean = {
    val seg = segs(java.lang.Math.floorMod(h, p.toLong).toInt)
    seg != null && BloomSeen.mightContain(seg, h)
  }
}

/**
 * Codegen'd broadcast Bloom-segment membership probe over a `hash64` column
 * — the seen-set pre-filter's small-mode path (SURVEY §2.6 A2) as a native
 * Catalyst expression instead of a per-row Scala UDF: no encoder
 * round-trip, no Option boxing, and the candidate pipeline stays inside
 * whole-stage codegen end to end (the reference analogue is the O(1)
 * in-memory map probe at `store/in_memory.go:26` — here against broadcast
 * per-partition filter segments). The broadcast HANDLE rides the expression
 * (tasks ship ~bytes); the segment array is resolved once per codegen
 * instance, not per row.
 */
case class BloomMightContain(child: Expression,
    segments: Broadcast[Array[Array[Byte]]], p: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${child.dataType}")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  protected override def nullSafeEval(input: Any): Any =
    BloomProbe.might(segments.value, p, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcastCls = classOf[Broadcast[_]].getName
    val bRef = ctx.addReferenceObj("bloomSegments", segments, bcastCls)
    // resolve the broadcast value once per generated-class instance
    val arr = ctx.addMutableState("byte[][]", "bloomSegArr",
      v => s"$v = (byte[][]) $bRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.wbot.exprs.BloomProbe.might($arr, $p, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "wbot_bloom_might_contain"
}
