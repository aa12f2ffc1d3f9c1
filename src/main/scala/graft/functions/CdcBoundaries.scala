package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary positions as a native codegen
  * Expression: positions i ∈ [8, len−1] (1-based, matching the SQL
  * `range(8, length(text))` convention) where the polynomial hash of the
  * 8 bytes ending at i — Σ_{j=0..7} byte(i−7+j)·31^(7−j) — is ≡ 0
  * (mod 16). Replaces the interpreted higher-order-function pipeline in
  * `Dedup.cdcChunks` (filter + 8 element_at per position over a
  * per-doc code array): this form keeps a TRUE ROLLING hash — one
  * multiply-add and one subtract per byte instead of 8 lambda
  * evaluations per position — and runs inside whole-stage codegen.
  *
  * Bytewise on purpose: the corpus contract is single-byte text (the
  * ascii()/ord() formulations it replaces are only cross-engine equal
  * on single-byte chars anyway); on ASCII input the output is
  * bit-identical to the HOF formulation, which CdcBoundariesSpec pins.
  */
case class CdcBoundaries(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cdc_boundaries needs a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    new GenericArrayData(CdcBoundaries.boundariesOf(bytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = ctx.freshName("bytes")
      s"""
         |byte[] $bytes = $a.getBytes();
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.CdcBoundaries.boundariesOf($bytes));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  private val Pow7: Long = {
    var p = 1L; var i = 0
    while (i < 7) { p *= 31L; i += 1 }
    p
  }

  /** The rolling-hash scan, shared by interpreted eval and codegen (the
    * generated code calls straight into it — the loop is tight JVM code
    * either way, and one body cannot drift from the other). */
  def boundariesOf(bytes: Array[Byte]): Array[Int] = {
    val len = bytes.length
    if (len < 9) return Array.emptyIntArray
    // h = hash of the window ending at 1-based position i (bytes i-8..i-1)
    var h = 0L
    var j = 0
    while (j < 8) { h = h * 31L + (bytes(j) & 0xffL); j += 1 }
    val tmp = new Array[Int](len)
    var cnt = 0
    var i = 8
    while (i < len) {
      if (h % 16L == 0L) { tmp(cnt) = i; cnt += 1 }
      // slide the window one byte right: drop byte i-8, take byte i
      h = (h - (bytes(i - 8) & 0xffL) * Pow7) * 31L + (bytes(i) & 0xffL)
      i += 1
    }
    java.util.Arrays.copyOf(tmp, cnt)
  }

  /** Column-level entry point: cdc_boundaries(text). */
  def boundaries(c: Column): Column =
    bridge.column(CdcBoundaries(bridge.expression(c)))
}
