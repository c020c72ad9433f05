package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Multi-dimensional clustering kernel: Morton (Z-order) interleaving of
  * two int dimensions into one 64-bit sort key. Sorting by the Z-value
  * clusters rows into 2-D tiles, so parquet row-group min/max statistics
  * stay tight on BOTH columns — scans filtered on either (or both)
  * dimensions skip most files, where a single-column sort only helps its
  * leading key. This is the layout step a 100-TB table with two common
  * filter dimensions (e.g. user × day) wants at compaction time.
  */
object ClusterKernels {
  /** Interleave the bits of a and b: bit i of a lands at 2i, bit i of b
    * at 2i+1. Inputs are sign-flipped so the curve follows signed int
    * order, and the result's sign bit is flipped back so plain signed
    * Long comparison orders z-values correctly (the standard
    * unsigned-compare-via-xor-min trick on both ends).
    */
  def interleaveBits(a: Int, b: Int): Long = {
    val ua = a ^ Int.MinValue
    val ub = b ^ Int.MinValue
    var r = 0L
    var i = 0
    while (i < 32) {
      r |= ((ua >>> i) & 1L) << (2 * i)
      r |= ((ub >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r ^ Long.MinValue
  }
}

case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects two int columns, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def prettyName: String = "zorder2"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ClusterKernels.interleaveBits(a.asInstanceOf[Int], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ClusterKernels.interleaveBits($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ClusterExprs {
  /** Z-order sort key over two int columns (cast/bin continuous
    * dimensions to int before calling — e.g. days since epoch).
    */
  def zorder2(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder2(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
