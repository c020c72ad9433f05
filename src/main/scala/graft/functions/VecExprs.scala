package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd vector kernels for the embedding/ANN hot path — same
  * rationale as TextExprs: `aggregate`/`zip_with` lambdas are
  * interpreted per element, which at 48 hyperplanes × 64 dims per row
  * dominated the LSH/IVF queries. Inputs are `array<double>` columns
  * (use `.cast("array<double>")` on float embeddings — Spark's cast is
  * codegen'd).
  */
object VecKernels {

  /** Element accessor tolerating null elements (treated as 0.0 —
    * documented contract: a null dimension contributes nothing). The
    * naive toDoubleArray() NPEs on GenericArrayData with null elements.
    */
  private def elem(v: ArrayData, i: Int): Double =
    if (v.isNullAt(i)) 0.0 else v.getDouble(i)

  /** Dot products of `v` against each row of a constant matrix. The
    * vector length must equal each row's length — a silent truncation
    * here would project only a prefix of mis-dimensioned embeddings and
    * corrupt every downstream LSH/IVF/JL result, so mismatch throws.
    * Null elements count as 0.0.
    */
  def dotProducts(v: ArrayData, mat: Array[Array[Double]]): ArrayData = {
    val out = new Array[Double](mat.length)
    val vn = v.numElements()
    var i = 0
    while (i < mat.length) {
      val row = mat(i)
      if (vn != row.length) throw new IllegalArgumentException(
        s"dot_products: vector dim $vn != matrix row dim ${row.length}")
      var s = 0.0
      var j = 0
      while (j < vn) { s += elem(v, j) * row(j); j += 1 }
      out(i) = s
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** All sign-random-projection bucket ids in one call: table t's
    * bucket sets bit b iff v · planes(t*bits + b) ≥ 0. Fusing the dots
    * and the sign-bit assembly matters beyond saving a pass: the
    * expression-tree formulation (nTables × bits CASE WHEN terms over a
    * dots array) grows with the bit count and breaches the JVM's 64 KB
    * generated-method limit at the adaptive geometry's larger tables
    * (observed at 15 bits × 8 tables on the 100× corpus — whole-stage
    * codegen fell back to interpreted). Here the generated code is one
    * static call regardless of geometry. Dimension mismatch throws, as
    * in [[dotProducts]].
    */
  def srpBuckets(v: ArrayData, mat: Array[Array[Double]],
      nTables: Int, bits: Int): ArrayData = {
    val out = new Array[Long](nTables)
    val vn = v.numElements()
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val row = mat(t * bits + b)
        if (vn != row.length) throw new IllegalArgumentException(
          s"srp_buckets: vector dim $vn != plane dim ${row.length}")
        var s = 0.0
        var j = 0
        while (j < vn) { s += elem(v, j) * row(j); j += 1 }
        if (s >= 0.0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Adjusted centroid scores: dot(v, c_i) − ‖c_i‖²/2 for every centroid
    * — argmax over these ≡ nearest centroid by L2 (the IVF/k-means
    * assignment rule). One call per row; the literal-array formulation
    * (k literals + zip_with) grows generated code linearly in k, which
    * matters once the list count is adaptive (√n lists). Dimension
    * mismatch throws, as in [[dotProducts]].
    */
  def centroidScores(v: ArrayData, mat: Array[Array[Double]],
      halfNorms: Array[Double]): ArrayData = {
    val out = new Array[Double](mat.length)
    val vn = v.numElements()
    var i = 0
    while (i < mat.length) {
      val row = mat(i)
      if (vn != row.length) throw new IllegalArgumentException(
        s"centroid_scores: vector dim $vn != centroid dim ${row.length}")
      var s = 0.0
      var j = 0
      while (j < vn) { s += elem(v, j) * row(j); j += 1 }
      out(i) = s - halfNorms(i)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Cosine similarity with zero-vector guard (0.0, never NaN); null
    * elements count as 0.0, trailing unmatched dimensions are ignored.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i); val y = elem(b, i)
      dot += x * y; nx += x * x; ny += y * y
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }
}

case class DotProducts(child: Expression, mat: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "dot_products"
  override protected def nullSafeEval(input: Any): Any =
    VecKernels.dotProducts(input.asInstanceOf[ArrayData], mat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.dotProducts($c, $matRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): DotProducts =
    copy(child = newChild)
}

case class SrpBuckets(child: Expression, mat: Array[Array[Double]],
    nTables: Int, bits: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_buckets"
  override protected def nullSafeEval(input: Any): Any =
    VecKernels.srpBuckets(input.asInstanceOf[ArrayData], mat, nTables, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecKernels.srpBuckets($c, $matRef, $nTables, $bits)")
  }
  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

case class CentroidScores(child: Expression, mat: Array[Array[Double]])
    extends UnaryExpression {
  private val halfNorms: Array[Double] = mat.map(c => c.map(x => x * x).sum / 2.0)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centroid_scores"
  override protected def nullSafeEval(input: Any): Any =
    VecKernels.centroidScores(input.asInstanceOf[ArrayData], mat, halfNorms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("mat", mat, "double[][]")
    val hnRef = ctx.addReferenceObj("halfNorms", halfNorms, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecKernels.centroidScores($c, $matRef, $hnRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): CentroidScores =
    copy(child = newChild)
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

object VecExprs {
  def dotProducts(c: Column, mat: Array[Array[Double]]): Column =
    ColumnBridge.column(DotProducts(ColumnBridge.expression(c), mat))
  def srpBuckets(c: Column, mat: Array[Array[Double]], nTables: Int, bits: Int): Column =
    ColumnBridge.column(SrpBuckets(ColumnBridge.expression(c), mat, nTables, bits))
  def centroidScores(c: Column, mat: Array[Array[Double]]): Column =
    ColumnBridge.column(CentroidScores(ColumnBridge.expression(c), mat))
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
