package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `intersect_count(a, b)` — the number of
  * DISTINCT string elements present in both arrays, i.e. exactly
  * `size(array_intersect(a, b))` (ArrayIntersect emits each common
  * element once) without materializing the intersection array.
  *
  * The near-dup verify legs (ngram Jaccard, containment, MinHash-LSH)
  * evaluate this once per CANDIDATE PAIR over two full shingle sets —
  * `size(array_intersect(...))` builds a hash structure AND allocates
  * the matched elements into a fresh array per call just to take its
  * length (and the Jaccard form referenced it twice per row, leaning on
  * codegen subexpression elimination). This kernel builds one HashSet of
  * the smaller side and counts removal-hits from the other — set
  * semantics by construction (a duplicate on either side cannot double
  * count: the build side dedupes in the set, the probe side removes on
  * first match), zero per-match allocation. IntersectCountSpec pins
  * kernel == size(array_intersect) on corpus shingle sets and on
  * duplicate/empty/disjoint fixtures.
  *
  * Whole-stage codegen via [[doGenCode]] (static call); interpreted
  * [[nullSafeEval]] shares the same kernel. Null inputs yield null, like
  * the composed form.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountKernel.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.IntersectCountKernel.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Static kernel shared by the interpreted and generated paths. */
object IntersectCountKernel {

  def count(a: ArrayData, b: ArrayData): Long = {
    // build the set from the SMALLER side — probe cost is linear either
    // way, build memory is what the choice bounds
    val (small, big) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    if (n == 0) return 0L
    val set = new java.util.HashSet[UTF8String](n * 2)
    var i = 0
    while (i < n) { set.add(small.getUTF8String(i)); i += 1 }
    var c = 0L
    val m = big.numElements()
    i = 0
    while (i < m) {
      // remove-on-match: a duplicate probe element cannot re-count
      if (set.remove(big.getUTF8String(i))) c += 1L
      i += 1
    }
    c
  }
}
