package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: apply a ranked BPE merge-rule table to a
  * token array in ONE in-row pass over the rules — `bpe_merge_stream(
  * tokens, lefts, rights)` returns the re-tokenized stream joined with
  * single spaces, where rule k greedily rewrites each adjacent
  * (lefts[k], rights[k]) token pair to `lefts[k] + "_" + rights[k]`,
  * left-to-right without rescanning its own output (Sennrich et al.'s
  * `for merge in merges: apply` discipline; "a a a" + (a,a) → "a_a a").
  *
  * Replaces the R sequential corpus-wide `regexp_replace` stages of the
  * old chain (one scan of every document per rule — R× the string
  * traffic, and each pass pays regex compilation + backtracking over
  * text that mostly doesn't match). Here the document is split once and
  * each rule is a pointer walk over the surviving token slots: O(len ×
  * R) token comparisons, zero allocation until the final join. The rule
  * arrays ride in via one broadcast row, so the whole application is a
  * single scan stage at any corpus size.
  *
  * Contract: `lefts`/`rights` are equal-length, rank-ordered, null-free
  * (the caller builds them with `array_sort(collect_list(...))` over the
  * merge table); token slots are non-null (whitespace `split` output).
  *
  * Whole-stage codegen via [[doGenCode]] (static call into
  * [[BpeMerge.apply]]); interpreted [[nullSafeEval]] for codegen-off
  * paths — both share the same kernel, so they are identical by
  * construction.
  */
case class BpeMergeStream(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = StringType

  override def prettyName: String = "bpe_merge_stream"

  override protected def nullSafeEval(toks: Any, lefts: Any,
      rights: Any): Any =
    BpeMerge.apply(toks.asInstanceOf[ArrayData],
      lefts.asInstanceOf[ArrayData], rights.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, l, r) =>
      s"${ev.value} = org.apache.spark.sql.graft.BpeMerge.apply($t, $l, $r);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeMergeStream =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Static kernel shared by the interpreted and generated paths (standalone
  * objects emit static forwarders — see [[Md5Hash]]). */
object BpeMerge {

  private val Joiner = UTF8String.fromString("_")
  private val Space = UTF8String.fromString(" ")

  def apply(toks: ArrayData, lefts: ArrayData, rights: ArrayData): UTF8String = {
    var len = toks.numElements()
    val buf = new Array[UTF8String](len)
    var i = 0
    while (i < len) { buf(i) = toks.getUTF8String(i); i += 1 }
    val nRules = lefts.numElements()
    var k = 0
    while (k < nRules) {
      val l = lefts.getUTF8String(k)
      val r = rights.getUTF8String(k)
      // one greedy pass with a write pointer: merge into the previously
      // written slot, which then (being `l_r`, not `l`) can't re-match
      var w = 0
      i = 0
      while (i < len) {
        if (w > 0 && buf(w - 1).equals(l) && buf(i).equals(r))
          buf(w - 1) = UTF8String.concat(l, Joiner, r)
        else { buf(w) = buf(i); w += 1 }
        i += 1
      }
      len = w
      k += 1
    }
    UTF8String.concatWs(Space,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(buf.take(len)): _*)
  }
}
