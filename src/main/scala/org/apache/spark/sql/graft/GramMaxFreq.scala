package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the multiplicity of the most frequent word
  * k-gram of a token array — `gram_max_freq(tokens, k)`, the per-row
  * kernel of the Gopher-style repetition rule.
  *
  * Value-identical to the composable formulation it replaces
  * (`aggregate(array_sort(grams), longest-equal-run fold)`: the longest
  * equal run of a sorted multiset IS the max multiplicity — asserted in
  * GramMaxFreqSpec), but runs as one hash-counting JVM loop instead of an
  * interpreted expression tree: Spark's higher-order functions
  * (`transform`/`aggregate`) are CodegenFallback, so the old fold paid
  * per-element interpreted evaluation AND an O(n log n) sort, dominating
  * the text_repetition entry (r12 VERDICT #3, flagged three rounds).
  * Zero grams (fewer than k tokens) returns 0 — callers filter first.
  *
  * Whole-stage codegen via [[doGenCode]] (static call); interpreted
  * [[nullSafeEval]] shares the same kernel.
  */
case class GramMaxFreq(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "gram_max_freq"

  override protected def nullSafeEval(toks: Any): Any =
    GramStats.maxFreq(toks.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.GramStats.maxFreq($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): GramMaxFreq = copy(child = newChild)
}

/** Native Catalyst expression: `top_gram_stats(tokens, k)` — the
  * occurrence count AND character length of the single most frequent
  * word k-gram, ties broken to the lexicographically (binary UTF8)
  * smallest gram: exactly the `row_number over (count desc, gram)` = 1
  * row of the relational formulation, so `c * (chars - (k-1))` is the
  * Gopher top-n-gram covered-char mass (Rae et al. 2021 Table A1,
  * n = 2..4) computed IN-ROW. Replaces three corpus-wide
  * (doc_id, n, gram)-keyed count shuffles + rank windows in the
  * repetition battery (r14 VERDICT #4) with one hash-counting JVM loop
  * per doc; RepBatterySpec pins kernel/relational equality. Zero grams
  * (fewer than k tokens) returns (0, 0) — the caller's m >= n guard
  * makes the legs it feeds identical to the relational no-row case.
  *
  * Whole-stage codegen via [[doGenCode]] (static call); interpreted
  * [[nullSafeEval]] shares the same kernel.
  */
case class TopGramStats(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = StructType(Seq(
    StructField("c", LongType, nullable = false),
    StructField("gram_chars", LongType, nullable = false)))

  override def prettyName: String = "top_gram_stats"

  override protected def nullSafeEval(toks: Any): Any =
    GramStats.topGram(toks.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.GramStats.topGram($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): TopGramStats = copy(child = newChild)
}

/** Native Catalyst expression: `dup_gram_coverage(tokens, nMin, nMax)` —
  * for each n in [nMin, nMax], the total word-character mass of the
  * distinct token positions covered by any word n-gram occurring MORE
  * THAN ONCE in the row (the Gopher duplicated-n-gram signal, Rae et al.
  * 2021 Table A1, n = 5..10), returned as an array indexed by n − nMin.
  *
  * All of a document's grams live in its own row, so the quantity is
  * per-row by construction; the relational formulation it replaces
  * (r20 — explode all positions × 6 n values → (doc_id, n, gh) count
  * shuffle → coverage-position explode → distinct → join against the
  * per-position length relation → per-doc sum) shuffled n·corpus rows
  * to compute a row-local value. One hash-counting loop per (row, n):
  * gram → first occurrence position, second occurrence marks both
  * ranges in a boolean position mask (set semantics — overlapping
  * duplicated grams count each position once, exactly the relational
  * DISTINCT). Exact gram identity (no digests). Fewer than n tokens
  * scores 0 for that n — same as the relational no-row case after its
  * coalesce-to-0. RepBatterySpec pins kernel/relational equality.
  *
  * Whole-stage codegen via [[doGenCode]] (static call); interpreted
  * [[nullSafeEval]] shares the same kernel.
  */
case class DupGramCoverage(child: Expression, nMin: Int, nMax: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(nMin >= 1 && nMax >= nMin, s"bad gram range [$nMin, $nMax]")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "dup_gram_coverage"

  override protected def nullSafeEval(toks: Any): Any =
    GramStats.dupCoverage(toks.asInstanceOf[ArrayData], nMin, nMax)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.GramStats.dupCoverage($c, $nMin, $nMax)")

  override protected def withNewChildInternal(
      newChild: Expression): DupGramCoverage = copy(child = newChild)
}

/** Static kernel shared by the interpreted and generated paths. */
object GramStats {

  private val Space = UTF8String.fromString(" ")

  def topGram(toks: ArrayData, k: Int): InternalRow = {
    val n = toks.numElements()
    val m = n - k + 1
    if (m <= 0) return InternalRow(0L, 0L)
    val counts = new java.util.HashMap[UTF8String, Long](m * 2)
    var i = 0
    val parts = new Array[UTF8String](k)
    while (i < m) {
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val gram = UTF8String.concatWs(Space,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(parts): _*)
      counts.merge(gram, 1L, (a, b) => a + b)
      i += 1
    }
    // argmax on (count desc, gram binary-asc) — UTF8String.compareTo is
    // the byte-wise order Spark's StringType sorts by, so this equals
    // the relational row_number() tie rule
    var best: UTF8String = null
    var bestC = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > bestC || (c == bestC &&
          (best == null || e.getKey.compareTo(best) < 0))) {
        best = e.getKey
        bestC = c
      }
    }
    InternalRow(bestC, best.numChars().toLong)
  }

  def dupCoverage(toks: ArrayData, nMin: Int, nMax: Int): ArrayData = {
    val nTok = toks.numElements()
    val out = new Array[Long](nMax - nMin + 1)
    if (nTok >= nMin) {
      // per-position word char lengths, computed once for all n
      val wlen = new Array[Int](nTok)
      var p = 0
      while (p < nTok) {
        wlen(p) = toks.getUTF8String(p).numChars(); p += 1
      }
      val covered = new Array[Boolean](nTok)
      var n = nMin
      while (n <= nMax) {
        val m = nTok - n + 1
        if (m >= 1) {
          java.util.Arrays.fill(covered, false)
          val parts = new Array[UTF8String](n)
          // gram -> first occurrence position; -1 once that first
          // occurrence's range has been marked (gram known duplicated)
          val first = new java.util.HashMap[UTF8String, Integer](m * 2)
          var i = 0
          while (i < m) {
            var j = 0
            while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
            val gram = UTF8String.concatWs(Space,
              scala.collection.immutable.ArraySeq.unsafeWrapArray(parts): _*)
            val prev = first.get(gram)
            if (prev == null) {
              first.put(gram, Integer.valueOf(i))
            } else {
              if (prev.intValue() >= 0) {
                var q = prev.intValue()
                val e0 = prev.intValue() + n
                while (q < e0) { covered(q) = true; q += 1 }
                first.put(gram, Integer.valueOf(-1))
              }
              var q = i
              val e1 = i + n
              while (q < e1) { covered(q) = true; q += 1 }
            }
            i += 1
          }
          var s = 0L
          p = 0
          while (p < nTok) { if (covered(p)) s += wlen(p); p += 1 }
          out(n - nMin) = s
        }
        n += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def maxFreq(toks: ArrayData, k: Int): Long = {
    val n = toks.numElements()
    val m = n - k + 1
    if (m <= 0) return 0L
    val counts = new java.util.HashMap[UTF8String, Long](m * 2)
    var best = 0L
    var i = 0
    val parts = new Array[UTF8String](k)
    while (i < m) {
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val gram = UTF8String.concatWs(Space,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(parts): _*)
      val c = counts.merge(gram, 1L, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }
}
