package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_apply(word, lefts, rights)` — segment one word under a TRAINED
  * ordered BPE merge table (Sennrich et al. 2016 inference): start from
  * characters, apply each merge in rank order as ONE left-to-right
  * non-overlapping pass, return the surviving symbols as array<string>.
  * Exactly the merge semantics [[graft.llm.TextOps.bpeTrain]]'s training
  * loop uses, so encoding the training corpus under its own merge table
  * reproduces the trained symbol state.
  *
  * The merge table travels as two FOLDABLE array<string> literal
  * arguments (rank-parallel lefts/rights) — the [[CentroidArgmax]]
  * pattern: learned state as plan constants, decoded to a driver/executor
  * array once per plan, so the expression stays registry-constructible
  * and the plan size is one reference object, not a tree per merge.
  *
  * The left-to-right pass is implemented as the OUTPUT-TOP fold: push
  * symbols left to right, merging when (top-of-output, incoming) equals
  * the pair. Equivalent to the index-skipping loop because a merged
  * symbol `l+r` is strictly longer than `l` and so can never itself
  * match `l` of the same merge — no overlapping re-merge is possible.
  *
  * Eval-only ([[CodegenFallback]]), deliberately: this runs over the
  * DISTINCT-WORD frame (Heaps-law sublinear in corpus size, capped by
  * the caller), never over the corpus — the corpus-sized stages of
  * [[graft.llm.TextOps.bpeEncode]] are all codegen'd built-ins. A
  * generated nested string loop would buy nothing on a vocab-bounded
  * input and cost the maintenance of string-builder codegen. */
case class BpeApply(word: Expression, leftsE: Expression, rightsE: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(word, leftsE, rightsE)
  override def nullable: Boolean = word.nullable
  override def foldable: Boolean = children.forall(_.foldable)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  override def checkInputDataTypes(): TypeCheckResult = {
    def isStrings(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (word.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bpe_apply requires a string word, got ${word.dataType.simpleString}")
    else if (!isStrings(leftsE.dataType) || !leftsE.foldable ||
      !isStrings(rightsE.dataType) || !rightsE.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bpe_apply requires foldable array<string> lefts/rights merge arguments")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def strings(e: Expression): Array[String] = {
    val a = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i => a.getUTF8String(i).toString)
  }
  private lazy val lefts: Array[String] = strings(leftsE)
  private lazy val rights: Array[String] = strings(rightsE)

  private def encode(w: String): Array[String] = {
    var syms: Array[String] = w.map(_.toString).toArray
    var m = 0
    while (m < lefts.length && syms.length >= 2) {
      val l = lefts(m); val r = rights(m)
      val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
      var i = 0
      while (i < syms.length) {
        if (out.nonEmpty && out.last == l && syms(i) == r)
          out(out.length - 1) = l + r
        else out += syms(i)
        i += 1
      }
      syms = out.toArray
      m += 1
    }
    syms
  }

  override def eval(input: InternalRow): Any = {
    val w = word.eval(input)
    if (w == null) null
    else new GenericArrayData(
      encode(w.asInstanceOf[UTF8String].toString)
        .map(s => UTF8String.fromString(s).asInstanceOf[Any]))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BpeApply =
    copy(word = newChildren(0), leftsE = newChildren(1), rightsE = newChildren(2))
}

object BpeFunctions {
  /** Column-level BPE segmentation backed by [[BpeApply]]: `merges` is
    * the ordered (left, right) table from [[graft.llm.TextOps.bpeTrain]],
    * interpolated as two rank-parallel foldable literals. */
  def bpeApply(word: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.functions.call_function("bpe_apply", word,
      org.apache.spark.sql.functions.lit(merges.map(_._1).toArray),
      org.apache.spark.sql.functions.lit(merges.map(_._2).toArray))
}
