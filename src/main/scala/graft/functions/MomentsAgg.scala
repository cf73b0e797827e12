package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `vec_moments(v, dim)` — aggregate returning the second-order moment
  * vector of a group of `dim`-dimensional double arrays as ONE
  * array<double> of length 1 + dim + dim(dim+1)/2:
  *
  *   [ n,  Σv_0 … Σv_{dim-1},  Σv_0v_0, Σv_0v_1 … (upper triangle,
  *     row-major) ]
  *
  * — everything PCA/covariance needs in a single pass. Why it exists:
  * the declarative alternative is 1 + dim + dim(dim+1)/2 separate `sum`
  * aggregate expressions (2 145 at dim 64), which is the right
  * DISTRIBUTED shape but pays seconds of driver-side analysis/codegen
  * per execution — pure plan-size cost, growing quadratically with dim
  * (the embed_project lesson, one level up). This expression keeps the
  * plan ONE node at any dim; partial aggregation still runs map-side
  * (one ~dim²/2-double buffer per partition), the exchange still
  * carries one packed array per partition, and the per-row work — the
  * dim(dim+1)/2 multiply-adds — is identical, done in a tight primitive
  * loop. Plans through ObjectHashAggregate (typed buffers do not
  * codegen — acceptable: the loop body IS the work).
  *
  * Null rows and null-containing vectors are skipped (built-in
  * aggregate convention); a vector of the wrong length throws — a
  * silent truncation would corrupt every covariance entry. */
case class VecMoments(
    v: Expression,
    dimE: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(v, dimE)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = v.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!ok) {
      TypeCheckResult.TypeCheckFailure(s"v must be array<double>, got ${v.dataType}")
    } else if (dimE.dataType != IntegerType || !dimE.foldable) {
      TypeCheckResult.TypeCheckFailure("dim must be an integer literal")
    } else {
      val d = dimE.eval().asInstanceOf[Int]
      if (d <= 0 || d > 512) {
        TypeCheckResult.TypeCheckFailure(s"dim must be in [1, 512], got $d")
      } else TypeCheckResult.TypeCheckSuccess
    }
  }

  private lazy val dim: Int = dimE.eval().asInstanceOf[Int]
  private def bufLen: Int = 1 + dim + dim * (dim + 1) / 2

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_moments"

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val a = v.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"vec_moments: expected dim $dim, got ${arr.numElements()}")
      var hasNull = false
      var i = 0
      while (i < dim && !hasNull) { if (arr.isNullAt(i)) hasNull = true; i += 1 }
      if (!hasNull) {
        val x = arr.toDoubleArray()
        buffer(0) += 1.0
        i = 0
        var t = 1 + dim
        while (i < dim) {
          buffer(1 + i) += x(i)
          var j = i
          while (j < dim) {
            buffer(t) += x(i) * x(j)
            t += 1; j += 1
          }
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecMoments =
    copy(v = newChildren(0), dimE = newChildren(1))
}

object VecMoments {
  /** Offset of Σv_i·v_j (j ≥ i) inside the packed moment array. */
  def gramIndex(dim: Int, i: Int, j: Int): Int =
    1 + dim + (dim * i - i * (i - 1) / 2) + (j - i)
}
