package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Bounded top-k accumulator: up to `k` (score, id) pairs ordered by
  * (score desc, id asc), stored as a binary min-heap whose root is the
  * WEAKEST retained pair — an insert against a full heap either evicts
  * the root or is discarded in O(log k).
  *
  * Why it exists: Spark has no bounded top-k aggregate. The built-in
  * routes either sort whole groups (`row_number` windows exchange and
  * sort EVERY candidate row) or buffer whole groups
  * (`slice(array_sort(collect_list(...)))` truncates only AFTER the
  * final aggregation — partial aggregation ships the full list). For
  * top-k-per-key over a candidate-pair stream (k-NN graphs), group
  * sizes are corpus-sized: an unbounded buffer is an OOM at scale and
  * an un-truncated partial defeats map-side combine. This buffer keeps
  * partial aggregation BOUNDED — each map task emits ≤ k pairs per
  * group, so the exchange carries O(groups × partitions × k), never
  * O(candidate pairs).
  */
final class TopKBuffer(val k: Int) {
  // heap arrays, parallel; heap property: parent is WEAKER than children
  // under beats() — root is the eviction candidate
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** Final ranking order: higher score wins, ties to the SMALLER id —
    * the deterministic tie-break every ranked operator in this repo
    * uses. TOTAL order via [[java.lang.Double.compare]]: NaN ranks
    * LARGEST, the convention Spark's sort, the row_number reference,
    * and DuckDB's ORDER BY all share — primitive `>`/`==` return false
    * both ways for NaN, so a NaN admitted while the heap fills could
    * otherwise sit at the root and silently discard every later
    * genuinely-better row (and sortWith's comparator contract breaks). */
  @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  def add(s0: Double, id: Long): Unit = {
    // normalize -0.0 to 0.0: Double.compare separates the zeros but the
    // engines' value comparisons (and the oracle hash) do not
    val s = if (s0 == 0.0d) 0.0d else s0
    if (size < k) {
      // sift up from the next free slot
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      while (i > 0 && beats(scores((i - 1) / 2), ids((i - 1) / 2), scores(i), ids(i))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (beats(s, id, scores(0), ids(0))) {
      // evict the weakest, sift the newcomer down
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i // weakest of the triple
        if (l < size && beats(scores(w), ids(w), scores(l), ids(l))) w = l
        if (r < size && beats(scores(w), ids(w), scores(r), ids(r))) w = r
        if (w == i) done = true
        else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  /** Ids in final rank order (score desc, id asc). */
  def sortedIds: Array[Long] = {
    val idx = Array.range(0, size)
    val out = idx.sortWith { (a, b) =>
      beats(scores(a), ids(a), scores(b), ids(b))
    }
    out.map(ids)
  }
}

/** `topk_pairs(score, id, k)` — aggregate returning the ids of the k
  * highest-scoring rows of the group as array<bigint> in rank order
  * (score desc, ties to smaller id). Null score or id rows are skipped
  * (built-in aggregate convention); NaN scores rank LARGEST, matching
  * Spark's sort order and DuckDB's ORDER BY (so a row_number reference
  * and the oracle agree on corpora with 0/0 degenerate scores).
  *
  * A [[TypedImperativeAggregate]] over [[TopKBuffer]]: partial
  * aggregation runs map-side with an O(k) buffer per group, so the hot
  * use — top-k per key over a corpus-sized candidate stream
  * ([[graft.llm.Ann.knnGraph]]) — shuffles k ids per (group,
  * partition) instead of every candidate row. Plans through
  * ObjectHashAggregate (no codegen for typed buffers — acceptable: the
  * per-row work is two comparisons and the expensive part, the
  * similarity score, is computed in the codegen stage BELOW the
  * aggregate). */
case class TopKPairs(
    score: Expression,
    id: Expression,
    kE: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id, kE)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType) {
      TypeCheckResult.TypeCheckFailure(s"score must be double, got ${score.dataType}")
    } else if (id.dataType != LongType) {
      TypeCheckResult.TypeCheckFailure(s"id must be bigint, got ${id.dataType}")
    } else if (kE.dataType != IntegerType || !kE.foldable) {
      TypeCheckResult.TypeCheckFailure("k must be an integer literal")
    } else {
      val kv = kE.eval().asInstanceOf[Int]
      if (kv <= 0 || kv > 65536) {
        TypeCheckResult.TypeCheckFailure(s"k must be in [1, 65536], got $kv")
      } else TypeCheckResult.TypeCheckSuccess
    }
  }

  private lazy val k: Int = kE.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) {
      buffer.add(other.scores(i), other.ids(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedIds)

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    // stored pairs are already the k best of their partial — re-adding
    // through the heap preserves the bound and the ordering invariant
    while (i < n) {
      val s = bb.getDouble; val id = bb.getLong
      buf.add(s, id); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1), kE = newChildren(2))
}
