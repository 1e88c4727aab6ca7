package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded buffer for [[TopKPairsAggregate]]: the k best (id, score) pairs
 * seen so far, kept sorted best-first under (score DESC, id ASC) — the same
 * total order as `row_number() OVER (ORDER BY score DESC, id ASC)`.
 * Insertion is a linear scan + shift: k is a small constant (top-3/top-10),
 * so this beats any heap bookkeeping.
 *
 * Insertion DEDUPES on id: a candidate id already buffered is never given a
 * second slot. In the LSH top-k path this is the SAFETY NET, not the primary
 * dedup: `Knn.lshTopK` dedupes the candidate stream upstream with one cheap
 * pre-score exchange (repartition + dropDuplicates on the bare pair rows,
 * before any vector payload attaches), and the buffer's id-dedup covers any
 * residual duplicates (e.g. a caller composing candidates without that
 * exchange) so correctness never hangs on an upstream plan detail the
 * aggregate cannot see. Callers' scores are a pure function of (group, id)
 * (cosine of a fixed pair), so a duplicate id arrives with a bit-identical
 * score and the first occurrence is kept; the different-score case is still
 * handled (best occurrence wins) so the buffer never silently depends on
 * that purity.
 */
private[graft] final class TopKPairsBuffer(val k: Int) {
  var n: Int = 0
  val ids: Array[Long] = new Array[Long](k)
  val scores: Array[Double] = new Array[Double](k)

  def insert(id: Long, score: Double): Unit = {
    var i = 0
    while (i < n && !(score > scores(i) || (score == scores(i) && id < ids(i)))) {
      // an existing occurrence at least as good as the incoming one — the
      // scan only passes slots the incoming entry does not beat
      if (ids(i) == id) return
      i += 1
    }
    // the same id below the insertion point (strictly worse score) must
    // vacate its slot rather than survive as a duplicate
    var dup = -1
    var j = i
    while (j < n && dup < 0) { if (ids(j) == id) dup = j; j += 1 }
    if (dup >= 0) {
      var m = dup
      while (m > i) { ids(m) = ids(m - 1); scores(m) = scores(m - 1); m -= 1 }
      ids(i) = id; scores(i) = score
    } else if (i < k) {
      var m = math.min(n, k - 1)
      while (m > i) { ids(m) = ids(m - 1); scores(m) = scores(m - 1); m -= 1 }
      ids(i) = id; scores(i) = score
      if (n < k) n += 1
    }
  }
}

/**
 * Bounded top-k (neighbor, score) aggregate: `array<struct<neighbor_id,
 * cosine>>` of the k best pairs per group, ordered (score DESC, id ASC).
 *
 * WHY an aggregate and not a window (measured — BENCH_NOTES "sf100 probe"):
 * the `row_number() <= k` window formulation must SORT the scored pair
 * stream before the rank filter. Catalyst's WindowGroupLimit does push a
 * partial top-k below the shuffle, but only AFTER a full partition sort of
 * the map-side stream — for an IVF self-query that stream is
 * n·nProbe·(n/cells) rows (4×10⁹ at n = 2M, ~2 TB of external-sort spill:
 * the measured sf100 disk-exhaustion failure). As an aggregate, each map
 * task folds the stream into one k-slot buffer per group with hash
 * aggregation — NO sort, no stream-proportional spill — and only n·k rows
 * ever shuffle. The trade: TypedImperativeAggregate plans as
 * ObjectHashAggregate (non-codegen buffer updates), which is why the
 * window/WindowGroupLimit form remains right for streams that fit a sort
 * ([[graft.operators.TopKPerGroup]]) and this form takes over when the
 * stream is join-amplified.
 *
 * NULL neighbor/score rows are skipped; scores must not be NaN (callers
 * guard zero-norm cosines to 0.0) — NaN would poison the ordering.
 */
private[graft] case class TopKPairsAggregate(
    neighbor: Expression, score: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuffer] {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  override def prettyName: String = "topk_pairs_agg"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(neighbor, score)

  override def checkInputDataTypes(): TypeCheckResult =
    (neighbor.dataType, score.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (n, s) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint, double), got (${n.sql}, ${s.sql})")
    }

  override def createAggregationBuffer(): TopKPairsBuffer = new TopKPairsBuffer(k)

  override def update(buf: TopKPairsBuffer, input: InternalRow): TopKPairsBuffer = {
    val id = neighbor.eval(input)
    val s = score.eval(input)
    if (id != null && s != null)
      buf.insert(id.asInstanceOf[Long], s.asInstanceOf[Double])
    buf
  }

  override def merge(a: TopKPairsBuffer, b: TopKPairsBuffer): TopKPairsBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.ids(i), b.scores(i)); i += 1 }
    a
  }

  override def eval(buf: TopKPairsBuffer): Any =
    new GenericArrayData((0 until buf.n).map { i =>
      InternalRow(buf.ids(i), buf.scores(i))
    }.toArray[Any])

  override def serialize(buf: TopKPairsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); bb.putDouble(buf.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKPairsBuffer(k)
    var i = 0
    // entries arrive best-first and insert preserves the order, so this
    // rebuilds the exact buffer
    while (i < n) { buf.insert(bb.getLong(), bb.getDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairsAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairsAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKPairsAggregate =
    copy(neighbor = c(0), score = c(1))
}
