package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs. */
final class TopKBuffer(val k: Int) {
  // min-heap on (score asc, id desc) so the worst kept element is the root
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }
  val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)

  def add(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val (ws, wi) = heap.head
      // better = higher score, or equal score with smaller id
      if (score > ws || (score == ws && id < wi)) { heap.dequeue(); heap.enqueue((score, id)) }
    }
  }

  /** Descending score, ascending id. */
  def sorted: Seq[(Double, Long)] = heap.toSeq.sortBy { case (s, i) => (-s, i) }
}

/** Top-k-per-group as a [[TypedImperativeAggregate]] — the heap-based
  * alternative to `row_number().over(window) <= k`: no per-partition sort,
  * O(k) state per group, and partial buffers merge associatively so
  * map-side combine applies. Returns `array<struct<score,id>>` ordered by
  * (score desc, id asc) — identical contents to the window formulation.
  *
  * The 100 TB case for this operator: ranking N candidates per query via a
  * window requires shuffling and SORTING every partition's candidates;
  * this aggregate reduces each map partition to k rows before the
  * exchange.
  */
case class TopKByScore(
    scoreChild: Expression,
    idChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreChild, idChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreChild.eval(input)
    val i = idChild.eval(input)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    o.heap.foreach { case (s, i) => b.add(s, i) }
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val rows = b.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.heap.size)
    b.heap.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b  = new TopKBuffer(in.readInt())
    val n  = in.readInt()
    (0 until n).foreach(_ => b.add(in.readDouble(), in.readLong()))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(scoreChild = c(0), idChild = c(1))

  override def prettyName: String = "graft_topk"
}
