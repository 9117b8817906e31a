package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Weighted-keyless reservoir sample of `k` Long values per group — the
  * TypedImperativeAggregate SURVEY §4/§7.3 calls out as the one custom
  * aggregate that earns its keep: per-key fanout sampling via
  * `Window.partitionBy(key).orderBy(h).row_number <= k` SORTS every
  * group, O(fanout log fanout) per key and a full width shuffle of all
  * candidate rows; a reservoir keeps O(k) state per key, combines
  * map-side (partial aggregation), and never sorts.
  *
  * Determinism contract: the survival decision for the i-th element uses
  * the deterministic splitmix-style hash of (seed, value, count-so-far),
  * NOT java.util.Random — so results are stable for a fixed arrival order.
  * Arrival order itself depends on partitioning, which is why the
  * oracle-gated sampling queries keep the hash-race window form and this
  * aggregate is the documented scale path (like IVF vs brute-force ANN).
  */
case class ReservoirSample(
    child: Expression,
    k: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ReservoirBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"reservoir_sample requires a bigint column, got ${other.sql}")
  }

  override def createAggregationBuffer(): ReservoirBuffer = new ReservoirBuffer(k)

  override def update(buf: ReservoirBuffer, input: InternalRow): ReservoirBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], seed)
    buf
  }

  override def merge(buf: ReservoirBuffer, other: ReservoirBuffer): ReservoirBuffer = {
    buf.mergeWith(other, seed)
    buf
  }

  override def eval(buf: ReservoirBuffer): Any =
    new GenericArrayData(buf.items.take(buf.size))

  override def serialize(buf: ReservoirBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    out.writeLong(buf.seen)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.items(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ReservoirBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new ReservoirBuffer(k)
    val n = in.readInt()
    buf.seen = in.readLong()
    var i = 0
    while (i < n) { buf.items(i) = in.readLong(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ReservoirSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ReservoirSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "reservoir_sample"
}

/** O(k) per-group state: the classic Algorithm-R replacement rule with a
  * deterministic hash in place of the RNG. */
final class ReservoirBuffer(val k: Int) {
  val items: Array[Long] = new Array[Long](k)
  var size: Int = 0
  var seen: Long = 0L

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def add(v: Long, seed: Long): Unit = {
    seen += 1
    if (size < k) { items(size) = v; size += 1 }
    else {
      // replace slot j = hash(seed, v, seen) mod seen; survive if j < k
      val j = java.lang.Math.floorMod(mix(seed ^ mix(v) ^ seen), seen)
      if (j < k) items(j.toInt) = v
    }
  }

  def mergeWith(other: ReservoirBuffer, seed: Long): Unit = {
    var i = 0
    while (i < other.size) { add(other.items(i), seed); i += 1 }
    seen += other.seen - other.size // count unseen evictions toward weighting
  }
}

object ReservoirSample {
  /** Column-API entry point: `ReservoirSample.of(col, k)` inside an agg. */
  def of(c: Column, k: Int, seed: Long = 42L): Column =
    ColumnShim.column(
      ReservoirSample(ColumnShim.expression(c), k, seed).toAggregateExpression())
}
