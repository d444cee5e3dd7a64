package graft.functions.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Plurality vote in ONE partial-aggregable pass: the most frequent
  * child value per group, ties to the SMALLEST value under the type's
  * ordering — exactly
  *
  *   groupBy(g, label).agg(count(*) as cnt)
  *     .groupBy(g).agg(min_by(label, struct(-cnt, label)))
  *
  * fused into a single aggregate whose state is the (label → count)
  * tally map. What the fusion buys (the r14-verdict LPA/CC lever):
  *
  *   - the tally combines MAP-SIDE — the partial aggregate runs
  *     before the exchange, so the shuffle carries one combined tally
  *     per (partition, group) instead of |E| raw vote rows, and a
  *     hub node's million votes cost one map entry per task;
  *   - the two back-to-back hash aggregates (a (g,label) table, then
  *     a (g) table) collapse into one pass over the input.
  *
  * State size per group = the group's DISTINCT label count, bounded
  * by its degree; serialization between partial and final is the
  * compact (label, cnt) UnsafeRow stream (the Percentile layout from
  * Spark's own aggregate suite). Deterministic for any input order:
  * counts are exact, and the tie-break is a total order. */
case class VoteTop1(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[AnyRef, Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "vote_top1"
  override def nullable: Boolean = true
  override def dataType: DataType = child.dataType

  /** Restrict the child to atomic orderable NON-BUFFER-BACKED types
    * (r15-advice medium): the tally map stores first-sighted values,
    * and only UTF8String gets a defensive copy in [[update]]. A
    * BinaryType Array[Byte] (reference-hashed keys → miscounts even
    * with copies) or a buffer-backed array/struct (stored by
    * reference, corrupted when the input buffer is reused) must be
    * rejected at ANALYSIS, not silently miscounted — GraphAggs
    * .voteTop1 is a public generic wrapper, so the guard lives here.
    * Note the null divergence vs the count+min_by composition this
    * fuses: NULL labels are ignored entirely (never the plurality
    * winner), matching count(*)'s group-by-label behavior where a
    * null label group exists but min_by can still pick it — callers
    * vote over non-null label relations, where the two agree. */
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types._
    child.dataType match {
      case _: StringType | _: NumericType | DateType | BooleanType |
           TimestampType | TimestampNTZType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            "vote_top1 requires an atomic orderable non-binary child " +
              s"(string/numeric/date/timestamp/boolean), got " +
              dt.catalogString)
    }
  }

  private lazy val ord: Ordering[AnyRef] =
    org.apache.spark.sql.graft.ColumnBridge.orderingFor(child.dataType)
      .asInstanceOf[Ordering[AnyRef]]
  private lazy val rowProjection =
    UnsafeProjection.create(Array[DataType](child.dataType, LongType))

  override def createAggregationBuffer(): mutable.HashMap[AnyRef, Long] =
    mutable.HashMap.empty[AnyRef, Long]

  override def update(buf: mutable.HashMap[AnyRef, Long],
                      input: InternalRow): mutable.HashMap[AnyRef, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[AnyRef]
      val cur = buf.getOrElse(k, 0L)
      if (cur == 0L) {
        // first sighting: copy buffer-backed values before they are
        // overwritten by the next input row
        val owned = k match {
          case s: UTF8String => s.copy()
          case o => o
        }
        buf.update(owned, 1L)
      } else buf.update(k, cur + 1L)
    }
    buf
  }

  override def merge(b1: mutable.HashMap[AnyRef, Long],
                     b2: mutable.HashMap[AnyRef, Long])
      : mutable.HashMap[AnyRef, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    b1
  }

  override def eval(buf: mutable.HashMap[AnyRef, Long]): Any = {
    var bestK: AnyRef = null
    var bestC = -1L
    buf.foreach { case (k, c) =>
      if (c > bestC || (c == bestC && ord.lt(k, bestK))) {
        bestK = k; bestC = c
      }
    }
    bestK
  }

  // (label, cnt) UnsafeRow stream — the layout Spark's Percentile
  // aggregate uses for its own OpenHashMap state
  override def serialize(buf: mutable.HashMap[AnyRef, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val scratch = new Array[Byte](4 << 10)
    try {
      buf.foreach { case (k, c) =>
        val row = rowProjection.apply(InternalRow(k, c))
        out.writeInt(row.getSizeInBytes)
        row.writeToStream(out, scratch)
      }
      out.writeInt(-1)
      out.flush()
      bos.toByteArray
    } finally { out.close(); bos.close() }
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[AnyRef, Long] = {
    val ins = new DataInputStream(new ByteArrayInputStream(bytes))
    try {
      val buf = mutable.HashMap.empty[AnyRef, Long]
      var n = ins.readInt()
      while (n >= 0) {
        val bs = new Array[Byte](n)
        ins.readFully(bs)
        val row = new UnsafeRow(2)
        row.pointTo(bs, n)
        // values point into bs, which this map now owns — no copy
        buf.update(row.get(0, child.dataType).asInstanceOf[AnyRef],
          row.getLong(1))
        n = ins.readInt()
      }
      buf
    } finally ins.close()
  }

  override def withNewMutableAggBufferOffset(o: Int): VoteTop1 =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VoteTop1 =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VoteTop1 =
    copy(child = c)
}

/** Column wrappers for the custom aggregates. */
object GraphAggs {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.ColumnBridge

  /** See [[VoteTop1]]: most frequent value, ties to the smallest. */
  def voteTop1(label: Column): Column =
    ColumnBridge.column(
      VoteTop1(ColumnBridge.expression(label)).toAggregateExpression())
}
