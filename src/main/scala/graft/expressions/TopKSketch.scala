package graft.expressions

import scala.collection.mutable
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy-hitters sketch (Metwally et al. '05) as a
  * TypedImperativeAggregate: tracks at most `capacity` counters; an
  * unseen item evicts the minimum counter and inherits its count (the
  * classic overestimate bound: err <= n/capacity). Merge sums counter
  * maps and re-prunes to capacity.
  *
  * Why: the exact global top-k over a 100 TB token stream needs a full
  * groupBy shuffle of every distinct token; this sketch gets the
  * heavy hitters with one partial-aggregable pass and a
  * capacity-bounded buffer per partition — the sketch tier of the
  * custom-operator ladder (SURVEY §4). Items with frequency >
  * n/capacity are guaranteed present (proved by TopKSketchSpec
  * against the exact count).
  *
  * Output: array<struct<item string, cnt long>> sorted by cnt desc,
  * item asc, truncated to k.
  */
case class TopKSketch(
    child: Expression,
    kExpr: Expression,
    capacityExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  private lazy val capacity: Int = capacityExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr, capacityExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))))

  override def checkInputDataTypes(): TypeCheckResult = (child.dataType, kExpr, capacityExpr) match {
    case (StringType, Literal(kv: Int, IntegerType), Literal(c: Int, IntegerType))
      if kv >= 1 && c >= kv => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "top_k_sketch needs (string, k int literal, capacity int literal >= k)")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def offer(buf: mutable.HashMap[String, Long], item: String, by: Long): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + by)
      case None =>
        if (buf.size < capacity) buf.update(item, by)
        else {
          // evict the min counter (ties: lexicographically smallest for
          // determinism); newcomer inherits its count — the
          // space-saving overestimate
          val (minItem, minCnt) = buf.minBy { case (i, c) => (c, i) }
          buf.remove(minItem)
          buf.update(item, minCnt + by)
        }
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.toSeq.sortBy { case (i, c) => (-c, i) }
      .foreach { case (i, c) => offer(buf, i, c) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, c) =>
      InternalRow(UTF8String.fromString(i), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) => out.writeUTF(i); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKSketch = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKSketch = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKSketch =
    copy(child = cs(0), kExpr = cs(1), capacityExpr = cs(2))
}

object TopKSketch {
  private val face = new FnRegistry("top_k_sketch",
    exprs => TopKSketch(exprs(0), exprs(1), exprs(2)).toAggregateExpression())

  def register(spark: SparkSession): Unit = face.register(spark)

  def topKSketch(spark: SparkSession, item: Column, k: Int, capacity: Int): Column =
    face.column(spark, item, org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(capacity))
}
