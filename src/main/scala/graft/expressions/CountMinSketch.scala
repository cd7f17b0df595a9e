package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan '05): fixed-size
  * frequency estimates for an unbounded item domain — the one-pass
  * answer to "how often does X occur" when the exact groupBy's shuffle
  * of every distinct item is the bottleneck. depth x width counters;
  * estimates NEVER undercount (min over depth rows), overcount is
  * bounded by ~N/width per row with high probability across depth.
  *
  * Same deployment shape as BloomFilter: CountMinAgg builds the
  * binary sketch in one partial-aggregable pass (partitions merge by
  * elementwise sum), CountMinEstimate probes it inside whole-stage
  * codegen. Completes the sketch tier next to space-saving top-k
  * (exact-on-heavy-hitters), HLL distinct, and bloom membership.
  */
object CmsFns {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Per-row 64-bit hash over the string BYTES, seeded by the row
    * index. Scrambling one shared 32-bit String.hashCode would make
    * any hashCode collision collide in EVERY row — depth would no
    * longer reduce overcount for such pairs, voiding the standard CMS
    * error bound. Independent byte-wise hashes per row restore it
    * (deterministic across JVMs: UTF-8 bytes + fixed constants). */
  private def rowHash(bytes: Array[Byte], row: Int): Long = {
    var h = mix((row + 1).toLong * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < bytes.length) { h = mix(h ^ (bytes(i) & 0xffL)); i += 1 }
    h
  }

  private def bucket(bytes: Array[Byte], row: Int, width: Int): Int =
    java.lang.Long.remainderUnsigned(rowHash(bytes, row), width).toInt

  def add(counters: Array[Long], item: String, depth: Int, width: Int, by: Long): Unit = {
    val bytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var d = 0
    while (d < depth) { counters(d * width + bucket(bytes, d, width)) += by; d += 1 }
  }

  /** Called from both interpreted eval and generated code. */
  def estimate(bytes: Array[Byte], item: String, depth: Int, width: Int): Long = {
    val itemBytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = bb.getLong((d * width + bucket(itemBytes, d, width)) * 8)
      if (c < min) min = c
      d += 1
    }
    min
  }

  def toBytes(counters: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(counters.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    counters.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 8)(bb.getLong)
  }
}

case class CountMinAgg(
    child: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val depth: Int = depthExpr.eval().asInstanceOf[Int]
  private lazy val width: Int = widthExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, depthExpr, widthExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, depthExpr, widthExpr) match {
      case (StringType, Literal(d: Int, IntegerType), Literal(w: Int, IntegerType))
        if d >= 1 && w >= 2 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "cms_agg needs (string, depth int literal, width int literal)")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CmsFns.add(buf, v.asInstanceOf[UTF8String].toString, depth, width, 1L)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = CmsFns.toBytes(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = CmsFns.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = CmsFns.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): CountMinAgg =
    copy(child = cs(0), depthExpr = cs(1), widthExpr = cs(2))
}

case class CountMinEstimate(left: Expression, right: Expression, depth: Int, width: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs (binary, string), got $other")
    }

  override def nullSafeEval(sketch: Any, item: Any): Any =
    CmsFns.estimate(sketch.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String].toString, depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sketch, item) => {
      s"${ev.value} = graft.expressions.CmsFns.estimate($sketch, $item.toString(), $depth, $width);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountMinEstimate =
    copy(left = l, right = r)
}

object CountMinSketch {
  private val aggFace = new FnRegistry("cms_agg",
    exprs => CountMinAgg(exprs(0), exprs(1), exprs(2)).toAggregateExpression())
  private val estimateFace = new FnRegistry("cms_estimate",
    exprs => {
      def lit(e: Expression, dflt: Int): Int = e match {
        case Literal(v: Int, IntegerType) => v
        case _ => dflt
      }
      CountMinEstimate(exprs(0), exprs(1), lit(exprs(2), 4), lit(exprs(3), 4096))
    })

  def register(spark: SparkSession): Unit = {
    aggFace.register(spark)
    estimateFace.register(spark)
  }

  def cmsAgg(spark: SparkSession, item: Column, depth: Int, width: Int): Column =
    aggFace.column(spark, item,
      org.apache.spark.sql.functions.lit(depth), org.apache.spark.sql.functions.lit(width))

  def cmsEstimate(spark: SparkSession, sketch: Column, item: Column,
                  depth: Int, width: Int): Column =
    estimateFace.column(spark, sketch, item,
      org.apache.spark.sql.functions.lit(depth), org.apache.spark.sql.functions.lit(width))
}
