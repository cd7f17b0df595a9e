package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KLL-style quantile sketch (Karnin/Lang/Liberty, FOCS 2016 —
  * simplified to a fixed per-level capacity, the MRL flavor): a
  * mergeable, bounded-memory order-statistics summary. Level i holds
  * items of weight 2^i; an overflowing level sorts, keeps every other
  * element (deterministic alternating offset, so runs are
  * reproducible) and promotes them one level up. Rank error is
  * O(log(n/k)/k)·n with k items per level; memory is O(k·log(n/k))
  * regardless of n — the reason this composes at 100 TB where an
  * exact quantile's global sort does not.
  *
  * Deployment shape matches CountMinSketch/TopKSketch: KllAgg builds
  * the binary sketch in one partial-aggregable pass (partitions merge
  * level-wise), KllQuantile probes it. With capacity ≥ n the level-0
  * buffer never compacts and the sketch is provably EXACT (rank =
  * ceil(q·n), the order statistic) — the oracle-checkable mode;
  * KllSpec pins the error envelope under tight capacities where
  * compaction does happen.
  */
object KllFns {

  /** levels(i) = items of weight 2^i. */
  final case class Sketch(k: Int, levels: Array[scala.collection.mutable.ArrayBuffer[Double]],
                          var alternate: Int) {
    def totalWeight: Long =
      levels.zipWithIndex.map { case (b, i) => b.length.toLong << i }.sum
  }

  def empty(k: Int): Sketch =
    Sketch(k, Array(scala.collection.mutable.ArrayBuffer.empty[Double]), 0)

  def add(s: Sketch, v: Double): Sketch = {
    s.levels(0) += v
    compress(s)
  }

  private def ensureLevel(s: Sketch, i: Int): Sketch =
    if (i < s.levels.length) s
    else Sketch(s.k, s.levels :+ scala.collection.mutable.ArrayBuffer.empty[Double], s.alternate)

  def compress(s0: Sketch): Sketch = {
    var s = s0
    var i = 0
    while (i < s.levels.length) {
      if (s.levels(i).length > s.k) {
        val sorted = s.levels(i).sorted
        // deterministic alternating offset replaces KLL's coin flip:
        // reproducible across runs/partitionings, same 1/2 sampling
        val off = s.alternate & 1
        s.alternate += 1
        s = ensureLevel(s, i + 1)
        val kept = (off until sorted.length by 2).map(sorted)
        s.levels(i + 1) ++= kept
        s.levels(i).clear()
      }
      i += 1
    }
    s
  }

  def merge(a: Sketch, b: Sketch): Sketch = {
    var s = a
    var i = 0
    while (i < b.levels.length) {
      s = ensureLevel(s, i)
      s.levels(i) ++= b.levels(i)
      i += 1
    }
    compress(s)
  }

  /** Weighted order statistic: the smallest value whose cumulative
    * weight reaches ceil(q · N). Exact when no compaction occurred. */
  def quantile(s: Sketch, q: Double): Double = {
    val items = s.levels.zipWithIndex.flatMap { case (b, i) =>
      b.map(v => (v, 1L << i))
    }.sortBy(_._1)
    if (items.isEmpty) return Double.NaN
    val n = items.map(_._2).sum
    val target = math.max(1L, math.ceil(q * n).toLong)
    var acc = 0L
    var j = 0
    while (j < items.length) {
      acc += items(j)._2
      if (acc >= target) return items(j)._1
      j += 1
    }
    items.last._1
  }

  def toBytes(s: Sketch): Array[Byte] = {
    val n = s.levels.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 4 + s.levels.length * 4 + n * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(s.k).putInt(s.alternate).putInt(s.levels.length)
    s.levels.foreach(b => bb.putInt(b.length))
    s.levels.foreach(_.foreach(bb.putDouble))
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Sketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val k = bb.getInt; val alt = bb.getInt; val nl = bb.getInt
    val sizes = Array.fill(nl)(bb.getInt)
    val levels = sizes.map { sz =>
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      var i = 0
      while (i < sz) { b += bb.getDouble; i += 1 }
      b
    }
    Sketch(k, levels, alt)
  }
}

case class KllAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllFns.Sketch] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr) match {
      case (_: NumericType, Literal(kk: Int, IntegerType)) if kk >= 8 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "kll_agg needs (numeric, capacity int literal >= 8)")
    }

  private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case ShortType => v => v.asInstanceOf[Short].toDouble
    case _: DecimalType => v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case _ => v => v.asInstanceOf[Number].doubleValue()
  }

  override def createAggregationBuffer(): KllFns.Sketch = KllFns.empty(k)

  override def update(buf: KllFns.Sketch, input: InternalRow): KllFns.Sketch = {
    val v = child.eval(input)
    if (v != null) KllFns.add(buf, toDouble(v)) else buf
  }

  override def merge(buf: KllFns.Sketch, other: KllFns.Sketch): KllFns.Sketch =
    KllFns.merge(buf, other)

  override def eval(buf: KllFns.Sketch): Any = KllFns.toBytes(buf)
  override def serialize(buf: KllFns.Sketch): Array[Byte] = KllFns.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): KllFns.Sketch = KllFns.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): KllAgg =
    copy(child = cs(0), kExpr = cs(1))
}

case class KllQuantile(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile needs (binary, double), got $other")
    }

  override def nullSafeEval(sketch: Any, q: Any): Any =
    KllFns.quantile(KllFns.fromBytes(sketch.asInstanceOf[Array[Byte]]),
      q.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sketch, q) => {
      s"${ev.value} = graft.expressions.KllFns.quantile(" +
        s"graft.expressions.KllFns.fromBytes($sketch), $q);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantile =
    copy(left = l, right = r)
}

object KllSketch {
  private val aggFace = new FnRegistry("kll_agg",
    exprs => KllAgg(exprs(0), exprs(1)).toAggregateExpression())
  private val quantileFace = new FnRegistry("kll_quantile",
    exprs => KllQuantile(exprs(0), exprs(1)))

  def register(spark: SparkSession): Unit = {
    aggFace.register(spark)
    quantileFace.register(spark)
  }

  def kllAgg(spark: SparkSession, value: Column, k: Int): Column =
    aggFace.column(spark, value, org.apache.spark.sql.functions.lit(k))

  def kllQuantile(spark: SparkSession, sketch: Column, q: Column): Column =
    quantileFace.column(spark, sketch, q.cast("double"))
}
