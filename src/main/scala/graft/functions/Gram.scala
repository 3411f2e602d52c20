package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distributed GRAM / second-moment matrix of an embedding column in ONE
  * pass (graded by `x_emb_cov`) — the d×d statistic behind covariance,
  * PCA, and whitening: instead of exploding each row into d(d+1)/2
  * index-pair rows (a d²× row blow-up that shuffles data-sized state),
  * the aggregation buffer IS the upper-triangular moment matrix — each
  * executor folds its partition into a local d + d(d+1)/2 accumulator
  * and only those fixed-size buffers cross the shuffle, the exact shape
  * a 1000-executor pass over 10¹² vectors needs (cost: one scan + one
  * ~66 KB-per-partial tree reduction at d = 64).
  *
  * EXACT integer arithmetic end to end: the input is the embedding
  * pre-quantized to scale-6 decimal micros (`(e.cast(decimal) * 1e6)
  * .cast(long)` in Column space — the userStatsExact idiom, so the
  * quantization itself is the engine-parity-verified decimal cast), all
  * sums accumulate unscaled longs via `Math.addExact`, and the output
  * re-scales to DECIMAL(38,12) — order-independent and bit-identical
  * across any partitioning, which is what makes a d²-sized float
  * statistic ORACLE-hashable at all. Overflow is LOUD by design: unit-
  * scale embeddings give |q| ≤ 1e6, so a product is ≤ 1e12 and a single
  * unshared accumulator overflows around 9.2e6 extreme rows — at that
  * scale shard the pass (e.g. by id range) and recombine the exact
  * integer partials, or lower the quantization scale.
  */
object Gram {

  /** `graft_gram_agg(micros_array, d)` →
    * struct(n BIGINT, m ARRAY<DECIMAL(38,12)>) with
    * m = [d per-dimension sums] ++ [d(d+1)/2 upper-triangle product sums
    * in (i, j ≥ i) row-major order].
    */
  case class GramAgg(
      child: Expression,
      d: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Gram.Buffer] with UnaryLike[Expression] {

    private val nProds = d * (d + 1) / 2

    override def dataType: DataType = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("m", ArrayType(DecimalType(38, 12), containsNull = false),
        nullable = false)))
    override def nullable: Boolean = false
    override def prettyName: String = "graft_gram_agg"

    override def createAggregationBuffer(): Gram.Buffer =
      new Gram.Buffer(0L, new Array[Long](d), new Array[Long](nProds))

    override def update(buf: Gram.Buffer, input: InternalRow): Gram.Buffer = {
      val v = child.eval(input)
      if (v == null) return buf
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"graft_gram_agg: expected dim $d, got ${arr.numElements()}")
      val q = arr.toLongArray()
      buf.n += 1
      var i = 0
      var k = 0
      while (i < d) {
        buf.sums(i) = Math.addExact(buf.sums(i), q(i))
        var j = i
        while (j < d) {
          buf.prods(k) = Math.addExact(buf.prods(k), q(i) * q(j))
          k += 1
          j += 1
        }
        i += 1
      }
      buf
    }

    override def merge(buf: Gram.Buffer, other: Gram.Buffer): Gram.Buffer = {
      buf.n += other.n
      var i = 0
      while (i < d) {
        buf.sums(i) = Math.addExact(buf.sums(i), other.sums(i))
        i += 1
      }
      var k = 0
      while (k < nProds) {
        buf.prods(k) = Math.addExact(buf.prods(k), other.prods(k))
        k += 1
      }
      buf
    }

    override def eval(buf: Gram.Buffer): Any = {
      // sums are scale-6 micros → widen to the output's scale 12; products
      // of two scale-6 values are already scale-12 unscaled longs
      val out = new Array[Any](d + nProds)
      var i = 0
      while (i < d) {
        out(i) = org.apache.spark.sql.types.Decimal(
          Math.multiplyExact(buf.sums(i), 1000000L), 38, 12)
        i += 1
      }
      var k = 0
      while (k < nProds) {
        out(d + k) = org.apache.spark.sql.types.Decimal(buf.prods(k), 38, 12)
        k += 1
      }
      InternalRow(buf.n, new GenericArrayData(out))
    }

    override def serialize(buf: Gram.Buffer): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 8 * d + 8 * nProds)
      bb.putLong(buf.n)
      buf.sums.foreach(bb.putLong)
      buf.prods.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Gram.Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getLong()
      val sums = Array.fill(d)(bb.getLong())
      val prods = Array.fill(nProds)(bb.getLong())
      new Gram.Buffer(n, sums, prods)
    }

    override def withNewMutableAggBufferOffset(n: Int): GramAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): GramAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): GramAgg =
      copy(child = newChild)
  }

  final class Buffer(var n: Long, val sums: Array[Long], val prods: Array[Long])

  /** Idempotent session registration (the Kll/Theta/Freq pattern). */
  def register(s: org.apache.spark.sql.SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gram_agg", (args: Seq[Expression]) => {
        val d = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_gram_agg d must be an integer literal, got $other")
        }
        GramAgg(args(0), d).toAggregateExpression()
      }, "scala_udf")

  /** Driver-side helper: upper-triangle linear index of (i, j ≥ i). */
  def triIndex(d: Int, i: Int, j: Int): Int =
    i * d - i * (i - 1) / 2 + (j - i)
}
