package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge, BridgeTypes}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}

/** Native Catalyst expressions for embedding math.
  *
  * The composable form (`zip_with` + `aggregate`, or a 64-term unrolled
  * chain as in [[Fns.dotUnrolled]]) is semantically fine but the unrolled
  * chain exceeds the JVM 64 KB method limit and knocks the whole projection
  * out of whole-stage codegen. These expressions generate a tight loop
  * instead, keeping the stage codegen'd (SURVEY.md §7.3: custom
  * `Expression` only where bench shows HOF overhead matters — it did).
  *
  * Accumulation is strictly left-to-right over the array, identical to the
  * unrolled chain and to the DuckDB oracle's left-associated SQL, so
  * results stay bit-identical across all three forms.
  */
object VectorExpressions {

  /** cos(a, b) = dot / (sqrt(norm_a) * sqrt(norm_b)), one pass, codegen'd. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    // Registered as a SQL function (GraftExtensions): without declared
    // input types, array<double> would pass analysis and getFloat() on
    // 8-byte elements would silently return garbage.
    override def inputTypes: Seq[BridgeTypes.AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_similarity"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi
        na += xi * xi
        nb += yi * yi
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val i = ctx.freshName("i")
        val xi = ctx.freshName("xi")
        val yi = ctx.freshName("yi")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |double $na = 0.0;
           |double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = (double) $a.getFloat($i);
           |  double $yi = (double) $b.getFloat($i);
           |  $dot += $xi * $yi;
           |  $na += $xi * $xi;
           |  $nb += $yi * $yi;
           |}
           |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Left-to-right dot product over two float arrays, codegen'd loop. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {

    override def inputTypes: Seq[BridgeTypes.AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      dot
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val i = ctx.freshName("i")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $dot;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** 60-bit numeric hash from an MD5 half (see [[HashUtils.md5Long60]]):
    * long-typed min-hashes stay inside HashAggregate (string mins fall
    * back to SortAggregate), and the DuckDB oracle mirrors the value as
    * `md5_number_lower/upper(s) % 2^60`.
    */
  case class Md5Half60(child: Expression, upperHalf: Boolean)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ExpectsInputTypes {

    override def inputTypes: Seq[BridgeTypes.AbstractDataType] = Seq(StringType)
    override def dataType: DataType =
      org.apache.spark.sql.types.LongType
    override def prettyName: String = "md5_half60"

    override def nullSafeEval(input: Any): Any =
      HashUtils.md5Long60(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        upperHalf)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashUtils.md5Long60($c, $upperHalf)")

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** [[Md5Half60]] of `prefix || s` with the prefix streamed into the
    * digest — equivalent to `md5Half60(concat(lit(prefix), s))` but with
    * no per-row concat allocation. The MinHash signature aggregate calls
    * this 8× per shingle; the saved allocations keep the stage fast under
    * any heap geometry.
    */
  case class Md5Half60Prefixed(prefix: String, child: Expression,
      upperHalf: Boolean)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ExpectsInputTypes {

    override def inputTypes: Seq[BridgeTypes.AbstractDataType] = Seq(StringType)

    private lazy val prefixBytes =
      prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

    override def dataType: DataType =
      org.apache.spark.sql.types.LongType
    override def prettyName: String = "md5_half60_prefixed"

    override def nullSafeEval(input: Any): Any =
      HashUtils.md5Long60p(prefixBytes,
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        upperHalf)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("md5Prefix", prefixBytes, "byte[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.HashUtils.md5Long60p($ref, $c, $upperHalf)")
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** `k` Kirsch–Mitzenmacher min-hash bases from ONE MD5 digest
    * (see [[HashUtils.md5Km]]): `array(h_0 … h_{k-1})` with
    * `h_i = (md5_lower60 + i·md5_upper60) mod 2^60`. Replaces the
    * per-seed digest family in MinHash signatures — one digest per
    * shingle instead of `k/2`, with bit-exact DuckDB oracle mirroring
    * via `md5_number_lower/upper(s) % 2^60` + BIGINT arithmetic.
    */
  case class Md5Km(child: Expression, numHashes: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ExpectsInputTypes {
    require(numHashes >= 1 && numHashes <= 8,
      "lower60 + 7*upper60 is the overflow-free KM bound")

    override def inputTypes: Seq[BridgeTypes.AbstractDataType] = Seq(StringType)
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
    override def prettyName: String = "md5_km"

    override def nullSafeEval(input: Any): Any =
      ArrayData.toArrayData(HashUtils.md5Km(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        numHashes))

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        "org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
          s"graft.functions.HashUtils.md5Km($c, $numHashes))")

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Bloom-filter membership probe over long hashes (Bloom CACM 1970;
    * `org.apache.spark.util.sketch.BloomFilter`) — the broadcast-side
    * pre-prune of [[graft.api.GraftPipelines.bloomDecontaminate]]. The
    * serialized filter bytes ride the expression to every task; the
    * filter deserializes once per use site (transient lazy) and codegen
    * emits a direct `mightContainLong` call via a reference object, so
    * the probe runs inside the whole-stage-codegen'd scan filter — no
    * UDF, no shuffle. Bloom filters have no false negatives, so a
    * downstream exact join sees every true match; false positives are
    * bounded by the fpp the builder chose.
    */
  case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[BridgeTypes.AbstractDataType] =
      Seq(org.apache.spark.sql.types.LongType)
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override def prettyName: String = "bloom_might_contain_long"

    @transient private lazy val bloom =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloomBytes))

    // Array[Byte] equality is reference-based, so the synthesized
    // case-class equals would make two semantically identical probes
    // compare unequal — defeating Catalyst canonicalization and thus
    // subexpression elimination / plan-fragment reuse whenever the same
    // filter is built twice. Compare (and hash) the BYTES instead.
    override def equals(other: Any): Boolean = other match {
      case BloomMightContainLong(c, b) =>
        c == child && java.util.Arrays.equals(b, bloomBytes)
      case _ => false
    }
    override def hashCode(): Int =
      31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

    override def nullSafeEval(input: Any): Any =
      bloom.mightContainLong(input.asInstanceOf[Long])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloom", bloom,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Column-level API. */
  def cosineSimilarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def md5Half60(s: Column, upperHalf: Boolean): Column =
    Bridge.column(Md5Half60(Bridge.expression(s), upperHalf))

  def md5Half60Prefixed(prefix: String, s: Column, upperHalf: Boolean): Column =
    Bridge.column(Md5Half60Prefixed(prefix, Bridge.expression(s), upperHalf))

  def md5Km(s: Column, numHashes: Int): Column =
    Bridge.column(Md5Km(Bridge.expression(s), numHashes))

  def bloomMightContainLong(v: Column, bloomBytes: Array[Byte]): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(v), bloomBytes))
}
