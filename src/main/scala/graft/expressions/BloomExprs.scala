package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-probe expressions for the streaming hot paths. */
object BloomExprs {

  /** Count of array elements that might be in the serialized Bloom
    * filter — ONE codegen'd pass sharing ONE deserialized filter
    * instance across all rows of a task. Replaces
    * `size(filter(arr, h => might_contain(bloom, h)))`, whose
    * per-element lambda is CodegenFallback (§8's banned pattern; these
    * probes sit on the per-doc streaming decontaminate / corpus-near-dup
    * paths). No-false-negative direction is the Bloom's own.
    */
  def bloomHitCount(bloomBytes: Array[Byte], items: Column): Column = {
    require(bloomBytes != null && bloomBytes.nonEmpty,
      "bloomHitCount needs a serialized Bloom filter")
    Bridge.column(BloomHitCountExpr(
      Literal.create(bloomBytes, BinaryType), Bridge.expression(items)))
  }

  def bloomHitsK(bf: BloomFilter, arr: ArrayData): Int = {
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && bf.mightContainLong(arr.getLong(i))) hits += 1
      i += 1
    }
    hits
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}

/** Codegen'd Bloom hit counter. The serialized filter is the (foldable)
  * left child for expression-equality purposes; evaluation goes through
  * a single lazily-deserialized instance shipped into generated code as
  * a reference object (the BloomFilterMightContain pattern) — never
  * re-deserialized per row or per element.
  */
case class BloomHitCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bloom_hit_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (foldable binary, array<bigint>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  @transient private lazy val bf: BloomFilter =
    BloomExprs.deserialize(left.eval(null).asInstanceOf[Array[Byte]])

  override protected def nullSafeEval(b: Any, arr: Any): Any =
    BloomExprs.bloomHitsK(bf, arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomHitFilter", bf,
      classOf[BloomFilter].getName)
    // the left child's generated value (the raw bytes) is unused — the
    // deserialized filter rides along as a reference object instead
    defineCodeGen(ctx, ev, (_, a) =>
      s"graft.expressions.BloomExprs.bloomHitsK($bfRef, $a)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomHitCountExpr =
    copy(left = newLeft, right = newRight)
}
