package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(key, filter_bytes)`: membership probe of a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] — true when
  * `key` MIGHT be in the set the filter was built over, false when it
  * definitely is not (no false negatives). The kernel behind
  * [[graft.operators.BloomJoin]]: a selective join's build-side key set
  * becomes a KB–MB filter literal and the probe side drops
  * non-matching rows MAP-SIDE, before the join shuffle moves them —
  * the explicit form of runtime row-level filtering, usable at any
  * probe-side scale.
  *
  * The filter argument must be a foldable binary literal (the
  * serialized filter). It is deserialized ONCE per task via a
  * transient lazy val — never per row — and reached from generated
  * code through a codegen reference object, the same pattern Spark's
  * own runtime bloom-filter probe uses.
  */
case class BloomMightContainLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, BinaryType) if right.foldable => TypeCheckResult.TypeCheckSuccess
    case (LongType, BinaryType) => TypeCheckResult.TypeCheckFailure(
      "graft_bloom_contains filter argument must be a literal (the serialized filter)")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains requires (bigint, binary literal), " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval()
    require(bytes != null, "graft_bloom_contains: filter literal is null")
    BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
  }

  /** Called from generated code via the reference object. */
  def test(v: Long): Boolean = filter.mightContainLong(v)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  // BinaryExpression's nullSafeEval evaluates the filter literal per
  // row too — that is a constant reference load, not a deserialize;
  // the filter object itself is the lazy val above.
  override protected def nullSafeEval(v: Any, bytes: Any): Any =
    test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "bloomMightContain", this, classOf[BloomMightContainLong].getName)
    defineCodeGen(ctx, ev, (v, _) => s"$ref.test($v)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_blocked_bloom_contains(key, filter_bytes)`: membership probe
  * of a serialized [[BlockedBloom]] split-block filter — the
  * cache-local sibling of [[BloomMightContainLong]] for probe volumes
  * where the classic filter's k scattered bit reads (each a likely
  * cache miss once the filter outgrows L2) dominate: all probe bits
  * live in one 256-bit block, so a test is ~one cache line of traffic.
  * Same contract: no false negatives, ~fp-rate false positives, the
  * filter is a foldable binary literal deserialized once per task.
  */
case class BlockedBloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, BinaryType) if right.foldable => TypeCheckResult.TypeCheckSuccess
    case (LongType, BinaryType) => TypeCheckResult.TypeCheckFailure(
      "graft_blocked_bloom_contains filter argument must be a literal (the serialized filter)")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_blocked_bloom_contains requires (bigint, binary literal), " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  @transient private lazy val filter: BlockedBloom = {
    val bytes = right.eval()
    require(bytes != null, "graft_blocked_bloom_contains: filter literal is null")
    BlockedBloom.deserialize(bytes.asInstanceOf[Array[Byte]])
  }

  /** Called from generated code via the reference object. */
  def test(v: Long): Boolean = filter.mightContain(v)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_blocked_bloom_contains"

  override protected def nullSafeEval(v: Any, bytes: Any): Any =
    test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "blockedBloomContains", this, classOf[BlockedBloomContains].getName)
    defineCodeGen(ctx, ev, (v, _) => s"$ref.test($v)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
