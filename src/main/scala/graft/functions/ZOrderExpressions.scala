package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) clustering key: interleaves the low `bits` bits of
  * n long columns into one long, so sorting by the result co-locates
  * rows that are close in EVERY key dimension at once — the data-layout
  * primitive behind multi-column data skipping (a z-sorted table's
  * parquet row-group min/max ranges stay tight on ALL interleaved
  * columns, so a conjunctive predicate prunes row groups a
  * single-column sort order cannot). Layout work is exactly the kind of
  * job that pays once at write time and saves every scan at 100 TB.
  *
  * Inputs must already be NON-NEGATIVE and < 2^bits — quantize first
  * (e.g. [[SearchSorted]] bin indices or integer surrogate keys); an
  * out-of-range value throws rather than silently producing a key that
  * interleaves garbage bits. Bit i of column c lands at output bit
  * `i·n + c` — the standard Morton layout, replayable in any engine
  * with shift/and arithmetic (the oracle recomputes it in DuckDB).
  */
object ZOrderKernels {
  def interleave(values: Array[Long], bits: Int): Long = {
    val n = values.length
    var out = 0L
    var c = 0
    while (c < n) {
      val v = values(c)
      if (v < 0L || v >= (1L << bits))
        throw new IllegalArgumentException(
          s"graft_zorder: value $v of column $c outside [0, 2^$bits) — quantize inputs first")
      var i = 0
      while (i < bits) {
        out |= ((v >>> i) & 1L) << (i * n + c)
        i += 1
      }
      c += 1
    }
    out
  }
}

case class ZOrderKey(children: Seq[Expression], bits: Int) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure("graft_zorder needs at least 2 key columns")
    // long multiply: an absurd bits value would overflow the INT
    // product past the guard (1073741824*4 wraps to 0) and then hang
    // the interleave loop per row
    else if (bits < 1 || bits.toLong * children.size > 63)
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder: bits*columns must fit a long (${bits}*${children.size} > 63)")
    else if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder requires bigint key columns, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_zorder"

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Long](children.size)
    var c = 0
    while (c < vals.length) {
      val v = children(c).eval(input)
      if (v == null) return null // a null key has no position in z-space
      vals(c) = v.asInstanceOf[Long]
      c += 1
    }
    ZOrderKernels.interleave(vals, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val anyNull = evals.map(e => e.isNull.toString).mkString(" || ")
    val fill = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
    ev.copy(code = code"""
      ${evals.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        long[] $arr = new long[${children.size}];
        $fill
        ${ev.value} = graft.functions.ZOrderKernels.interleave($arr, $bits);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
