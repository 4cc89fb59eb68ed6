package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused form of graft's cross-engine h32 hash: the first 4 MD5
  * digest bytes as an unsigned big-endian long — bit-identical to the
  * composed `conv(substring(md5(x), 1, 8), 16, 10)` (the first 8 hex
  * chars ARE the first 4 digest bytes), but with none of its per-call
  * garbage: no 32-char hex string, no substring slice, no base-16
  * string parse. One digest over the raw UTF-8 bytes, four masks.
  *
  * `doGenCode` emits a static call, so the hash stays inside
  * whole-stage codegen wherever the composed form did — and unlike the
  * composed form it is also cheap when evaluated INTERPRETED, which is
  * where hashes inside higher-order-function lambdas always run.
  */
case class H32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    H32.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.H32.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object H32 {
  // MessageDigest is not thread-safe and getInstance costs an allocation
  // + provider lookup — one digester per task thread, reset by digest()
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val d = md.get().digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
