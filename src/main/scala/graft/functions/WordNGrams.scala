package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram expression: `array<string>` of tokens → the
  * space-joined sliding n-grams, in one pass over the array.
  *
  * This is the codegen upgrade of `Contamination.ngrams`' composed
  * form (n-1 `zip_with`s over shifted `slice`s). Higher-order
  * functions never participate in whole-stage codegen — each zip_with
  * runs its lambda interpreted per element and materializes a full
  * intermediate array per fold step, so the composed form does n-1
  * interpreted passes + n-1 allocations per row on the map side of
  * every gram-based operator (dup-ngram share, Jaccard, winnowing,
  * contamination, streaming decontamination). Here `doGenCode` emits a
  * single static call, so gram construction stays inside the generated
  * loop, builds each gram with one `UTF8String.concatWs` (byte-level
  * copy, no per-step arrays), and is equally cheap when evaluated
  * interpreted — which is where `InferFiltersFromGenerate`'s copied
  * `size(...) > 0` guard under a Generate always runs it.
  *
  * Semantics are bit-identical to the composed form (pinned by
  * NGramsParitySpec property test):
  *  - null or short input (fewer than n tokens) → EMPTY array, matching
  *    `when(cnt > 0, joined).otherwise(array())` where a null `size`
  *    falls to `otherwise`;
  *  - a null token nulls every gram whose window covers it, matching
  *    `concat` null propagation inside the lambda;
  *  - n == 1 returns the tokens themselves (nulls kept).
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  // null input maps to an EMPTY array, so the expression itself never
  // returns null
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    WordNGrams.compute(child.eval(input).asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.WordNGrams.compute(
            ${c.isNull} ? null : ${c.value}, $n);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGrams {
  private val Space = UTF8String.fromString(" ")
  private val Empty: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    if (arr == null) return Empty
    val cnt = arr.numElements() - (n - 1)
    if (cnt <= 0) return Empty
    val out = new Array[Any](cnt)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < cnt) {
      var anyNull = false
      var j = 0
      while (j < n && !anyNull) {
        if (arr.isNullAt(i + j)) anyNull = true
        else parts(j) = arr.getUTF8String(i + j)
        j += 1
      }
      // concatWs SKIPS nulls rather than propagating, hence the explicit
      // window null check to match the composed form's concat semantics
      out(i) = if (anyNull) null else UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
