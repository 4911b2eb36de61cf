// Hosted inside the org.apache.spark.sql package tree because the
// expression-author surface (AbstractDataType, ExpressionUtils) is
// private[sql]; this is the standard extension point for native
// Catalyst expressions compiled against the Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector hot path. The HOF form
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) allocates an
  * intermediate array per row and evaluates interpreted; this is a
  * primitive-loop with full codegen — the difference is ~10× on the
  * ANN scoring kernel and grows with fan-out.
  *
  * Semantics are EXACTLY the HOF form's, so [[RewriteHofDotProduct]]
  * can substitute it unconditionally: mismatched lengths → null
  * (zip_with pads the shorter side with null, poisoning the sum) and
  * any null element → null. Dense equal-length inputs take the
  * branch-light accumulation loop.
  *
  * Custom-expression ladder (SURVEY.md §7.4): built-ins cover all
  * reference parity; this is the one extension operator where a native
  * `Expression` is genuinely warranted.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true // ragged/null-element inputs

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n && !$bad; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
         |    else { $acc += $a.getDouble($i) * $b.getDouble($i); }
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native MinHash signature kernel. The HOF form
  * (`transform(sequence(0, p-1), seed => array_min(transform(sh, s =>
  * xxhash64(s, seed))))`) is interpreted (higher-order functions are
  * CodegenFallback) and re-hashes every shingle STRING once per
  * permutation — p full string hashes per element. This expression is
  * bit-compatible with that form (same XXH64 chaining:
  * `hash(seed=42, s) then hash(·, p)`) but hashes each string ONCE and
  * derives all p permutation values from the 8-byte intermediate —
  * p× less string hashing, zero intermediate arrays, full codegen.
  *
  * Null/empty parity with the HOF: a null element contributes
  * `hashInt(p, 42)` (XxHash64 skips null children); an empty shingle
  * array yields null (`array_min` of an empty array).
  */
case class MinHashSignature(child: Expression, perms: Int)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{LongType, StringType}

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true // empty shingle set → null

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
            s.numBytes(), 42L)
        }
      var p = 0
      while (p < perms) {
        val hp = XXH64.hashInt(p, h)
        if (hp < mins(p)) mins(p) = hp
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val hp = ctx.freshName("hp")
      val s = ctx.freshName("s")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$perms];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h;
         |    if ($a.isNullAt($i)) {
         |      $h = 42L;
         |    } else {
         |      org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |      $h = $xxh.hashUnsafeBytes($s.getBaseObject(),
         |        $s.getBaseOffset(), $s.numBytes(), 42L);
         |    }
         |    for (int $p = 0; $p < $perms; $p++) {
         |      long $hp = $xxh.hashInt($p, $h);
         |      if ($hp < $mins[$p]) { $mins[$p] = $hp; }
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

object VectorExpressions {
  /** Column-level entry point for the native dot product. */
  def dotNative(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column-level entry point for the native minhash signature. */
  def minhashNative(sh: Column, perms: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(sh), perms))
}

/** Optimizer rule: recognize the declarative dot-product idiom
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, x) => acc + x)`
  * anywhere in a plan and substitute the codegen'd [[DotProduct]]
  * kernel. Users (and this repo's own `Similarity.dot`/`norm`) write
  * the composable HOF form; the session rewrites it to the primitive
  * loop — the Catalyst-native way to accelerate an idiom without
  * changing any call site. Registered build-time via [[GraftExtensions]]
  * (`injectOptimizerRule`) or at runtime via [[GraftFunctions.register]]
  * (`experimental.extraOptimizations`). Substitution is semantics-exact
  * because [[DotProduct]] reproduces the HOF's ragged-length and
  * null-element behavior.
  */
object RewriteHofDotProduct
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, LambdaFunction, ZipWith, Literal, Multiply, NamedLambdaVariable}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  private def isElementwiseMul(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (isVar(l, a) && isVar(r, b)) || (isVar(l, b) && isVar(r, a))
    case _ => false
  }

  private def isPlainSum(zero: Expression, merge: Expression,
      finish: Expression): Boolean = {
    val zeroOk = zero match {
      case Literal(v, DoubleType) => v == 0.0
      case _ => false
    }
    val mergeOk = merge match {
      case LambdaFunction(Add(l, r, _),
          Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _) =>
        (isVar(l, acc) && isVar(r, el)) || (isVar(l, el) && isVar(r, acc))
      case _ => false
    }
    val finishOk = finish match {
      case LambdaFunction(body, Seq(acc: NamedLambdaVariable), _) =>
        isVar(body, acc)
      case _ => false
    }
    zeroOk && mergeOk && finishOk
  }

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, mul), zero, merge, finish)
          if doubleArray(a) && doubleArray(b) &&
            isElementwiseMul(mul) && isPlainSum(zero, merge, finish) =>
        DotProduct(a, b)
    }
}
