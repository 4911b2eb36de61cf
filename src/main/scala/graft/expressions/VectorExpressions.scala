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

/** Native one-pass shingle-hash kernel: text → distinct xxhash64 values
  * of its word n-grams, bit-compatible with the HOF spec
  * `transform(shingles(text, n), s => xxhash64(s))` (shingles =
  * whitespace tokens joined by single spaces, first-occurrence
  * distinct). The HOF chain materializes 5+ intermediate arrays per row
  * — split, one zip_with per gram width, slice, array_distinct, the
  * hash transform — all interpreted (HOFs are CodegenFallback). This
  * kernel tokenizes the UTF8 bytes directly (Java-regex `\s` is the
  * six ASCII whitespace bytes, which never occur inside a multi-byte
  * UTF-8 sequence, so a byte scan is exact), assembles each gram into
  * one reused scratch buffer, and hashes it with the same XXH64 +
  * seed-42 call the `xxhash64` builtin uses — identical 64-bit values,
  * zero intermediate arrays.
  *
  * Dedup is on the HASH value rather than the gram string, so two
  * colliding grams (p ≈ 1e-10 per pair) would emit one value where the
  * HOF form emits the same value twice — every consumer treats the
  * array as a hash SET, where the distinction is invisible.
  *
  * `distinct = false` keeps every gram in POSITION order (one hash per
  * window, duplicates included) — the rolling k-gram hash sequence
  * that position-sensitive fingerprinting (winnowing) consumes.
  * `sorted = true` emits the distinct hashes in ASCENDING order — the
  * precondition [[SortedIntersectCount]] needs; sorting replaces the
  * first-occurrence HashSet dedup with a sort + adjacent-unique scan.
  */
case class ShingleHashes(child: Expression, n: Int,
    distinct: Boolean = true, sorted: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.{LongType, StringType}

  require(n >= 1, s"shingle_hashes needs n >= 1, got $n")
  require(!sorted || distinct, "sorted output implies distinct")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      n, distinct, sorted)

  // the heavy loop lives in one static helper; generated code calls it
  // directly (no virtual Expression.eval dispatch), keeping the
  // surrounding operators inside whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.ShingleHashes.compute($s, $n, $distinct, $sorted);")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
}

object ShingleHashes {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.Platform
  import org.apache.spark.unsafe.types.UTF8String

  // Java regex \s — the only whitespace `split(text, "\\s+")` knows
  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  /** N-gram hashes: distinct in first-occurrence order, or the full
    * positional sequence when `distinct = false`. Public + static so
    * generated code can call it.
    */
  def compute(text: UTF8String, n: Int, distinct: Boolean): GenericArrayData =
    compute(text, n, distinct, sorted = false)

  def compute(text: UTF8String, n: Int, distinct: Boolean,
      sorted: Boolean): GenericArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // token spans: starts(i) inclusive, ends(i) exclusive
    var tokens = 0
    val starts = new Array[Int](len / 2 + 1)
    val ends = new Array[Int](len / 2 + 1)
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        starts(tokens) = i
        while (i < len && !isWs(bytes(i))) i += 1
        ends(tokens) = i
        tokens += 1
      }
    }
    val grams = tokens - (n - 1)
    if (grams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val scratch = new Array[Byte](len)
    val seen =
      if (distinct && !sorted) new java.util.HashSet[java.lang.Long](grams * 2)
      else null
    val out = new Array[Long](grams)
    var outN = 0
    var g = 0
    while (g < grams) {
      var pos = 0
      var k = 0
      while (k < n) {
        if (k > 0) { scratch(pos) = ' '; pos += 1 }
        val w = ends(g + k) - starts(g + k)
        System.arraycopy(bytes, starts(g + k), scratch, pos, w)
        pos += w
        k += 1
      }
      // same call + seed as the xxhash64 builtin on a UTF8String
      val h = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, pos, 42L)
      if (seen == null || seen.add(h)) { out(outN) = h; outN += 1 }
      g += 1
    }
    if (sorted) {
      // sort + adjacent-unique replaces the HashSet dedup
      java.util.Arrays.sort(out, 0, outN)
      var w2 = 0
      var r = 0
      while (r < outN) {
        if (w2 == 0 || out(w2 - 1) != out(r)) { out(w2) = out(r); w2 += 1 }
        r += 1
      }
      outN = w2
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outN))
  }
}

/** MinHash signature over an ALREADY-hashed shingle set (the
  * [[ShingleHashes]] output): per the string kernel, each element's
  * base hash IS `xxhash64(s, 42)`, so deriving the permutation values
  * from the longs directly produces bit-identical signatures to
  * [[MinHashSignature]] with zero string work. Null elements take the
  * string kernel's null-child value (42); an empty array yields null.
  */
case class MinHashSignatureFromHashes(child: Expression, perms: Int)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.LongType

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true // empty shingle set → null

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 42L else arr.getLong(i)
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
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$perms];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $a.isNullAt($i) ? 42L : $a.getLong($i);
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
      newChild: Expression): MinHashSignatureFromHashes = copy(child = newChild)
}

/** Count of common values between two SORTED long arrays — the
  * Jaccard-verification hot loop. `size(array_intersect(a, b))`
  * builds a hash set of one side AND materializes the intersection
  * array just to take its length; over sorted inputs the same count is
  * a zero-allocation merge walk. Consecutive duplicates are skipped on
  * both sides, so the result equals `size(array_intersect(a, b))`
  * (distinct-set semantics) whenever the inputs are sorted, even with
  * repeated values. Inputs NOT in ascending order produce an
  * undercount — callers own the precondition (the `sorted = true`
  * [[ShingleHashes]] mode).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.{IntegerType, LongType}

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.SortedIntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var cnt = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        cnt += 1
        // skip duplicates of the matched value on both sides
        val v = x
        while (i < na && a.getLong(i) == v) i += 1
        while (j < nb && b.getLong(j) == v) j += 1
      }
    }
    cnt
  }
}

/** Native winnowing kernel (Schleimer/Wilkerson/Aiken 2003): the
  * distinct sliding-window minima of the positional k-gram hash
  * sequence, computed in one pass with a monotonic deque — O(grams)
  * total. The HOF spelling (`transform(sequence(...), i =>
  * array_min(slice(h, i, w)))`) copies w elements per window
  * (O(grams·w) interpreted work) and was the measured hot loop of the
  * winnow near-dup query. Short documents (fewer than w windows)
  * contribute their single global minimum, matching the HOF form's
  * fallback branch.
  */
case class WinnowHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.{LongType, StringType}

  // w <= 0 would walk the deque head past uninitialized slots and
  // return garbage silently; fail construction instead
  require(k >= 1 && w >= 1, s"winnow_hashes needs k >= 1 and w >= 1, got k=$k w=$w")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowHashes.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.WinnowHashes.compute($s, $k, $w);")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowHashes = copy(child = newChild)
}

object WinnowHashes {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val h = ShingleHashes.compute(text, k, distinct = false).toLongArray()
    val n = h.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](n)
    var outN = 0
    if (n < w) {
      var m = h(0); var i = 1
      while (i < n) { if (h(i) < m) m = h(i); i += 1 }
      return new GenericArrayData(Array(m))
    }
    // monotonic deque of candidate indices, increasing hash values
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    var i = 0
    while (i < n) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = h(deque(head))
        if (seen.add(m)) { out(outN) = m; outN += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outN))
  }
}

/** Native 64-bit SimHash kernel: per-bit majority vote over the
  * xxhash64 values of a document's whitespace tokens (every occurrence
  * counted), computed row-locally in one pass over the UTF8 bytes. The
  * relational form (explode tokens → 65-column groupBy) shuffles the
  * entire tokenized corpus to build what is per-document state; this
  * expression removes the explode AND the shuffle — the signature
  * computation runs inside the scan, which is the difference between a
  * corpus-sized exchange and none at 100 TB. Bit-identical to the
  * relational form (same tokenization, same per-token hash, same
  * `2·ones ≥ n` majority rule); a document with zero tokens yields
  * null (the relational form emits no row — callers filter nulls).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.{LongType, StringType}

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = true // zero-token input → null

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Long $boxed = org.apache.spark.sql.graft.SimHash64.compute($s);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

object SimHash64 {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.Platform
  import org.apache.spark.unsafe.types.UTF8String

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  /** Boxed so generated code can see the zero-token null. */
  def compute(text: UTF8String): java.lang.Long = {
    val bytes = text.getBytes
    val len = bytes.length
    val ones = new Array[Int](64)
    var n = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(bytes(i))) i += 1
        // same call + seed as xxhash64(token)
        val h = XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, 42L)
        var b = 0
        while (b < 64) {
          ones(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        n += 1
      }
    }
    if (n == 0) return null
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (2 * ones(b) >= n) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }
}

/** Native L2-normalizer: out[i] = in[i] / sqrt(Σ in[j]²), the squared
  * sum folded ascending from 0.0 — value-identical to
  * `sqrt([[DotProduct]](v, v))` followed by a per-element divide, which
  * as HOFs cost two interpreted passes with per-element boxing over the
  * whole corpus (the dominant term of `unitVectors` materialization at
  * 200k×64). One pass, primitive arrays, full codegen. Null contract:
  * a null element or an empty array yields null (the [[DotProduct]]
  * poisoning rule); an all-zero vector divides by 0.0 and propagates
  * NaN exactly like the HOF form.
  */
case class UnitVector(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    UnitVector.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = org.apache.spark.sql.graft.UnitVector.compute($v);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitVector =
    copy(child = newChild)
}

object UnitVector {
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

  /** Shared by eval and codegen; null on empty or null-element input. */
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    if (n == 0) return null
    val x = Array.ofDim[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val d = v.getDouble(i)
      x(i) = d
      s += d * d
      i += 1
    }
    val nrm = math.sqrt(s)
    i = 0
    while (i < n) { x(i) = x(i) / nrm; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(x)
  }
}

/** Cross-engine md5 minhash signature (the q95/q109 oracle hash):
  * per permutation s, the minimum of md5(gram ++ "#s") over the
  * document's gram set, emitted as lowercase hex strings — exactly the
  * `array_min(transform(sh, g => md5(concat(g, '#s'))))` HOF spelling
  * (hex is a monotone byte-wise encoding, so the unsigned-digest min
  * IS the lexicographic hex min). The HOF form is interpreted and
  * allocates a hex UTF8String per (gram, perm); this kernel reuses ONE
  * MessageDigest and keeps candidates as 16-byte digests, hexing only
  * the `perms` winners. Null grams are skipped (concat-null poisons to
  * null and array_min ignores nulls); a gram set with no non-null
  * entry yields a null signature element; an EMPTY gram array yields
  * null (array_min of an empty array).
  */
/** md5 majority-vote bit signature over a gram array: bit b of the
  * `bits`-bit signature is 1 iff ≥ half the grams' md5 digests have
  * bit b set (big-endian bit order within the digest — identical to
  * the hex-nibble decode `floor(nibble(b/4) / [8,4,2,1][b%4]) % 2`
  * the oracle SQL and the HOF spelling use). Returns the '0'/'1'
  * string so the result is directly comparable cross-engine.
  *
  * Exists because the interpreted HOF spelling
  * ([[graft.operators.Dedup]]'s `md5MajoritySig`, kept as the
  * executable specification) evaluates `bits × |grams|` nested
  * conv/substr column expressions per row — measured 44.9 s for
  * 5000 docs × ~53 bigrams × 60 bits at sf0.1 vs milliseconds here
  * (one digest per gram, primitive bit counting).
  */
case class Md5MajoritySignature(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.StringType

  require(bits >= 1 && bits <= 128,
    s"md5 majority signature needs 1 <= bits <= 128, got $bits")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))

  override def dataType: DataType = StringType

  override def nullable: Boolean = true // empty gram set → null

  override def nullSafeEval(input: Any): Any =
    Md5MajoritySignature.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |Object $r =
         |  org.apache.spark.sql.graft.Md5MajoritySignature.compute($a, $bits);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Md5MajoritySignature = copy(child = newChild)
}

object Md5MajoritySignature {
  import org.apache.spark.unsafe.types.UTF8String

  /** Shared by eval and codegen; null on an empty gram array. Null
    * gram elements are skipped (they cast no votes and do not count
    * toward n — matching the HOF aggregate over a null-free array).
    */
  def compute(arr: ArrayData, bits: Int): UTF8String = {
    val total = arr.numElements()
    if (total == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](bits)
    var n = 0
    var i = 0
    while (i < total) {
      if (!arr.isNullAt(i)) {
        n += 1
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < bits) {
          counts(b) += (d(b >> 3) >> (7 - (b & 7))) & 1
          b += 1
        }
      }
      i += 1
    }
    if (n == 0) return null
    val out = new Array[Byte](bits)
    var b = 0
    while (b < bits) {
      out(b) = if (2 * counts(b) >= n) '1'.toByte else '0'.toByte
      b += 1
    }
    UTF8String.fromBytes(out)
  }
}

case class Md5MinHashSignature(child: Expression, perms: Int)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.StringType

  require(perms >= 1, s"md5 minhash needs perms >= 1, got $perms")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullable: Boolean = true // empty gram set → null

  override def nullSafeEval(input: Any): Any =
    Md5MinHashSignature.compute(input.asInstanceOf[ArrayData], perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |Object $r =
         |  org.apache.spark.sql.graft.Md5MinHashSignature.compute($a, $perms);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Md5MinHashSignature = copy(child = newChild)
}

object Md5MinHashSignature {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val HEX = "0123456789abcdef".toCharArray

  /** Shared by eval and codegen; null on an empty gram array. */
  def compute(arr: ArrayData, perms: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val suffixes = Array.tabulate(perms)(s =>
      ("#" + s).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val mins = new Array[Array[Byte]](perms)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val g = arr.getUTF8String(i).getBytes
        var s = 0
        while (s < perms) {
          md.reset()
          md.update(g)
          md.update(suffixes(s))
          val d = md.digest()
          if (mins(s) == null || unsignedLess(d, mins(s))) mins(s) = d
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map { d =>
      if (d == null) null
      else {
        val out = new Array[Char](d.length * 2)
        var j = 0
        while (j < d.length) {
          out(2 * j) = HEX((d(j) >> 4) & 0xf)
          out(2 * j + 1) = HEX(d(j) & 0xf)
          j += 1
        }
        UTF8String.fromString(new String(out))
      }
    }: Array[AnyRef])
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }
}

/** Cross-engine md5 winnowing fingerprints (the q119 oracle hash):
  * window-min fingerprint selection (Schleimer et al., SIGMOD 2003)
  * over the md5 digests of a document's POSITIONAL gram sequence,
  * emitted as the distinct window minima as lowercase hex strings in
  * first-occurrence order — exactly the interpreted HOF spelling
  * `array_distinct(transform(sequence(1, n-w+1), j =>
  * array_min(slice(md5grams, j, w))))`. Hex is a monotone byte-wise
  * encoding, so the unsigned-digest min IS the lexicographic hex min,
  * and DuckDB's `list_aggregate(..., 'min')` over the same md5 hex
  * strings agrees bit-for-bit — which makes the whole winnowing
  * selection ANSI-oracle-checkable (q88's production kernel
  * [[WinnowHashes]] uses xxhash64-seeded rolling hashes only Spark
  * computes). Fewer grams than w → the single global min; an empty
  * gram sequence → an empty array (explode drops it, matching the
  * HOF's `array()` branch). The HOF form allocates a hex string per
  * (gram, window) and slice-copies w entries per window — O(n·w)
  * interpreted; this kernel digests each gram ONCE, runs the same
  * monotonic deque as [[WinnowHashes]] (O(n) total), and hexes only
  * the distinct winners. Null grams cannot arise from
  * `positionalShingles` (concat_ws never yields null) and are skipped
  * defensively, matching array_min's null-skipping.
  */
case class Md5WinnowFp(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.StringType

  require(w >= 1, s"md5 winnow needs w >= 1, got $w")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Md5WinnowFp.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  org.apache.spark.sql.graft.Md5WinnowFp.compute($a, $w);
       """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Md5WinnowFp = copy(child = newChild)
}

object Md5WinnowFp {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  private val HEX = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Char](d.length * 2)
    var j = 0
    while (j < d.length) {
      out(2 * j) = HEX((d(j) >> 4) & 0xf)
      out(2 * j + 1) = HEX(d(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }

  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Shared by eval and codegen; empty output is an empty array, never
    * null (the HOF spec's `array()` branch — explode drops it).
    */
  def compute(arr: ArrayData, w: Int): GenericArrayData = {
    val n0 = arr.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = new Array[Array[Byte]](n0)
    var n = 0
    var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        h(n) = md.digest()
        n += 1
      }
      i += 1
    }
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    if (n < w) {
      var m = h(0); i = 1
      while (i < n) { if (less(h(i), m)) m = h(i); i += 1 }
      return new GenericArrayData(Array[AnyRef](hex(m)))
    }
    // monotonic deque of candidate indices, increasing digest values —
    // the WinnowHashes selection verbatim, over 16-byte digests
    val seen = new java.util.HashSet[String]()
    val out = new java.util.ArrayList[AnyRef]()
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < n) {
      while (tail > head && !less(h(deque(tail - 1)), h(i))) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = hex(h(deque(head)))
        if (seen.add(m.toString)) out.add(m)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Row-local nearest-centroid assignment over a bounded driver-held
  * model (the IVF-model contract: k×dim doubles). The declarative
  * spelling — crossJoin against the broadcast centroid set, dot per
  * pair, `max(struct(sim, -cid))` per vector — materializes n·k joined
  * rows each carrying BOTH vectors (~15 GB at 200k×66×64d) plus a
  * per-vector aggregation; this kernel is the same argmax in one
  * codegen'd pass over the corpus, n·k dots and nothing else.
  *
  * Ordering is BIT-COMPATIBLE with `max(struct(sim, -cid))`: cosines
  * fold ascending from 0.0 (the [[DotProduct]] order), compared under
  * java.lang.Double's total order (NaN greatest, -0.0 < 0.0 — Spark's
  * double ordering), ties to the LOWEST cid; a null projection (ragged
  * centroid/vector dim) ranks below every real cosine, and a vector
  * whose every projection is null takes the lowest cid — exactly the
  * null-struct ordering of the crossJoin form. A NULL input vector
  * stays null (nullSafeEval), the one documented deviation (the
  * crossJoin form would assign it the lowest cid): the same documented
  * poisoning rule as `Similarity.signBucketNative`.
  */
case class NearestCentroid(child: Expression, cids: Array[Long],
    cents: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.LongType

  require(cids.nonEmpty && cids.length == cents.length,
    s"nearest_centroid needs a non-empty model with one id per centroid")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    NearestCentroid.compute(v.asInstanceOf[ArrayData], cids, cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centroidIds", cids, "long[]")
    val centsRef = ctx.addReferenceObj("centroidVecs", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = org.apache.spark.sql.graft.NearestCentroid.compute(" +
        s"$v, $idsRef, $centsRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)
}

object NearestCentroid {
  /** Shared by eval and codegen. `cids`/`cents` are parallel arrays
    * sorted ascending by cid (the column builder owns the sort).
    */
  def compute(v: ArrayData, cids: Array[Long],
      cents: Array[Array[Double]]): Long = {
    val n = v.numElements()
    val x = Array.ofDim[Double](n)
    var i = 0
    while (i < n) {
      // null element → every projection null → the crossJoin form's
      // all-null struct max lands on the lowest cid
      if (v.isNullAt(i)) return cids(0)
      x(i) = v.getDouble(i)
      i += 1
    }
    var bestIdx = 0
    var bestSet = false
    var bestSim = 0.0
    var c = 0
    while (c < cents.length) {
      val w = cents(c)
      if (w.length == n) { // ragged model row → null sim → never wins
        var acc = 0.0
        var j = 0
        while (j < n) { acc += x(j) * w(j); j += 1 }
        if (!bestSet || java.lang.Double.compare(acc, bestSim) > 0) {
          bestSet = true; bestSim = acc; bestIdx = c
        }
      }
      c += 1
    }
    cids(bestIdx)
  }
}

object VectorExpressions {
  /** Column-level entry point for the native dot product. */
  def dotNative(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Row-local argmax-cosine assignment against a bounded (cid, vector)
    * model; the model is sorted by cid here so the kernel's
    * ties-to-first rule IS the ties-to-lowest-cid rule.
    */
  def nearestCentroidNative(v: Column,
      model: Array[(Long, Array[Double])]): Column = {
    val sorted = model.sortBy(_._1)
    ExpressionUtils.column(NearestCentroid(ExpressionUtils.expression(v),
      sorted.map(_._1), sorted.map(_._2)))
  }

  /** Column-level entry point for the native L2-normalizer. */
  def unitNative(v: Column): Column =
    ExpressionUtils.column(UnitVector(ExpressionUtils.expression(v)))

  /** Column-level entry point for the native minhash signature. */
  def minhashNative(sh: Column, perms: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(sh), perms))

  /** Column-level entry point for the native shingle-hash kernel. */
  def shingleHashes(text: Column, n: Int): Column =
    ExpressionUtils.column(
      ShingleHashes(ExpressionUtils.expression(text), n))

  /** Positional (non-distinct) rolling k-gram hash sequence. */
  def rollingShingleHashes(text: Column, n: Int): Column =
    ExpressionUtils.column(
      ShingleHashes(ExpressionUtils.expression(text), n, distinct = false))

  /** Distinct gram hashes in ascending order (SortedIntersectCount's
    * precondition).
    */
  def sortedShingleHashes(text: Column, n: Int): Column =
    ExpressionUtils.column(
      ShingleHashes(ExpressionUtils.expression(text), n,
        distinct = true, sorted = true))

  /** Zero-allocation |a ∩ b| over sorted long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column-level entry point for the cross-engine md5 minhash. */
  def md5MinhashNative(grams: Column, perms: Int): Column =
    ExpressionUtils.column(
      Md5MinHashSignature(ExpressionUtils.expression(grams), perms))

  /** Column-level entry point for the md5 majority-vote signature. */
  def md5MajorityNative(grams: Column, bits: Int): Column =
    ExpressionUtils.column(
      Md5MajoritySignature(ExpressionUtils.expression(grams), bits))

  /** Column-level entry point for the hash-input minhash signature. */
  def minhashFromHashes(sh64: Column, perms: Int): Column =
    ExpressionUtils.column(
      MinHashSignatureFromHashes(ExpressionUtils.expression(sh64), perms))

  /** Column-level entry point for the native 64-bit simhash. */
  def simhash64(text: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(text)))

  /** Column-level entry point for the native winnowing kernel. */
  def winnowHashes(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(
      WinnowHashes(ExpressionUtils.expression(text), k, w))

  /** Column-level entry point for the cross-engine md5 winnowing. */
  def md5WinnowFp(grams: Column, w: Int): Column =
    ExpressionUtils.column(
      Md5WinnowFp(ExpressionUtils.expression(grams), w))
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
