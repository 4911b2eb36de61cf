// Hosted inside the org.apache.spark.sql package tree because the
// expression-author surface (AbstractDataType, ExpressionUtils) is
// private[sql]; this is the standard extension point for native
// Catalyst expressions compiled against the Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encoder (Jégou et al. 2011, the FAISS `PQ`
  * codec): the vector is split into `m` contiguous subvectors and each
  * is replaced by the index of its nearest codeword (L2, ties to the
  * lowest index) in that subspace's codebook. Output is `m` small ints
  * — at m=8 that is 8 bytes of code per vector in place of dim×4 bytes
  * of float, the 32× memory compression that makes billion-vector ANN
  * fit a cluster's RAM.
  *
  * The codebook (m × ksub × dsub doubles) is a driver-trained model
  * carried into the expression as a reference object — the same
  * model-on-driver contract as the IVF coarse quantizer
  * ([[graft.operators.Similarity.ivfTopK]]). Encoding is row-local
  * inside whole-stage codegen: one corpus pass, no shuffle, no join.
  *
  * Null contract: a null element or a vector whose length ≠ m·dsub
  * yields null (same poisoning rule as [[DotProduct]]).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with ExpectsInputTypes {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode needs at least one codeword per subspace")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true // ragged/null-element inputs

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], codebooks)

  // the heavy loop lives in one static helper; generated code calls it
  // directly (no virtual Expression.eval dispatch), keeping the
  // surrounding operators inside whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("r")
      s"""
         |Object $r = org.apache.spark.sql.graft.PqEncode.compute($v, $cb);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncode = copy(child = newChild)
}

object PqEncode {
  /** Nearest-codeword code per subspace; null on ragged or null-element
    * input. Public + static so both the interpreted path and generated
    * code share one implementation, and pure-JVM property tests can
    * drive it without a session.
    */
  def compute(v: ArrayData, cb: Array[Array[Array[Double]]]): GenericArrayData = {
    val m = cb.length
    val dsub = cb(0)(0).length
    val n = v.numElements()
    if (n != m * dsub) return null
    val x = Array.ofDim[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      x(i) = v.getDouble(i)
      i += 1
    }
    val codes = Array.ofDim[Int](m)
    var b = 0
    while (b < m) {
      val book = cb(b)
      val off = b * dsub
      var best = 0
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val w = book(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = x(off + j) - w(j)
          d += t * t
          j += 1
        }
        if (d < bestDist) { bestDist = d; best = c } // ties → lowest c
        c += 1
      }
      codes(b) = best
      b += 1
    }
    new GenericArrayData(codes)
  }
}

/** Asymmetric-distance inner product (the ADC of IVFPQ): the UNQUANTIZED
  * query against a vector's PQ codes — score = Σ_b ⟨q_sub(b),
  * codeword_b(code_b)⟩. Exact given the codes (quantization error lives
  * entirely on the corpus side, the asymmetric trick that makes PQ
  * recall usable), row-local, codegen'd. At scale the per-query inner
  * loop is a table lookup: q_sub·codeword has only m × ksub distinct
  * values per query, precomputable; with literal-few queries the direct
  * dot is the same arithmetic.
  *
  * Null contract: null elements, a query whose length ≠ m·dsub, a code
  * array whose length ≠ m, or an out-of-range code yield null.
  */
case class PqAdc(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression with ExpectsInputTypes {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_adc needs at least one codeword per subspace")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(IntegerType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(q: Any, codes: Any): Any =
    PqAdc.compute(q.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, (q, codes) => {
      val r = ctx.freshName("r")
      s"""
         |Double $r = org.apache.spark.sql.graft.PqAdc.compute($q, $codes, $cb);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  /** Σ over subspaces of ⟨query subvector, coded codeword⟩; null on any
    * malformed input. Shared by eval, codegen, and the tests. The inner
    * dot accumulates into a per-subspace SUBTOTAL which is then added
    * to the running score — the same grouping a precomputed lookup
    * table produces, so [[PqLutScore]] is bit-identical to this by
    * construction (not merely within FP tolerance).
    */
  def compute(q: ArrayData, codes: ArrayData,
      cb: Array[Array[Array[Double]]]): java.lang.Double = {
    val m = cb.length
    val dsub = cb(0)(0).length
    if (q.numElements() != m * dsub || codes.numElements() != m) return null
    var acc = 0.0
    var b = 0
    while (b < m) {
      if (codes.isNullAt(b)) return null
      val c = codes.getInt(b)
      if (c < 0 || c >= cb(b).length) return null
      val w = cb(b)(c)
      val off = b * dsub
      var sub = 0.0
      var j = 0
      while (j < dsub) {
        if (q.isNullAt(off + j)) return null
        sub += q.getDouble(off + j) * w(j)
        j += 1
      }
      acc += sub
      b += 1
    }
    acc
  }
}

/** LUT-based ADC — the batch form FAISS actually executes: for a FIXED
  * query, ⟨q_sub(b), codeword⟩ has only m × ksub distinct values, so
  * the driver precomputes that table once per query and scoring a
  * vector collapses to m lookups + adds, independent of dim. With the
  * LUT carried as a reference object, the corpus pass needs neither
  * the query vector nor a join — scores for every broadcast-bounded
  * query emit from one row-local projection.
  *
  * Bit-identical to [[PqAdc]] (both sum per-subspace subtotals in
  * subspace order); PqSpec asserts the equivalence on the full query.
  */
case class PqLutScore(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression with ExpectsInputTypes {

  require(lut.nonEmpty, "pq_lut_score needs at least one subspace")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(codes: Any): Any =
    PqLutScore.compute(codes.asInstanceOf[ArrayData], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("pqLut", lut, "double[][]")
    nullSafeCodeGen(ctx, ev, codes => {
      val r = ctx.freshName("r")
      s"""
         |Double $r = org.apache.spark.sql.graft.PqLutScore.compute($codes, $l);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqLutScore = copy(child = newChild)
}

object PqLutScore {
  /** m lookups + adds; null on malformed codes. */
  def compute(codes: ArrayData, lut: Array[Array[Double]]): java.lang.Double = {
    val m = lut.length
    if (codes.numElements() != m) return null
    var acc = 0.0
    var b = 0
    while (b < m) {
      if (codes.isNullAt(b)) return null
      val c = codes.getInt(b)
      if (c < 0 || c >= lut(b).length) return null
      acc += lut(b)(c)
      b += 1
    }
    acc
  }

  /** The per-query table: lut[b][c] = ⟨q_sub(b), codebook[b][c]⟩, inner
    * dot left-to-right — the same subtotal [[PqAdc]] forms.
    */
  def buildLut(q: Array[Double],
      cb: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    val dsub = cb(0)(0).length
    Array.tabulate(cb.length) { b =>
      val off = b * dsub
      cb(b).map { w =>
        var s = 0.0; var j = 0
        while (j < dsub) { s += q(off + j) * w(j); j += 1 }
        s
      }
    }
  }
}

object PqExpressions {
  /** Column-level entry point for the native PQ encoder. */
  def pqEncodeNative(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(
      PqEncode(ExpressionUtils.expression(v), codebooks))

  /** Column-level entry point for the native ADC inner product. */
  def pqAdcNative(q: Column, codes: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    ExpressionUtils.column(PqAdc(ExpressionUtils.expression(q),
      ExpressionUtils.expression(codes), codebooks))

  /** Column-level entry point for LUT-based ADC scoring. */
  def pqLutNative(codes: Column, lut: Array[Array[Double]]): Column =
    ExpressionUtils.column(
      PqLutScore(ExpressionUtils.expression(codes), lut))
}
