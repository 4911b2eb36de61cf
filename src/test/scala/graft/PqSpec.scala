package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Similarity

/** Behavioral tests for the PQ-flat ANN path (q99): codebook training,
  * the codegen'd encode/ADC kernels inside a real plan, and recall on a
  * corpus with planted cluster structure.
  */
class PqSpec extends SparkSpec {

  /** 40 vectors in 8 dims, 4 prototypes (one-hot at dims 0/2/4/6) with
    * tiny per-row perturbations; vec_ids 0-3 hit all four prototypes, so
    * the first-ksub seeding sees every cluster.
    */
  private lazy val planted = {
    val rows = (0 until 40).map { i =>
      val p = i % 4
      val v = Array.ofDim[Double](8)
      v(2 * p) = 1.0
      v(2 * p + 1) = 0.01 * (i / 4)
      val n = math.sqrt(v.map(x => x * x).sum)
      Row(i.toLong, v.map(_ / n).toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("v", ArrayType(DoubleType), nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("planted prototypes: every PQ neighbor shares the query's cluster") {
    val out = Similarity.pqTopKDf(planted, k = 5, m = 2, ksub = 4,
      iters = 3, trainMod = 1, nQueries = 4).collect()
    assert(out.length == 4 * 5)
    out.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val n = r.getAs[Long]("neighbor")
      assert(n % 4 == q % 4,
        s"neighbor $n of query $q crossed prototype boundaries")
    }
  }

  test("ADC ranking is internally consistent (desc scores, ranks 1..k)") {
    val rows = Similarity.pqTopK(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length))
      val adc = sorted.map(_.getAs[Double]("adc")).toSeq
      assert(adc.zip(adc.tail).forall { case (a, b) => a >= b },
        s"ADC scores for query $q not descending: $adc")
      assert(!rs.exists(_.getAs[Long]("neighbor") == q), "self-pair")
    }
  }

  test("PQ run is deterministic (model, codes, and ranking)") {
    val a = Similarity.pqTopK(spark, sfDir).collect().toSeq
    val b = Similarity.pqTopK(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("codes stay within [0, ksub) and compress to m ints") {
    import org.apache.spark.sql.graft.PqExpressions
    val emb = Similarity.unitVectors(spark, sfDir)
      .select(col("vec_id"), col("v"))
    val sample = emb.collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
    val cb = Similarity.trainPqCodebooks(sample, m = 8, ksub = 16, iters = 2)
    val codes = emb
      .select(PqExpressions.pqEncodeNative(col("v"), cb).as("codes"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.nonEmpty)
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
  }

  test("IVFPQ with nprobe = nlist reproduces PQ-flat exactly") {
    val flat = Similarity.pqTopK(spark, sfDir).collect().toSeq
    val full = Similarity.ivfPqTopK(spark, sfDir, nprobe = 8).collect().toSeq
    assert(full == flat)
  }

  test("IVFPQ partial probe: valid ranks, descending ADC, no self-pairs") {
    val rows = Similarity.ivfPqTopK(spark, sfDir, nprobe = 3).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length))
      val adc = sorted.map(_.getAs[Double]("adc")).toSeq
      assert(adc.zip(adc.tail).forall { case (a, b) => a >= b })
      assert(!rs.exists(_.getAs[Long]("neighbor") == q))
    }
  }

  test("IVFPQ on planted prototypes keeps neighbors inside the cluster") {
    val out = Similarity.ivfPqTopKDf(planted, k = 5, nlist = 4,
      nprobe = 1, m = 2, ksub = 4, iters = 3, trainMod = 1,
      nQueries = 4).collect()
    assert(out.length == 4 * 5)
    out.foreach { r =>
      assert(r.getAs[Long]("neighbor") % 4 == r.getAs[Long]("q_id") % 4)
    }
  }

  test("LUT scoring path is bit-identical to PqAdc (full output equality)") {
    val adc = Similarity.pqTopK(spark, sfDir).collect().toSeq
    val lut = Similarity.pqTopKLut(spark, sfDir).collect().toSeq
    assert(lut == adc)
  }

  test("LUT plan is joinless: one corpus projection, one ranking window") {
    val plan = Similarity.pqTopKLut(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"LUT path must not join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert("\\bWindow\\b".r.findAllIn(plan).length <= 1)
  }

  test("PqLutScore.compute == buildLut + PqAdc on random cases") {
    import org.apache.spark.sql.graft.{PqAdc, PqEncode, PqLutScore}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val m = 1 + rnd.nextInt(3); val dsub = 1 + rnd.nextInt(3)
      val ksub = 1 + rnd.nextInt(4)
      val cb = Array.fill(m, ksub, dsub)(rnd.nextDouble() * 2 - 1)
      val v = Array.fill(m * dsub)(rnd.nextDouble() * 2 - 1)
      val q = Array.fill(m * dsub)(rnd.nextDouble() * 2 - 1)
      val codes = PqEncode.compute(new GenericArrayData(v), cb)
      val viaAdc = PqAdc.compute(new GenericArrayData(q), codes, cb)
      val viaLut = PqLutScore.compute(codes, PqLutScore.buildLut(q, cb))
      assert(viaAdc == viaLut, "ADC and LUT must agree bit-for-bit")
    }
  }

  test("trainPqCodebooks: deterministic shape, exact recovery of planted prototypes") {
    // 4 prototypes per subspace, each repeated with zero noise: Lloyd
    // must return exactly the prototype means after any iterations
    val protos = Array(
      Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0), Array(0.0, -1.0))
    val sample = (0 until 40).map { i =>
      val p = protos(i % 4)
      Array(p(0), p(1), p(1), p(0)) // two subspaces, prototype-linked
    }.toArray
    val cb = Similarity.trainPqCodebooks(sample, m = 2, ksub = 4, iters = 3)
    assert(cb.length == 2 && cb.forall(_.length == 4) &&
      cb.forall(_.forall(_.length == 2)))
    val cb2 = Similarity.trainPqCodebooks(sample, m = 2, ksub = 4, iters = 3)
    assert(cb.map(_.toSeq.map(_.toSeq)).toSeq ==
      cb2.map(_.toSeq.map(_.toSeq)).toSeq, "training must be deterministic")
    // every codeword equals one of the planted prototypes (exact doubles)
    val protoSet = protos.map(_.toSeq).toSet
    cb(0).foreach(w => assert(protoSet.contains(w.toSeq)))
    // ksub larger than the sample degrades gracefully
    val small = Similarity.trainPqCodebooks(sample.take(3), m = 2,
      ksub = 16, iters = 2)
    assert(small.forall(_.length == 3))
  }

  test("PQ recall@5 vs brute force clears the flat-codec floor") {
    val bf = Similarity.bruteForceTopK(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor")).toSet }
    val pq = Similarity.pqTopK(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor")).toSet }
    val recalls = bf.map { case (q, truth) =>
      pq.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean recall@5 $mean below the codec floor")
  }

  test("training sample is a constant size, indifferent to corpus rows beyond the cap") {
    // the structural FAISS bound: exactly maxTrain rows collected from
    // a large corpus, and every row at or beyond trainMod·maxTrain —
    // here poisoned with huge values that would wreck Lloyd if seen —
    // leaves the sample byte-identical
    val trainMod = 4; val maxTrain = 64
    val cap = trainMod.toLong * maxTrain // 256
    def corpus(n: Long, poison: Boolean) =
      spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(3)), j =>
          when(lit(poison) && col("id") >= cap, lit(1e9))
            .otherwise((col("id") % 7 + j).cast("double"))).as("v"))
    val capped = Similarity.boundedTrainingSample(
      corpus(cap, poison = false), trainMod, maxTrain)
    val huge = Similarity.boundedTrainingSample(
      corpus(50000, poison = true), trainMod, maxTrain)
    assert(capped.length == maxTrain)
    assert(huge.length == maxTrain,
      s"sample grew with the corpus: ${huge.length}")
    assert(huge.map(_.toSeq).toSeq == capped.map(_.toSeq).toSeq,
      "rows beyond the cap leaked into the training sample")
  }
}
