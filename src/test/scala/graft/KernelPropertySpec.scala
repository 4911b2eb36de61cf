package graft

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{ShingleHashes, SimHash64, SortedIntersectCount, WinnowHashes}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property tests for the native kernels against independent
  * reference implementations — no Spark session, so thousands of cases
  * run in milliseconds. The references re-derive the semantics from
  * the HOF contracts: regex-split tokens, sliding-window grams hashed
  * with the xxhash64 builtin's call, brute-force window minima, and
  * set-intersection counts.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val token = Gen.choose(1, 4)
    .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val ws = Gen.oneOf(" ", "  ", "\t", "\n", "\f", "\r", " \t ")
  private val text: Gen[String] = for {
    toks <- Gen.listOf(token)
    seps <- Gen.listOfN(math.max(toks.size + 1, 1), ws)
  } yield seps.head + toks.zip(seps.tail).map { case (t, s) => t + s }.mkString

  private def refTokens(s: String): Seq[String] =
    s.split("\\s+").toSeq.filter(_.nonEmpty)

  private def refGramHashes(s: String, n: Int): Seq[Long] =
    refTokens(s).sliding(n).filter(_.size == n).map { g =>
      val u = UTF8String.fromString(g.mkString(" "))
      XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
    }.toSeq

  test("ShingleHashes positional mode == sliding-window reference") {
    check(Prop.forAll(text, Gen.choose(1, 4)) { (s, n) =>
      val got = ShingleHashes
        .compute(UTF8String.fromString(s), n, distinct = false).toLongArray()
      got.toSeq == refGramHashes(s, n)
    })
  }

  test("ShingleHashes distinct mode == first-occurrence distinct reference") {
    check(Prop.forAll(text) { s =>
      val got = ShingleHashes
        .compute(UTF8String.fromString(s), 3, distinct = true).toLongArray()
      got.toSeq == refGramHashes(s, 3).distinct
    })
  }

  test("ShingleHashes sorted mode == sorted distinct reference") {
    check(Prop.forAll(text) { s =>
      val got = ShingleHashes
        .compute(UTF8String.fromString(s), 3, distinct = true, sorted = true)
        .toLongArray()
      got.toSeq == refGramHashes(s, 3).distinct.sorted
    })
  }

  test("WinnowHashes == brute-force window minima") {
    check(Prop.forAll(text, Gen.choose(1, 6)) { (s, w) =>
      val h = refGramHashes(s, 3)
      val expected =
        if (h.isEmpty) Seq.empty[Long]
        else if (h.size < w) Seq(h.min)
        else h.sliding(w).filter(_.size == w).map(_.min).toSeq.distinct
      val got = WinnowHashes
        .compute(UTF8String.fromString(s), 3, w).toLongArray()
      got.toSeq == expected
    })
  }

  test("SortedIntersectCount == set intersection size on sorted arrays") {
    val longs = Gen.listOf(Gen.choose(-50L, 50L)) // small domain → overlaps
    check(Prop.forAll(longs, longs) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val got = SortedIntersectCount.compute(
        new GenericArrayData(sa.toArray), new GenericArrayData(sb.toArray))
      got == (sa.toSet intersect sb.toSet).size
    })
  }

  test("SortedIntersectCount tolerates duplicate values (still set count)") {
    val longs = Gen.listOf(Gen.choose(-10L, 10L))
    check(Prop.forAll(longs, longs) { (a, b) =>
      val sa = a.sorted // sorted but NOT distinct
      val sb = b.sorted
      val got = SortedIntersectCount.compute(
        new GenericArrayData(sa.toArray), new GenericArrayData(sb.toArray))
      got == (sa.toSet intersect sb.toSet).size
    })
  }

  test("SlotFoldAggregator: any partitioning + merge order gives one result") {
    import graft.functions.{SlotFoldAggregator => A, SlotFoldInput}
    val toks = Gen.choose(0, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("111-0001", "111-0002", "222-9999",
        "333-1234", "444-5678", "555-0000")))
    val inputs = Gen.listOf(toks).map(_.zipWithIndex.map {
      // distinct seq per row — ties would make arrival order, and thus
      // the fold, genuinely ambiguous (the real extractor emits one
      // row per event with a unique event seq)
      case (ts, i) => SlotFoldInput(1L, i.toLong, ts)
    })
    check(Prop.forAll(inputs, Gen.choose(0L, Long.MaxValue)) { (in, seed) =>
      val rnd = new scala.util.Random(seed)
      val direct = A.finish(in.foldLeft(A.zero)(A.reduce))
      val shuffled = rnd.shuffle(in)
      val k = 1 + rnd.nextInt(4)
      val parts = if (shuffled.isEmpty) List(Nil)
        else shuffled.grouped(math.max(1, shuffled.size / k)).toList
      val bufs = parts.map(_.foldLeft(A.zero)(A.reduce))
      val leftFold = bufs.foldLeft(A.zero)(A.merge)
      val rightFold = bufs.foldRight(A.zero)((b, acc) => A.merge(acc, b))
      A.finish(leftFold) == direct && A.finish(rightFold) == direct
    })
  }

  private val pqGeom = for {
    m <- Gen.choose(1, 3)
    dsub <- Gen.choose(1, 3)
    ksub <- Gen.choose(1, 4)
  } yield (m, dsub, ksub)
  private val unitD = Gen.choose(-1000, 1000).map(_ / 1000.0)
  private def pqBooks(m: Int, dsub: Int, ksub: Int) =
    Gen.listOfN(m * ksub * dsub, unitD).map(_.toArray
      .grouped(dsub).toArray.grouped(ksub).toArray)

  test("PqEncode == brute-force argmin-L2 reference (ties to lowest)") {
    import org.apache.spark.sql.graft.PqEncode
    val cases = for {
      (m, dsub, ksub) <- pqGeom
      cb <- pqBooks(m, dsub, ksub)
      v <- Gen.listOfN(m * dsub, unitD)
    } yield (cb, v)
    check(Prop.forAll(cases) { case (cb, v) =>
      val expected = cb.zipWithIndex.map { case (book, b) =>
        val sub = v.slice(b * book(0).length, (b + 1) * book(0).length)
        book.zipWithIndex.map { case (w, c) =>
          (w.zip(sub).map { case (a, x) => (x - a) * (x - a) }.sum, c)
        }.minBy { case (d, c) => (d, c) }._2
      }.toSeq
      val got = PqEncode.compute(
        new GenericArrayData(v.toArray), cb).toIntArray().toSeq
      got == expected
    })
  }

  test("PqAdc == per-subspace dot of decoded codewords") {
    import org.apache.spark.sql.graft.{PqAdc, PqEncode}
    val cases = for {
      (m, dsub, ksub) <- pqGeom
      cb <- pqBooks(m, dsub, ksub)
      v <- Gen.listOfN(m * dsub, unitD)
      q <- Gen.listOfN(m * dsub, unitD)
    } yield (cb, v, q)
    check(Prop.forAll(cases) { case (cb, v, q) =>
      val codes = PqEncode.compute(new GenericArrayData(v.toArray), cb)
      val expected = cb.zipWithIndex.map { case (book, b) =>
        val dsub = book(0).length
        val w = book(codes.getInt(b))
        (0 until dsub).map(j => q(b * dsub + j) * w(j)).sum
      }.sum
      val got = PqAdc.compute(
        new GenericArrayData(q.toArray), codes, cb)
      math.abs(got - expected) < 1e-12
    })
  }

  test("PQ kernels poison malformed input to null, never throw") {
    import org.apache.spark.sql.graft.{PqAdc, PqEncode}
    val cb = Array(Array(Array(1.0, 0.0), Array(0.0, 1.0))) // m=1, dsub=2
    assert(PqEncode.compute(new GenericArrayData(Array(1.0)), cb) == null)
    assert(PqEncode.compute(
      new GenericArrayData(Array[Any](1.0, null)), cb) == null)
    assert(PqAdc.compute(new GenericArrayData(Array(1.0)),
      new GenericArrayData(Array(0)), cb) == null)
    assert(PqAdc.compute(new GenericArrayData(Array(1.0, 0.0)),
      new GenericArrayData(Array(5)), cb) == null) // out-of-range code
    assert(PqAdc.compute(new GenericArrayData(Array(1.0, 0.0)),
      new GenericArrayData(Array[Any](null)), cb) == null)
  }

  test("resizeFeatures partitions every index, in order, conserving mass") {
    import graft.operators.Multimodal
    val feats = Gen.listOf(Gen.choose(0, 2550).map(_ / 10.0))
    check(Prop.forAll(feats, Gen.choose(1, 12)) { (xs, target) =>
      val out = Multimodal.resizeFeatures(xs, target)
      val buckets = out.map(_._1)
      val sizes = xs.indices.groupBy(i =>
        math.min(i.toLong * target / math.max(xs.length, 1), target - 1L).toInt)
      // ordered, in-range, one row per non-empty bucket
      buckets == buckets.sorted && buckets.forall(b => b >= 0 && b < target) &&
      buckets.toSet == sizes.keySet &&
      // bucket means weighted by bucket size reconstruct the total sum
      math.abs(out.map { case (b, m) => m * sizes(b).size }.sum - xs.sum) < 1e-6
    })
  }

  test("Md5MajoritySignature == hex-nibble-decode reference") {
    import org.apache.spark.sql.graft.Md5MajoritySignature
    check(Prop.forAll(Gen.listOf(token), Gen.choose(1, 128)) { (grams, bits) =>
      val got = Option(Md5MajoritySignature.compute(
        new GenericArrayData(grams.map(UTF8String.fromString).toArray),
        bits)).map(_.toString)
      if (grams.isEmpty) got.isEmpty
      else {
        // the oracle/HOF decode: nibble = hex char at b/4, then
        // floor(nibble / [8,4,2,1][b%4]) % 2
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexes = grams.map(g => md.digest(
          g.getBytes("UTF-8")).map("%02x".format(_)).mkString)
        val expected = (0 until bits).map { b =>
          val ones = hexes.count { h =>
            val nib = Integer.parseInt(h.charAt(b / 4).toString, 16)
            (nib / Seq(8, 4, 2, 1)(b % 4)) % 2 == 1
          }
          if (2 * ones >= grams.size) '1' else '0'
        }.mkString
        got.contains(expected)
      }
    })
  }

  test("SimHash64 == per-bit majority reference") {
    check(Prop.forAll(text) { s =>
      val hs = refTokens(s).map { t =>
        val u = UTF8String.fromString(t)
        XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
      }
      val got = Option(SimHash64.compute(UTF8String.fromString(s)))
      if (hs.isEmpty) got.isEmpty
      else {
        val expected = (0 until 64).foldLeft(0L) { (acc, b) =>
          val ones = hs.count(h => ((h >>> b) & 1L) == 1L)
          if (2 * ones >= hs.size) acc | (1L << b) else acc
        }
        got.contains(expected)
      }
    })
  }
}
