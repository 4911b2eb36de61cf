package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.functions.TextAnalytics
import graft.operators.Dedup

/** The distributed min-label-propagation CC must agree exactly with a
  * driver-side union-find over the same duplicate edges.
  */
class DedupClusterSpec extends SparkSpec {

  test("dup clusters equal driver union-find (exact + fingerprint edges)") {
    val docs = sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(col("text").cast("binary")).as("h1"),
        TextAnalytics.fingerprint(col("text")).as("h2"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    // union-find with path compression
    val parent = mutable.Map(docs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    docs.groupBy(_._2).values.foreach { g =>
      val m = g.map(_._1).min; g.foreach(d => union(m, d._1))
    }
    docs.groupBy(_._3).values.foreach { g =>
      val m = g.map(_._1).min; g.foreach(d => union(m, d._1))
    }
    // component label = min member id (find-root after min-unions = min)
    val expected = docs.map(d => d._1 -> find(d._1)).toMap
    val sizes = expected.values.groupBy(identity).map { case (k, v) => k -> v.size }

    val got = Dedup.dupClusters(spark, sfDir).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("cluster") == expected(id),
        s"doc $id: cluster ${r.getAs[Long]("cluster")} vs union-find ${expected(id)}")
      assert(r.getAs[Long]("n_members") == sizes(expected(id)).toLong)
    }
    // sanity: the corpus actually contains at least one non-trivial cluster
    assert(sizes.values.exists(_ > 1), "test corpus should contain duplicates")
  }
}
