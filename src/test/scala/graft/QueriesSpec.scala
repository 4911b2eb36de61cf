package graft

/** Smoke-level checks on sf0.001 for every registered query: runs, has the
  * declared columns, and (where statically known) sane row counts. Value-
  * level correctness is covered by the DuckDB oracle (scripts/
  * check_oracle.py locally, driver CORRECTNESS gate in CI).
  */
class QueriesSpec extends SparkSpec {

  test("every registered query with an oracle has matching keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry flagship returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
      // Driver-comparator contract: the correctness gate sorts the output
      // frame in pandas, where array/struct/map cells are unhashable (the
      // r6 q127 failure class). Every oracled query must emit only
      // atomic columns; complex intermediates serialize (array_join) or
      // melt before the final select.
      if (SparkEntry.oracleSql.contains(name)) {
        import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
        val complex = df.schema.fields.filter(f => f.dataType match {
          case _: ArrayType | _: MapType | _: StructType => true
          case _ => false
        })
        assert(complex.isEmpty,
          s"$name is oracled but emits non-atomic columns: " +
            complex.map(f => s"${f.name}: ${f.dataType.simpleString}")
              .mkString(", "))
      }
    }
  }

  test("q01 watermark is a single row") {
    assert(SparkEntry.queries("q01_watermark_last_id")(spark, sfDir).count() == 1)
  }

  test("q05 semi and q06 anti are non-empty, bounded by customer count") {
    val semi = SparkEntry.queries("q05_semi_join")(spark, sfDir).count()
    val anti = SparkEntry.queries("q06_anti_join")(spark, sfDir).count()
    val all = graft.sources.Tables.customer(spark, sfDir).count()
    assert(semi > 0 && semi <= all)
    assert(anti > 0 && anti <= all)
  }

  test("q09 topk is sorted desc by value") {
    val vals = SparkEntry.queries("q09_topk")(spark, sfDir)
      .collect().map(_.getAs[Double]("value")).toSeq
    assert(vals == vals.sorted.reverse)
  }
}
