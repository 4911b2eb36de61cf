package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality diagnostic: prints the formatted physical plan for one
  * or all registered queries. Used to audit that filters reach the scan
  * (PushedFilters), projections prune (ReadSchema), dimension joins
  * broadcast, and expressions stay inside WholeStageCodegen.
  *
  * Usage: runMain graft.Plans [queryName] [sfDir]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val name = args.headOption
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val targets = name match {
      case Some(n) => Seq(n -> SparkEntry.queries(n))
      case None    => SparkEntry.queries.toSeq.sortBy(_._1)
    }
    targets.foreach { case (n, fn) =>
      println(s"\n========== $n ==========")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"plan failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
