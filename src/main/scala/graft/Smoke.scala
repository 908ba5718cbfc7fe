package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc local smoke runner: runs the flagship entry + every catalog query
  * at a small SF and prints row counts (and optionally plans). Not part of
  * the driver contract. Usage: runMain graft.Smoke [sfDir] [--explain q01] */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.001")
    val explain = args.sliding(2).collectFirst {
      case Array("--explain", q) => q
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = SparkEntry.entry(spark)
    println(s"[smoke] entry rows=${e.count()}")
    e.show(5, truncate = false)

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        if (explain.contains(name)) df.explain("formatted")
        val t0 = System.nanoTime()
        val n = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[smoke] $name%-28s rows=$n%-8d ${dt}%.2fs")
      } catch {
        case e: Throwable =>
          println(s"[smoke] $name FAILED: ${e.getMessage}")
          e.printStackTrace()
      }
    }
    spark.stop()
  }
}
