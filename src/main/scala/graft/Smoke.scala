package graft

/** Local analog of the driver's t1 smoke: run SparkEntry.entry on
  * sf0.001 and print the row count (must be > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"SMOKE rows=$n")
    spark.stop()
  }
}
