package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import scala.collection.mutable

/** Optimization-round measurement harness (guide §1): run selected
  * registry queries and break their wall-clock into SPARK JOBS — id,
  * description (callSite short form), duration — so the expensive
  * action inside a multi-action query (bootstrap write, localCheckpoint,
  * collect, serve) is visible instead of one opaque per-query number.
  * Also reports the gap between summed job time and the query's wall
  * time (driver-side planning / non-job work).
  *
  * `sbt "runMain graft.bench.PhaseProfile <sfDir> <q1,q2,...> [reps]"`
  */
object PhaseProfile {

  final case class JobRow(id: Int, desc: String, sec: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("q210_maxsim_slot_served"))
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Sessions.local(cpus)
    // warmup like Bench: codegen/classload lands here
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val starts = mutable.Map.empty[Int, (Long, String)]
    val rows = mutable.ArrayBuffer.empty[JobRow]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .getOrElse(Option(js.properties.getProperty("callSite.short"))
              .getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, d) =>
          rows += JobRow(je.jobId, d, (System.nanoTime() - t0) / 1e9)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to reps).foreach { rep =>
        rows.clear()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch {
          case e: Throwable => println(s"[$n] FAILED: ${e.getMessage}")
        }
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        // listener events are async; give the bus a moment to drain
        Thread.sleep(300)
        val snap = rows.toVector
        val jobSum = snap.map(_.sec).sum
        println(f"\n===== $n rep$rep wall=$wall%.2fs jobs=${snap.size} " +
          f"jobSum=$jobSum%.2fs driverGap=${wall - jobSum}%.2fs =====")
        snap.groupBy(_.desc).toSeq
          .map { case (d, rs) => (d, rs.size, rs.map(_.sec).sum) }
          .sortBy(-_._3)
          .foreach { case (d, cnt, sec) =>
            println(f"  phase $sec%7.3fs  n=$cnt%3d  ${d.take(90)}")
          }
        snap.sortBy(-_.sec).take(12).foreach { r =>
          println(f"  job ${r.id}%4d ${r.sec}%7.3fs  ${r.desc.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
