package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Contract guard for the driver registry: every query must run at the
  * smallest scale factor and keep the naming invariants the driver's
  * hash-compare depends on. Catches breakage before the driver does. */
class RegistrySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("every oracle key has a query") {
    val orphans = Registry.oracleSql.keySet -- Registry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every registered query runs at sf0.001 with sane column names") {
    val failures = Registry.all.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try {
        val df = q.fn(spark, sfDir)
        val cols = df.columns.toSeq
        val bad =
          if (cols.isEmpty) Some("no columns")
          else if (cols.distinct.size != cols.size) Some(s"duplicate columns: $cols")
          else if (cols.exists(c => c != c.toLowerCase)) Some(s"non-lowercase columns: $cols")
          else {
            df.count() // force full execution
            None
          }
        bad.map(name -> _)
      } catch { case e: Throwable => Some(name -> s"threw ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
