package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract sanity: entry smoke + queries/oracle wiring at sf0.001. */
class SparkEntrySpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries execute and are non-empty at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    // j3 can legitimately be empty at the tiniest sf; everything else must
    // produce rows.
    assert(empty.filterNot(_ == "j3_anti_join").isEmpty,
      s"empty results: $empty")
  }
}
