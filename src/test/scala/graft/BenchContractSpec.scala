package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench protocol invariants — cheap guards against the artifact
  * regressions that cost rounds 2 and 3 their parsed bench line.
  */
class BenchContractSpec extends AnyFunSuite {

  test("every graded query belongs to a bench family") {
    val fam = Bench.familyOf
    val missing = SparkEntry.specs.map(_.name).filterNot(fam.contains)
    assert(missing.isEmpty, s"unattributed queries: $missing")
  }

  test("every headline name is a real query") {
    val names = SparkEntry.specs.map(_.name).toSet
    val ghosts = Bench.headline.filterNot(names)
    assert(ghosts.isEmpty, s"headline references missing queries: $ghosts")
  }

  test("query names are unique and oracle keys match query keys") {
    val names = SparkEntry.specs.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }
}
