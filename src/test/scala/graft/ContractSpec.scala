package graft

import graft.queries.Registry
import org.scalatest.funsuite.AnyFunSuite

/** Registry/driver-contract guardrails: the invariants the DuckDB gate
  * silently depends on.
  */
class ContractSpec extends AnyFunSuite {

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every oracle totally orders its output (ORDER BY present)") {
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).foreach { case (n, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY"), s"$n oracle lacks ORDER BY")
    }
  }

  test("oracle keys are a subset of query keys, with the expected counts") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size == 302)
    assert(SparkEntry.oracleSql.size == 302)
  }

  test("no oracle uses bare round(x, 6) — engines tie-break differently") {
    Registry.all.flatMap(_.oracle).foreach { sql =>
      assert(!sql.matches("(?s).*round\\([^)]*, *6\\).*"), "use OracleSql.r6")
    }
  }
}
