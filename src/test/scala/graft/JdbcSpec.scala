package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Jdbc

/** Split-predicate generation for the JDBC source shapes (pure functions —
  * no database in the sandbox; the scan itself is Spark's native JDBC
  * source fed by these options/predicates).
  */
class JdbcSpec extends AnyFunSuite {

  test("range scan options carry the 4 partitioning keys") {
    val o = Jdbc.rangeScanOptions("jdbc:mysql://h/db", "t", "id", 1L, 100L, 8)
    assert(o("partitionColumn") === "id" && o("numPartitions") === "8")
    assert(o("lowerBound") === "1" && o("upperBound") === "100")
  }

  test("hash predicates partition the whole domain disjointly") {
    val my = Jdbc.hashPredicatesMysql("id", 4)
    assert(my.length === 4)
    assert(my(2) === "CRC32(`id`) % 4 = 2")
    val pg = Jdbc.hashPredicatesPostgres("id", 3)
    assert(pg(0) === "MOD(ABS(HASHTEXT(\"id\")), 3) = 0")
  }

  test("dictionary predicates: open ends, half-open middles, quote escaping") {
    val p = Jdbc.dictionaryPredicates("name", Seq("b", "m", "o'hara"))
    assert(p.head === "name < 'b'")
    assert(p(1) === "name >= 'b' AND name < 'm'")
    assert(p(2) === "name >= 'm' AND name < 'o''hara'")
    assert(p.last === "name >= 'o''hara'")
  }

  test("offset/limit slices cover exactly `total` rows, remainder first") {
    val c = Jdbc.offsetLimitClauses("id", 10L, 3)
    assert(c(0) === "ORDER BY id LIMIT 4 OFFSET 0")
    assert(c(1) === "ORDER BY id LIMIT 3 OFFSET 4")
    assert(c(2) === "ORDER BY id LIMIT 3 OFFSET 7")
  }

  test("partition predicates") {
    assert(Jdbc.partitionPredicates(Seq("p0", "p1")).toSeq ===
      Seq("PARTITION(p0)", "PARTITION(p1)"))
  }

  test("token ranges cover the whole signed 64-bit space without gaps") {
    val p = Jdbc.tokenRangePredicates("token(id)", 4)
    assert(p.length === 4)
    assert(p.head.startsWith("token(id) < "))
    assert(p.last.startsWith("token(id) >= "))
    // interior ranges chain: each lower bound equals the previous upper
    val bounds = p.flatMap("-?\\d+".r.findAllIn(_)).map(_.toLong)
    assert(bounds(0) === bounds(1)) // first upper == second lower
    assert(Jdbc.tokenRangePredicates("token(id)", 1).head === s"token(id) >= ${Long.MinValue}")
  }
}
