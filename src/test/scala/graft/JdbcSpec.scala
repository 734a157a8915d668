package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Dialect, Jdbc}

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

  test("dialect quoting, defaults, and hash-split routing") {
    assert(Dialect.Mysql.quote("a b") === "`a b`")
    assert(Dialect.Postgres.quote("a") === "\"a\"")
    assert(Dialect.SqlServer.quote("a") === "[a]")
    assert(Dialect.byName("STARROCKS").quote("x") === "`x`")
    // reference defaults: fetchSize/batchSize 1024
    assert(Dialect.Mysql.readerOptions("u", "t")("fetchsize") === "1024")
    assert(Dialect.Postgres.writerOptions("u", "t")("batchsize") === "1024")
    // hash fallback routes to the dialect's function; ANSI dialects have none
    assert(Dialect.Doris.hashSplitPredicates("id", 4).get(1).startsWith("CRC32"))
    assert(Dialect.GaussDb.hashSplitPredicates("id", 4).get(0).contains("HASHTEXT"))
    assert(Dialect.Oracle.hashSplitPredicates("id", 4).isEmpty)
  }

  test("per-connection session statements map to sessionInitStatement") {
    // mysqlwriter `session` conf: statements run on each connection before
    // the write — Spark JDBC's sessionInitStatement is the exact analog
    val sess = Seq("SET SESSION sql_mode='ANSI'", "SET NAMES utf8mb4")
    val w = Dialect.Mysql.writerOptions("jdbc:mysql://h/db", "t", session = sess)
    assert(w("sessionInitStatement") === "SET SESSION sql_mode='ANSI'; SET NAMES utf8mb4")
    // Connector/J executes the init as ONE statement: a multi-statement
    // session list needs allowMultiQueries on the URL (the reference loops
    // statements one by one — mysql_writer.go session conf)
    assert(w("url") === "jdbc:mysql://h/db?allowMultiQueries=true")
    // existing query params are appended to, not clobbered; single
    // statements leave the URL alone; postgres never needs the flag
    assert(Dialect.Mysql.writerOptions("jdbc:mysql://h/db?useSSL=false", "t",
      session = sess)("url").endsWith("useSSL=false&allowMultiQueries=true"))
    assert(Dialect.Mysql.writerOptions("jdbc:mysql://h/db", "t",
      session = sess.take(1))("url") === "jdbc:mysql://h/db")
    val r = Dialect.Postgres.readerOptions("jdbc:postgresql://h/db", "t",
      session = Seq("SET search_path TO s", "SET statement_timeout=0"))
    assert(r("sessionInitStatement") === "SET search_path TO s; SET statement_timeout=0")
    assert(r("url") === "jdbc:postgresql://h/db")
    // absent by default — an empty option would still run a round trip
    assert(!Dialect.Mysql.writerOptions("u", "t").contains("sessionInitStatement"))
    // an explicit allowMultiQueries=false conflicts with a multi-statement
    // session list: fail fast, don't let every connection die at runtime
    intercept[IllegalArgumentException] {
      Dialect.Mysql.writerOptions("jdbc:mysql://h/db?allowMultiQueries=false", "t",
        session = sess)
    }
  }

  test("dialect upsert SQL: the 4 scenarios of common.go:556-616") {
    val cols = Seq("id", "name", "age")
    // scenario 1: no PK -> plain INSERT (both dialects)
    assert(Dialect.Mysql.upsertSql("t", cols, Nil) ===
      "INSERT INTO `t` (`id`, `name`, `age`) VALUES (?, ?, ?)")
    assert(Dialect.Postgres.upsertSql("t", cols, Nil) ===
      "INSERT INTO \"t\" (\"id\", \"name\", \"age\") VALUES (?, ?, ?)")
    // scenario 2: all columns are PKs -> skip-duplicates form
    assert(Dialect.Mysql.upsertSql("t", Seq("id", "code"), Seq("id", "code")) ===
      "INSERT IGNORE INTO `t` (`id`, `code`) VALUES (?, ?)")
    assert(Dialect.Postgres.upsertSql("t", Seq("id", "code"), Seq("id", "code")) ===
      "INSERT INTO \"t\" (\"id\", \"code\") VALUES (?, ?) ON CONFLICT (\"id\", \"code\") DO NOTHING")
    // scenario 3: PK + payload -> true upsert
    assert(Dialect.Mysql.upsertSql("t", cols, Seq("id")) ===
      "INSERT INTO `t` (`id`, `name`, `age`) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE `name` = VALUES(`name`), `age` = VALUES(`age`)")
    assert(Dialect.Postgres.upsertSql("t", cols, Seq("id")) ===
      "INSERT INTO \"t\" (\"id\", \"name\", \"age\") VALUES (?, ?, ?) " +
        "ON CONFLICT (\"id\") DO UPDATE SET \"name\" = EXCLUDED.\"name\", \"age\" = EXCLUDED.\"age\"")
    // scenario 4: other dialects -> plain INSERT regardless of keys
    assert(Dialect.Oracle.upsertSql("t", cols, Seq("id")) ===
      "INSERT INTO \"t\" (\"id\", \"name\", \"age\") VALUES (?, ?, ?)")
    assert(Dialect.ClickHouse.upsertSql("t", cols, Seq("id")) ===
      "INSERT INTO `t` (`id`, `name`, `age`) VALUES (?, ?, ?)")
    // replace mode: REPLACE INTO on mysql, upsert elsewhere
    assert(Dialect.Mysql.replaceSql("t", cols, Seq("id")) ===
      "REPLACE INTO `t` (`id`, `name`, `age`) VALUES (?, ?, ?)")
    assert(Dialect.Postgres.replaceSql("t", cols, Seq("id")) ===
      Dialect.Postgres.upsertSql("t", cols, Seq("id")))
    // multi-row batch placeholders (the batched flush shape)
    assert(Dialect.Mysql.upsertSql("t", Seq("id"), Nil, rows = 3) ===
      "INSERT INTO `t` (`id`) VALUES (?), (?), (?)")
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
