package graft.engine

import java.sql.{Connection, DriverManager, PreparedStatement}
import java.util.Properties

import org.apache.spark.sql.DataFrame

/** The reference's RDBMS writer task loop, Spark-shaped: one connection per
  * PARTITION (the analog of one task connection, `oracle_writer.go:344-420`),
  * session statements executed one-by-one on open (`executeSessionSql`),
  * the dialect's writeMode statement prepared ONCE, rows bound and executed
  * inside a per-batch transaction with commit at batch end and bounded
  * retry after rollback (`writeBatch` tx begin/exec/commit,
  * `mysql_writer.go:382-390` writeMode routing).
  *
  * Scale shape: no driver collects — every partition streams straight into
  * its own connection; `batchSize` bounds both memory and transaction size.
  * Primary keys for the upsert forms come from the conflict-column config
  * when given, else from `DatabaseMetaData.getPrimaryKeys` (the reference
  * reads PK info from the target's metadata, `common.go:556-616`).
  */
object JdbcExec {

  /** Driver-side statement runner for preSql/postSql phases
    * (`common.go:51-76,206-231`): one connection, statements in order.
    */
  def execStatements(url: String, props: Map[String, String], sqls: Seq[String]): Unit = {
    if (sqls.isEmpty) return
    val conn = connect(url, props)
    try {
      val st = conn.createStatement()
      try sqls.foreach(st.execute)
      finally st.close()
    } finally conn.close()
  }

  /** PK columns from target metadata. A `schema.table` qualifier splits
    * into getPrimaryKeys' schema argument (the pattern argument matches the
    * BARE name only), and unquoted identifiers retry in the case the engine
    * stores them (Oracle/Derby fold to upper, postgres to lower) — a miss
    * here silently degrades writeMode=update to plain INSERT.
    */
  def primaryKeys(conn: Connection, table: String): Seq[String] = {
    val (schema, bare) = table.lastIndexOf('.') match {
      case -1 => (null: String, table)
      case i => (table.substring(0, i), table.substring(i + 1))
    }
    def lookup(s: String, t: String): Seq[String] = {
      val rs = conn.getMetaData.getPrimaryKeys(null, s, t)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Short, String)]
      try {
        while (rs.next()) buf += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
      } finally rs.close()
      buf.sortBy(_._1).map(_._2).toSeq
    }
    val md = conn.getMetaData
    lazy val folded =
      if (md.storesUpperCaseIdentifiers())
        lookup(if (schema == null) null else schema.toUpperCase, bare.toUpperCase)
      else if (md.storesLowerCaseIdentifiers())
        lookup(if (schema == null) null else schema.toLowerCase, bare.toLowerCase)
      else Nil
    val exact = lookup(schema, bare)
    if (exact.nonEmpty) exact else folded
  }

  private def connect(url: String, props: Map[String, String]): Connection = {
    val p = new Properties()
    props.filter { case (k, v) => (k == "user" || k == "password") && v.nonEmpty }
      .foreach { case (k, v) => p.setProperty(k, v) }
    DriverManager.getConnection(url, p)
  }

  /** Write `df` through the dialect's writeMode statement. Returns rows
    * written. `columns` empty or `["*"]` ⇒ all DataFrame columns in order.
    */
  def write(
      df: DataFrame,
      dialect: Dialect,
      url: String,
      table: String,
      columns: Seq[String] = Nil,
      writeMode: String = "insert",
      batchSize: Int = 0,
      session: Seq[String] = Nil,
      props: Map[String, String] = Map.empty,
      conflictColumns: Seq[String] = Nil,
      retry: BatchedExec.RetryPolicy = BatchedExec.RetryPolicy()): Long = {
    dialect.validateWriteMode(writeMode)
    // `columns` names the TARGET's columns; record columns bind by POSITION
    // (the reference's `values[i] = record.GetColumn(i)`,
    // `oracle_writer.go:400-408`)
    val cols =
      if (columns.isEmpty || columns == Seq("*")) df.columns.toSeq
      else columns
    require(df.columns.length >= cols.length,
      s"input has ${df.columns.length} columns for ${cols.length} target columns")
    val bs = if (batchSize > 0) batchSize else dialect.defaultBatchSize
    val projected =
      if (df.columns.length == cols.length) df
      else df.selectExpr(df.columns.take(cols.length).map(c => s"`$c`").toSeq: _*)
    val written = projected.sparkSession.sparkContext.longAccumulator("jdbcRowsWritten")
    val retries = retry.retryTimes
    val sleep = retry.retrySleepMillis
    val dialectName = dialect.name
    projected.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val d = Dialect.byName(dialectName)
        val conn = connect(url, props)
        try {
          // session conf, one statement per execute like the reference loop
          if (session.nonEmpty) {
            val st = conn.createStatement()
            try session.foreach(st.execute)
            finally st.close()
          }
          val pks =
            if (writeMode == "insert") Nil
            else if (conflictColumns.nonEmpty) conflictColumns
            else primaryKeys(conn, table)
          val sql = writeMode match {
            case "replace" => d.replaceSql(table, cols, pks)
            case "update" => d.upsertSql(table, cols, pks)
            case _ => d.upsertSql(table, cols, Nil) // plain INSERT
          }
          val stmt = conn.prepareStatement(sql)
          try {
            conn.setAutoCommit(false)
            it.grouped(bs).foreach { batch =>
              var attempt = 0
              var done = false
              var last: Throwable = null
              while (!done && attempt <= retries) {
                if (attempt > 0 && sleep > 0) Thread.sleep(sleep)
                try {
                  // JDBC batch protocol: one driver round trip per batch,
                  // not per row (the reference's batched StartWrite shape)
                  stmt.clearBatch()
                  batch.foreach { row =>
                    var i = 0
                    while (i < cols.length) {
                      stmt.setObject(i + 1, row.get(i))
                      i += 1
                    }
                    stmt.addBatch()
                  }
                  stmt.executeBatch()
                  conn.commit()
                  written.add(batch.length)
                  done = true
                } catch {
                  case e: Throwable =>
                    try conn.rollback() catch { case _: Throwable => () }
                    last = e; attempt += 1
                }
              }
              if (!done) throw new BatchedExec.BatchFailed(retries + 1, last)
            }
          } finally stmt.close()
        } finally conn.close()
      }
    }
    written.value
  }
}
