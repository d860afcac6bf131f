package graft.streaming

/** Portable "CREATE INDEX IF NOT EXISTS" for the JDBC sinks
  * ([[QueryableState]] key index, [[ExactlyOnceJdbc]] scrub index) —
  * both call this every micro-batch/epoch, so a false "index missing"
  * answer must never turn into a hard failure.
  *
  * Why not a plain metadata lookup: `DatabaseMetaData.getIndexInfo`
  * matches the STORED identifier, and which case an unquoted name is
  * stored under varies by engine (Derby upper-folds, Postgres
  * lower-folds); a single-fold probe on the wrong engine misses
  * forever, re-issues CREATE INDEX each epoch, and permanently fails
  * the sink from the second epoch on (round-10 advice). The probe
  * here tries every fold AND splits a schema-qualified table into
  * (schema, table) for the lookup — and even then the CREATE is the
  * authority: a duplicate-object failure (concurrent creator, or a
  * metadata dialect these folds still miss) re-probes and checks the
  * duplicate SQLStates before declaring a real error.
  */
private[streaming] object JdbcIndexes {

  /** Duplicate-object SQLStates: Derby X0Y32, Postgres 42P07,
    * SQL-standard-ish 42S11 (MySQL/MSSQL dialects). */
  private val duplicateStates = Set("X0Y32", "42P07", "42S11")

  /** Bare (unqualified) table name — index names derive from it, so a
    * schema-qualified `analytics.kv` yields a valid `kv_KIDX`. */
  private[streaming] def bareTable(table: String): String =
    table.substring(table.lastIndexOf('.') + 1)

  private def schemaSplit(table: String): (String, String) =
    table.lastIndexOf('.') match {
      case -1 => (null, table)
      case i  => (table.substring(0, i), table.substring(i + 1))
    }

  private val folds: Seq[String => String] =
    Seq(identity, _.toUpperCase, _.toLowerCase)

  /** Does `table` exist? Same multi-fold, schema-split probe as the
    * index lookup — [[ExactlyOnceJdbc]] gates its batch_id scrub on
    * this, and a false negative there silently skips the scrub and
    * voids the exactly-once guarantee on lower-folding engines or
    * schema-qualified sinks. */
  private[streaming] def tableExists(conn: java.sql.Connection,
      table: String): Boolean = {
    val (schema, bare) = schemaSplit(table)
    folds.exists { f =>
      val rs = conn.getMetaData.getTables(
        null, if (schema == null) null else f(schema), f(bare), null)
      try rs.next() finally rs.close()
    }
  }

  private def exists(conn: java.sql.Connection, table: String,
      indexName: String): Boolean = {
    val (schema, bare) = schemaSplit(table)
    folds.exists { f =>
      val rs = conn.getMetaData.getIndexInfo(
        null, if (schema == null) null else f(schema), f(bare), false, false)
      try {
        var has = false
        while (rs.next() && !has)
          has = indexName.equalsIgnoreCase(rs.getString("INDEX_NAME"))
        has
      } finally rs.close()
    }
  }

  /** Ensure `CREATE INDEX <bare>_<suffix> ON <table> (<colSql>)`
    * holds; `colSql` is the caller's already-quoted column list.
    * Returns the index name. Idempotent and replay-safe. */
  def ensure(url: String, table: String, suffix: String, colSql: String,
      props: java.util.Properties): String = {
    val name = s"${bareTable(table)}_$suffix"
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      if (!exists(conn, table, name)) {
        val st = conn.createStatement()
        try st.executeUpdate(s"CREATE INDEX $name ON $table ($colSql)")
        catch {
          case e: java.sql.SQLException
              if duplicateStates.contains(e.getSQLState)
                || exists(conn, table, name) => ()
        }
        finally st.close()
      }
      name
    } finally conn.close()
  }
}
