package graft.sources

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}

/** JDBC dialect for HiveServer2-protocol endpoints (`jdbc:hive2:` — a
  * Hive server or Spark's own Thrift server). This is the second LIVE
  * engine behind the JdbcSource seam (Derby is the first), and it is
  * exactly where the seam earns its keep: both HiveQL and Spark SQL
  * treat double-quoted tokens as STRING LITERALS, so Spark's default
  * `"col"` identifier quoting silently turns a pruned projection into
  * a constant — `SELECT "date" FROM t` returns the literal 'date' for
  * every row. Backtick quoting is the engines' identifier syntax; the
  * reference handles the same divergence with per-engine adapters
  * (dbsurveyor-core/src/adapters/), here it is one dialect object.
  *
  * Registration is idempotent and lazy: JdbcSource registers the
  * dialect the first time it sees a hive2 URL, so non-Hive deployments
  * never observe it.
  */
object HiveDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:hive2:")

  override def quoteIdentifier(colName: String): String =
    "`" + colName.replace("`", "``") + "`"

  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)
  def register(): Unit =
    if (registered.compareAndSet(false, true)) JdbcDialects.registerDialect(this)
}
