package org.apache.spark.sql.hive.thriftserver

import org.apache.spark.sql.SQLContext
import org.apache.hive.service.server.HiveServer2

/** Test-only accessor: `HiveThriftServer2` is `private[hive]`, but the
  * returned server IS the public Java `HiveServer2` (getServices/stop),
  * which is all HiveCollectSpec needs. Same-package test shims are the
  * standard way Spark's own test code reaches these internals.
  */
object GraftThriftAccess {
  def start(ctx: SQLContext): HiveServer2 =
    HiveThriftServer2.startWithContext(ctx)
}
