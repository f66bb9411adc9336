package graft

/** Registry of storage-backed SHARED PIPELINE ARTIFACTS — frames a whole
  * pipeline run derives once and many downstream operators consume (the
  * near-dup components fixpoint is the canonical case: components,
  * cluster_profile, keep_best, curation_funnel, mix_dedup_discount and
  * split_leakage_audit all read the same table).
  *
  * The Bench/Verify between-query boundary frees ALL persistent RDDs so
  * per-query numbers stay honest-cold (the b5d3212 convention) — but a
  * shared artifact is precisely the storage a production pipeline pays
  * for ONCE and amortizes across every consumer, so the boundary exempts
  * RDD ids registered here. The cold derivation stays visible: the FIRST
  * consumer's `queries_first` number carries it; later consumers measure
  * only their own incremental work, exactly as a real pipeline would.
  *
  * Memo owners (Dedup.componentsTable) must still handle eviction: a
  * registered block can disappear on executor loss or an explicit free,
  * so every memo hit re-checks the backing RDD's storage level and
  * rebuilds when it is gone — registration is an optimization, never a
  * correctness dependency.
  */
object SharedArtifacts {
  private val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Integer]()
  def register(id: Int): Unit = ids.add(id)
  def contains(id: Int): Boolean = ids.contains(id)

  /** Content fingerprint of `<dir>/<table>.parquet` (file OR directory of
    * part files): every data file's (relative path, size, mtime) folded
    * into one hash. Memo owners fold this into their keys so a table
    * REWRITTEN under the same path within a session (Generate overwrites
    * parquet; the test harness reuses dirs) invalidates the memo instead
    * of serving stale artifacts to every downstream consumer — the one
    * staleness hole the (applicationId, dir) key left open. Driver-side
    * metadata walk only: O(files in one table), microseconds at catalog
    * scale, never a data read.
    */
  def tableFingerprint(dir: String, table: String): String = {
    val root = java.nio.file.Paths.get(dir, s"$table.parquet")
    if (!java.nio.file.Files.exists(root)) return "absent"
    val sb = new StringBuilder
    val stream = java.nio.file.Files.walk(root)
    try {
      stream.sorted().forEach { p =>
        if (java.nio.file.Files.isRegularFile(p)) {
          sb ++= root.relativize(p).toString
          sb += ':'
          sb ++= java.nio.file.Files.size(p).toString
          sb += ':'
          sb ++= java.nio.file.Files.getLastModifiedTime(p).toMillis.toString
          sb += ';'
        }
      }
    } finally stream.close()
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sb.result()).toLong & 0xffffffffL)
  }
}
