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
}
