package graft

import graft.sources.Collector.Artifact

/** Per-surface collection-status classifier for the JDBC dialect seam
  * (r12 VERDICT #6): a third live engine is unreachable in this sandbox
  * (no sqlite/postgres/H2/mysql jar anywhere on the classpath), so the
  * degrade behavior per metadata surface is pinned EXHAUSTIVELY as a
  * two-engine matrix instead — a future dialect drops in by adding one
  * column of expectations, and any silent regression of a surface
  * (collected→absent, or an accidental upgrade the dialect can't
  * actually deliver) fails the matrix, not a scattered assertion.
  *
  * Vocabulary: "collected" (engine catalog answered), "inferred" (the
  * data-derived fallback path produced it), "discovered-no-definition"
  * (the object is visible but its body isn't wired for this dialect),
  * "absent" (surface yields nothing — the documented degrade).
  */
object SurfaceMatrix {

  val surfaces: Seq[String] = Seq(
    "primary_keys", "foreign_keys", "indexes", "views", "routines",
    "custom_types", "triggers", "check_constraints", "identity_defaults",
    "samples", "row_counts")

  def classify(a: Artifact): Map[String, String] = {
    val base = a.tables.filter(_.tableType == "table")
    def status(collected: Boolean, inferred: Boolean = false): String =
      if (collected) "collected" else if (inferred) "inferred" else "absent"
    Map(
      "primary_keys" -> status(
        base.exists(t => t.pkCandidates.nonEmpty &&
          t.keyProvenance == "collected"),
        base.exists(t => t.pkCandidates.nonEmpty &&
          t.keyProvenance == "inferred")),
      "foreign_keys" -> status(
        a.foreignKeys.exists(_.provenance == "collected"),
        a.foreignKeys.nonEmpty),
      "indexes" -> status(a.tables.exists(_.indexes.nonEmpty)),
      "views" -> (a.tables.filter(_.tableType == "view") match {
        case Nil => "absent"
        case vs if vs.exists(_.viewDefinition.nonEmpty) => "collected"
        case _ => "discovered-no-definition"
      }),
      "routines" -> status(a.routines.nonEmpty),
      "custom_types" -> status(a.customTypes.nonEmpty),
      "triggers" -> status(a.tables.exists(_.triggers.nonEmpty)),
      "check_constraints" -> status(a.tables.exists(_.constraints.exists(
        c => c.kind == "check" && c.provenance == "collected"))),
      "identity_defaults" -> status(a.tables.exists(_.columns.exists(
        c => c.autoIncrement || c.defaultValue.nonEmpty))),
      "samples" -> status(a.tables.exists(_.sampleRows.nonEmpty)),
      "row_counts" -> status(a.tables.exists(_.rowCount >= 0)))
  }

  /** Assert the full matrix at once — the diff names every deviating
    * surface, not just the first.
    */
  def assertMatrix(engine: String, a: Artifact,
      expected: Map[String, String]): Unit = {
    require(expected.keySet == surfaces.toSet,
      s"matrix for $engine must pin every surface; missing: " +
        (surfaces.toSet -- expected.keySet))
    val got = classify(a)
    val diffs = surfaces.flatMap { s =>
      if (got(s) == expected(s)) None
      else Some(s"$s: expected ${expected(s)}, got ${got(s)}")
    }
    assert(diffs.isEmpty,
      s"$engine degrade matrix deviates:\n  ${diffs.mkString("\n  ")}")
  }
}
