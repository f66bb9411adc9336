package graft.output

import graft.sources.Collector._

/** Artifact loading — the HALF of the reference's postprocessor this
  * library was missing: `dbsurveyor generate` LOADS a previously
  * collected artifact file and renders from it without ever touching
  * the database again (dbsurveyor/src/main.rs: read file → optional
  * decrypt/decompress → deserialize → generate). ArtifactJson.render is
  * the serializer; this is its exact inverse, so
  * `load(render(a)) == a` (case-class equality, asserted in spec), and
  * the full offline chain render → gzip → encrypt → decrypt → gunzip →
  * load is the reference's secure workflow end-to-end.
  *
  * The parser is a minimal recursive-descent JSON reader (objects,
  * arrays, strings with escapes, numbers, booleans, null) — no
  * dependencies, driver-side, O(artifact size) which is metadata-sized
  * by construction.
  */
object ArtifactLoad {

  /** Read an artifact FILE in any Generate framing: optional AES
    * envelope first (when a password is given), then magic-byte-sniffed
    * decompression — gzip (1f 8b) or zstd (28 b5 2f fd) — then parse.
    * Sniffing the content instead of trusting the extension means a
    * renamed artifact still loads (the reference's offline-first
    * posture: the file is the contract, not its name).
    */
  def loadFile(path: String, password: Option[String] = None): Artifact = {
    val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val plain = password.map(p => Secure.decrypt(raw, p)).getOrElse(raw)
    def b(i: Int): Int = plain(i) & 0xff
    val json =
      if (plain.length >= 2 && b(0) == 0x1f && b(1) == 0x8b)
        Secure.gunzip(plain)
      else if (plain.length >= 4 && b(0) == 0x28 && b(1) == 0xb5 &&
          b(2) == 0x2f && b(3) == 0xfd)
        Secure.unzstd(plain)
      else plain
    load(new String(json, "UTF-8"))
  }

  // ------------------------------------------------------------ tiny JSON
  sealed trait J
  private case class JObj(fields: Map[String, J]) extends J
  private case class JArr(items: Vector[J]) extends J
  private case class JStr(s: String) extends J
  private case class JNum(raw: String) extends J
  private case class JBool(b: Boolean) extends J
  private case object JNull extends J

  private final class Parser(s: String) {
    private var i = 0
    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"artifact json: $msg at offset $i")
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      ws(); if (i >= s.length || s.charAt(i) != c) err(s"expected '$c'"); i += 1
    }
    def value(): J = {
      ws()
      if (i >= s.length) err("unexpected end")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true", JBool(true))
        case 'f' => lit("false", JBool(false))
        case 'n' => lit("null", JNull)
        case _ => num()
      }
    }
    private def lit(word: String, v: J): J = {
      if (!s.startsWith(word, i)) err(s"expected $word"); i += word.length; v
    }
    private def obj(): J = {
      expect('{'); ws()
      if (i < s.length && s.charAt(i) == '}') { i += 1; return JObj(Map.empty) }
      val b = Map.newBuilder[String, J]
      var done = false
      while (!done) {
        ws(); val k = str(); expect(':'); b += k -> value(); ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      JObj(b.result())
    }
    private def arr(): J = {
      expect('['); ws()
      if (i < s.length && s.charAt(i) == ']') { i += 1; return JArr(Vector.empty) }
      val b = Vector.newBuilder[J]
      var done = false
      while (!done) {
        b += value(); ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      JArr(b.result())
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) err("bad escape")
          s.charAt(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              if (i + 4 >= s.length) err("bad unicode escape")
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => err(s"bad escape '\\$other'")
          }
        } else sb += c
        i += 1
      }
      expect('"')
      sb.result()
    }
    private def num(): J = {
      val start = i
      while (i < s.length && (s.charAt(i).isDigit ||
        "+-.eE".indexOf(s.charAt(i)) >= 0)) i += 1
      if (i == start) err("expected value")
      JNum(s.substring(start, i))
    }
    def parseRoot(): J = { val v = value(); ws(); if (i != s.length) err("trailing data"); v }
  }

  // ------------------------------------------------------------ mapping
  private def obj(j: J): Map[String, J] = j match {
    case JObj(f) => f
    case other => throw new IllegalArgumentException(s"expected object, got $other")
  }
  private def arr(j: J): Vector[J] = j match {
    case JArr(a) => a
    case other => throw new IllegalArgumentException(s"expected array, got $other")
  }
  private def str(j: J): String = j match {
    case JStr(s) => s
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }
  private def long(j: J): Long = j match {
    case JNum(r) => r.toLong
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }
  private def dbl(j: J): Double = j match {
    case JNum(r) => r.toDouble
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }
  private def bool(j: J): Boolean = j match {
    case JBool(b) => b
    case other => throw new IllegalArgumentException(s"expected boolean, got $other")
  }
  private def strs(j: J): Seq[String] = arr(j).map(str)

  /** Parse a standalone JSON string array (the enum-constraint domain
    * encoding — comma-safe, shared with the DuckDB oracle's to_json).
    */
  def parseStringArray(json: String): Seq[String] =
    strs(new Parser(json).parseRoot())

  /** Parse a rendered artifact back into the model — the exact inverse
    * of ArtifactJson.render.
    */
  def load(json: String): Artifact = {
    val root = obj(new Parser(json).parseRoot())
    def field(m: Map[String, J], k: String): J =
      m.getOrElse(k, throw new IllegalArgumentException(s"missing field '$k'"))
    // fields added after v1.0 are optional-with-defaults, so artifacts
    // written by earlier releases keep loading (a version that CLAIMS
    // support must deliver it — the r4 loader hard-required its new
    // fields under the same '1.0' tag, breaking older files)
    def optField(m: Map[String, J], k: String, default: J): J =
      m.getOrElse(k, default)
    def optStr(m: Map[String, J], k: String, default: String): String =
      m.get(k).map(str).getOrElse(default)
    val tables = arr(field(root, "tables")).map { tj =>
      val t = obj(tj)
      val sampling = optField(t, "sampling", JNull) match {
        case JNull => Map.empty[String, J]
        case sj => obj(sj)
      }
      val cols = arr(field(t, "columns")).map { cj =>
        val c = obj(cj)
        ColumnInfo(str(field(c, "name")), str(field(c, "data_type")),
          bool(field(c, "nullable")),
          // post-1.2 fields: optional-with-defaults so older artifacts load
          autoIncrement = c.get("is_auto_increment").exists(bool),
          defaultValue = optStr(c, "default_value", ""),
          ordinal = c.get("ordinal_position").map(j => long(j).toInt).getOrElse(0),
          // v1.4 optional: absent = clean (pre-1.4 artifacts keep loading)
          sensitive = optStr(c, "sensitive", ""))
      }
      val idx = arr(optField(t, "indexes", JArr(Vector.empty))).map { ij =>
        val ix = obj(ij)
        IndexInfo(str(field(ix, "name")), strs(field(ix, "columns")),
          bool(field(ix, "unique")))
      }
      val cons = arr(optField(t, "constraints", JArr(Vector.empty))).map { cj =>
        val c = obj(cj)
        ConstraintInfo(str(field(c, "name")), str(field(c, "kind")),
          strs(field(c, "columns")), str(field(c, "detail")),
          str(field(c, "provenance")))
      }
      val trigs = arr(optField(t, "triggers", JArr(Vector.empty))).map { trj =>
        val tr = obj(trj)
        TriggerInfo(str(field(tr, "name")), str(field(tr, "event")),
          str(field(tr, "timing")), str(field(tr, "orientation")),
          str(field(tr, "definition")))
      }
      val layout = optField(t, "layout", JNull) match {
        case JNull => None
        case lj =>
          val l = obj(lj)
          Some(LayoutInfo(strs(field(l, "partition_columns")),
            strs(field(l, "bucket_columns")),
            long(field(l, "num_buckets")).toInt,
            strs(field(l, "sort_columns"))))
      }
      TableInfo(
        name = str(field(t, "name")),
        tableType = optStr(t, "table_type", "table"),
        viewDefinition = optStr(t, "view_definition", ""),
        columns = cols,
        rowCount = long(field(t, "row_count")),
        sampleHeader = strs(field(t, "sample_header")),
        sampleRows = arr(field(t, "sample_rows")).map(r => strs(r)),
        sampleStatus = str(field(t, "sample_status")),
        warnings = strs(field(t, "warnings")),
        pkCandidates = strs(field(t, "pk_candidates")),
        keyProvenance = optStr(t, "key_provenance", "inferred"),
        samplingStrategy = sampling.get("strategy").map(str).getOrElse("most_recent"),
        samplingKey = sampling.get("key").map(str).getOrElse(""),
        indexes = idx,
        constraints = cons,
        layout = layout,
        triggers = trigs)
    }
    val fks = arr(field(root, "foreign_keys")).map { fj =>
      val f = obj(fj)
      FkEdge(str(field(f, "child_table")), str(field(f, "child_column")),
        str(field(f, "parent_table")), str(field(f, "parent_column")),
        dbl(field(f, "coverage")), bool(field(f, "likely")),
        str(field(f, "provenance")),
        onUpdate = optStr(f, "on_update", ""),
        onDelete = optStr(f, "on_delete", ""))
    }
    val routines = arr(optField(root, "routines", JArr(Vector.empty))).map { rj =>
      val r = obj(rj)
      val ps = arr(field(r, "parameters")).map { pj =>
        val p = obj(pj)
        RoutineParam(str(field(p, "name")), str(field(p, "data_type")),
          str(field(p, "mode")))
      }
      RoutineInfo(str(field(r, "name")), str(field(r, "routine_type")),
        ps, str(field(r, "returns")))
    }
    val customTypes = arr(optField(root, "custom_types", JArr(Vector.empty))).map { cj =>
      val c = obj(cj)
      CustomTypeInfo(str(field(c, "name")), str(field(c, "kind")),
        str(field(c, "class_name")))
    }
    val server = field(root, "server") match {
      case JNull => None
      case sj =>
        val sm = obj(sj)
        // v1.3 optional: absent collection_mode = single-database run
        val mode = sm.get("collection_mode").collect {
          case mj if mj != JNull =>
            val mm = obj(mj)
            MultiDbCounts(long(field(mm, "discovered")).toInt,
              long(field(mm, "collected")).toInt,
              long(field(mm, "failed")).toInt)
        }
        Some(ServerInfo(str(field(sm, "engine")), str(field(sm, "version")),
          str(field(sm, "collected_at")), long(field(sm, "table_count")).toInt,
          collectionDurationMs =
            sm.get("collection_duration_ms").map(long).getOrElse(-1L),
          accessLevel = optStr(sm, "access_level", ""),
          collectionMode = mode))
    }
    Artifact(str(field(root, "format_version")), str(field(root, "source")),
      tables, fks, server, strs(field(root, "warnings")),
      routines = routines, customTypes = customTypes)
  }
}
