package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.{Pii, Incremental, TextStats, Dedup}
import graft.sim.Similarity

/** Round-4 pipeline operators: PII scan, incremental dedup, bigram LM,
  * centroid outliers.
  */
class Pipeline2Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("pii scan finds exactly the planted fixtures and masks them") {
    val rows = Pii.piiScan(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_emails") == (if (id % 7 == 0) 1 else 0), s"doc $id emails")
      assert(r.getAs[Int]("n_phones") == (if (id % 11 == 0) 1 else 0), s"doc $id phones")
      assert(r.getAs[Int]("n_ips") == (if (id % 13 == 0) 1 else 0), s"doc $id ips")
      assert(r.getAs[Boolean]("has_pii") ==
        (id % 7 == 0 || id % 11 == 0 || id % 13 == 0))
    }
    // masking is complete: re-scanning the masked text finds nothing
    val masked = Tables.documents(spark, sf)
      .select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(
          concat(col("text"), lit(" u9@ex.com 415-555-1234 10.0.0.1")),
          Pii.emailRe, "[EMAIL]"), Pii.phoneRe, "[PHONE]"), Pii.ipRe, "[IP]"))
      .collect().map(_.getString(1))
    masked.foreach { t =>
      assert(!t.matches(s".*${Pii.emailRe}.*"))
      assert(!t.matches(s".*${Pii.phoneRe}.*"))
    }
  }

  test("incremental dedup agrees with the full exact-dedup view") {
    val inc = Incremental.dedupIncremental(spark, sf).collect()
    assert(inc.nonEmpty && inc.length < 100) // ~10% of 500
    // cross-check against dedup_exact: a batch doc is corpus_dup iff its
    // exact group contains a smaller-or-equal corpus doc — recompute from
    // raw data
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("fp"),
        (expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 10") === 0)
          .as("is_batch")).collect()
    val corpusFps = docs.filter(!_.getAs[Boolean]("is_batch"))
      .groupBy(_.getAs[String]("fp"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).min).toMap
    val batchByFp = docs.filter(_.getAs[Boolean]("is_batch"))
      .groupBy(_.getAs[String]("fp"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).min).toMap
    val fpOf = docs.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    inc.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val fp = fpOf(id)
      assert(r.getAs[Boolean]("corpus_dup") == corpusFps.contains(fp), s"doc $id")
      assert(r.getAs[Boolean]("batch_dup") == (batchByFp(fp) < id), s"doc $id")
      assert(r.getAs[Boolean]("keep") ==
        (!corpusFps.contains(fp) && batchByFp(fp) == id), s"doc $id")
    }
    // every kept-or-matched doc is consistent with exact groups
    val nDupBatch = inc.count(r => !r.getAs[Boolean]("keep"))
    assert(inc.count(_.getAs[Boolean]("keep")) + nDupBatch == inc.length)
  }

  test("bloom gate: zero false negatives, fp rate within bound, verdicts match exact") {
    val gate = Incremental.dedupBloomGate(spark, sf).collect()
    val exact = Incremental.dedupIncremental(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("corpus_dup"),
          Option(r.getAs[Any]("corpus_canonical")).map(_.asInstanceOf[Long])))
      .toMap
    assert(gate.map(_.getAs[Long]("doc_id")).toSet == exact.keySet) // every batch doc
    var fps = 0; var nonDups = 0
    gate.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (isDup, canon) = exact(id)
      // Bloom guarantee: every true corpus dup passes the gate, and the
      // confirm join reaches the same canonical doc as the ungated path
      if (isDup) {
        assert(r.getAs[Boolean]("bloom_pass"), s"doc $id false negative")
        assert(r.getAs[Boolean]("corpus_dup"))
        assert(Option(r.getAs[Any]("corpus_canonical"))
          .map(_.asInstanceOf[Long]) == canon)
      } else {
        assert(!r.getAs[Boolean]("corpus_dup"))
        nonDups += 1
        if (r.getAs[Boolean]("false_positive")) fps += 1
        assert(r.getAs[Boolean]("false_positive") == r.getAs[Boolean]("bloom_pass"))
      }
    }
    // fpp=0.03 nominal; allow generous slack on a small batch
    assert(nonDups == 0 || fps.toDouble / nonDups < 0.15,
      s"false-positive rate $fps/$nonDups")
  }

  test("incremental minhash pairs = whole-corpus LSH pairs touching the batch") {
    // sf0.01: the 0.001 corpus has no near-dup pairs straddling the
    // batch split, which would make this an empty-vs-empty check
    val dir = "/root/testdata/sf0.01"
    val inc = Incremental.dedupIncrementalMinhash(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("match_doc"),
        r.getAs[String]("kind"), r.getAs[Double]("jaccard")))
    assert(inc.nonEmpty)
    val isBatch = Tables.documents(spark, dir)
      .select(col("doc_id"),
        (expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint) % 10") === 0)
          .as("b")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("b")).toMap
    val full = Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
    // expected: full-LSH pairs with >=1 batch member, labeled by kind,
    // oriented batch-doc-first for corpus matches
    val expect = full.flatMap { case (a, b, j) =>
      (isBatch(a), isBatch(b)) match {
        case (true, true)  => Some((a, b, "batch", j))
        case (true, false) => Some((a, b, "corpus", j))
        case (false, true) => Some((b, a, "corpus", j))
        case _             => None
      }
    }.sortBy(p => (p._1, p._2, p._3))
    assert(inc.sortBy(p => (p._1, p._2, p._3)).toSeq == expect.toSeq)
    // the batch never contributes corpus-corpus work: every row names a
    // batch doc first
    inc.foreach { case (d, m, kind, _) =>
      assert(isBatch(d))
      assert(if (kind == "batch") isBatch(m) else !isBatch(m))
    }
  }

  test("ingest pipeline: per-stage verdicts reconcile with the standalone ops") {
    // the composed gate must carry EXACTLY the verdicts each stage
    // produces standalone, and the action must be the documented
    // first-match precedence over them — this is what keeps the three
    // individually-gated stages from drifting apart under refactoring
    val pipe = Incremental.ingestPipeline(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val exact = Incremental.dedupIncremental(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val near = Incremental.dedupIncrementalMinhash(spark, sf).collect()
    val nearCorpus = near.filter(_.getAs[String]("kind") == "corpus")
      .map(_.getAs[Long]("doc_id")).toSet
    val nearBatch = near.filter(_.getAs[String]("kind") == "batch")
      .map(_.getAs[Long]("match_doc")).toSet
    val canon = Incremental.incrementalComponents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canon_id")).toMap
    assert(pipe.keySet == exact.keySet) // one verdict row per batch doc
    pipe.foreach { case (id, r) =>
      assert(r.getAs[Boolean]("corpus_dup") ==
        exact(id).getAs[Boolean]("corpus_dup"), s"doc $id corpus_dup")
      assert(r.getAs[Boolean]("batch_dup") ==
        exact(id).getAs[Boolean]("batch_dup"), s"doc $id batch_dup")
      assert(r.getAs[Boolean]("near_corpus") == nearCorpus(id), s"doc $id nc")
      assert(r.getAs[Boolean]("near_batch") == nearBatch(id), s"doc $id nb")
      assert(r.getAs[Long]("canon_id") == canon(id), s"doc $id canon")
      val want =
        if (r.getAs[Boolean]("corpus_dup")) "drop_exact_corpus"
        else if (r.getAs[Boolean]("batch_dup")) "drop_exact_batch"
        else if (r.getAs[Boolean]("near_corpus")) "drop_near_corpus"
        else if (r.getAs[Boolean]("near_batch")) "drop_near_batch"
        else if (r.getAs[Long]("canon_id") != id) "merge_cluster"
        else "keep_new"
      assert(r.getAs[String]("action") == want, s"doc $id action")
    }
    // the tiny test corpus has no batch dups at all — keep_new only is
    // the CORRECT verdict set here; stage-firing coverage comes from the
    // planted-fixture test below
    assert(pipe.values.map(_.getAs[String]("action")).toSet
      .contains("keep_new"))
  }

  test("ingest pipeline: every drop stage fires on a planted corpus, " +
      "with the documented precedence") {
    import spark.implicits._
    // the md5-bucket split is part of the operator, so plant around it:
    // compute each candidate id's bucket the same way and pick planted
    // ids from the right sides of the split
    def isBatch(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 10 == 0
    }
    val ids = (0L until 200L)
    val batchIds = ids.filter(isBatch)
    val corpusIds = ids.filterNot(isBatch)
    assert(batchIds.size >= 4 && corpusIds.size >= 2)
    val Seq(b1, b2, b3, b4) = batchIds.take(4).sorted.toSeq
    val Seq(c1, c2) = corpusIds.take(2).toSeq
    val sharedLong = (1 to 30).map(i => s"common$i").mkString(" ")
    def text(id: Long): String =
      if (id == b1 || id == c1) "exact duplicate corpus text here"
      else if (id == b2 || id == b3) "exact duplicate within batch text"
      else if (id == c2) sharedLong
      else if (id == b4) sharedLong + " extratail" // J = 28/30, LSH-catchable
      else (1 to 5).map(i => s"u${id}w$i").mkString(" ") // token-disjoint
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    ids.map(i => (i, text(i), "en", "src0", text(i).length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Incremental.ingestPipeline(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("action")).toMap
    assert(got.keySet == batchIds.toSet)
    assert(got(b1) == "drop_exact_corpus", s"b1=$b1 got ${got(b1)}")
    // b2 is the FIRST arrival of the within-batch dup pair: it has no
    // corpus match and no earlier batch twin, so it survives the exact
    // stage; its twin b3 drops against it
    assert(got(b2) == "keep_new", s"b2=$b2 got ${got(b2)}")
    assert(got(b3) == "drop_exact_batch", s"b3=$b3 got ${got(b3)}")
    // 29-of-30-shingle overlap: candidate generation is deterministic
    // (fixed permutations), and at J=28/31 > 1/2 verification passes
    assert(got(b4) == "drop_near_corpus", s"b4=$b4 got ${got(b4)}")
    // every unplanted batch doc is token-disjoint filler -> keep_new
    (batchIds.toSet -- Set(b1, b2, b3, b4)).foreach { id =>
      assert(got(id) == "keep_new", s"filler $id got ${got(id)}")
    }
  }

  test("bigram nll is finite, positive, and zero-bigram docs degrade to null") {
    val rows = TextStats.bigramNll(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      if (n > 0) {
        val nll = r.getAs[Double]("avg_nll2")
        assert(!nll.isNaN && nll >= 0.0, s"doc ${r.getAs[Long]("doc_id")}: $nll")
      } else assert(r.isNullAt(r.fieldIndex("avg_nll2")))
    }
    // bigram surprise >= unigram surprise on average is NOT guaranteed
    // per-doc, but conditional entropy can't exceed the vocabulary's
    // marginal — sanity: corpus means are within a plausible band
    val mean = rows.filter(_.getAs[Long]("n_bigrams") > 0)
      .map(_.getAs[Double]("avg_nll2")).sum / rows.length
    assert(mean > 0.5 && mean < 20.0, s"mean bigram nll $mean")
  }

  test("bpe training: round 1 matches pair stats; merges actually apply") {
    import graft.text.BpeTrainer
    val merges = BpeTrainer.bpeTrain(spark, sf).collect()
    assert(merges.length == BpeTrainer.defaultMerges)
    assert(merges.map(_.getAs[Int]("rank")).toSeq == (1 to merges.length))
    // round 1 must agree with the single-step pair stats' top pair
    val top = TextStats.bpePairStats(spark, sf).collect().head
    assert(merges.head.getAs[String]("sym_a") == top.getAs[String]("sym_a"))
    assert(merges.head.getAs[String]("sym_b") == top.getAs[String]("sym_b"))
    assert(merges.head.getAs[Long]("pair_count") == top.getAs[Long]("pair_count"))
    // counts never increase across rounds for the SAME pair space; and a
    // learned pair can recur only with merged symbols, never identically
    val pairs = merges.map(r => (r.getAs[String]("sym_a"), r.getAs[String]("sym_b")))
    assert(pairs.distinct.length == pairs.length, "a pair was re-learned")
    // later merges may build on earlier ones: at least check every
    // multi-char symbol was produced by an earlier merge
    val produced = scala.collection.mutable.Set[String]()
    merges.foreach { r =>
      val (a, b) = (r.getAs[String]("sym_a"), r.getAs[String]("sym_b"))
      for (s <- Seq(a, b) if s.length > 1)
        assert(produced.contains(s), s"symbol '$s' used before being merged")
      produced += a + b
    }
  }

  test("bpe encode: token counts match a driver-side re-encode with the trained merges") {
    import graft.text.BpeTrainer
    val merges = BpeTrainer.bpeTrain(spark, sf).collect()
      .map(r => (r.getAs[String]("sym_a"), r.getAs[String]("sym_b")))
    val rows = BpeTrainer.bpeEncode(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_words") >= 1)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words"))
      // merges only ever shrink a word, so chars-per-token >= 1.0
      assert(r.getAs[Long]("cpt_e4") >= 10000L, s"doc ${r.getAs[Long]("doc_id")}")
    }
    // exact re-encode in plain Scala (String.replace = the same
    // left-to-right non-overlapping contract) on a sample of docs
    def encodeWord(w: String): Int = {
      var s = " " + w.split("").mkString(" ") + " "
      merges.foreach { case (a, b) =>
        s = s.replace(s" $a $b ", s" $a$b ").replace(s" $a $b ", s" $a$b ")
      }
      s.trim.split(" ").length
    }
    val expect = Tables.documents(spark, sf).filter(col("doc_id") < 25)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ").filter(_.nonEmpty).map(encodeWord).map(_.toLong).sum)
      .toMap
    rows.filter(_.getAs[Long]("doc_id") < 25).foreach { r =>
      assert(r.getAs[Long]("n_tokens") == expect(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}")
    }
    // merges really fired somewhere: corpus-wide tokens < corpus-wide chars
    assert(rows.map(_.getAs[Long]("n_tokens")).sum <
      rows.map(r => r.getAs[Long]("cpt_e4") * r.getAs[Long]("n_tokens")).sum / 10000)
  }

  test("readability: flesch matches the formula on hand-counted fixtures") {
    val rows = TextStats.readability(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (w, s, syl) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_sentences"),
        r.getAs[Long]("n_syllables"))
      assert(w >= 1 && s >= 1)
      val expect = 206.835 - 1.015 * (w.toDouble / s) - 84.6 * (syl.toDouble / w)
      assert(r.getAs[Double]("flesch") == expect,
        s"doc ${r.getAs[Long]("doc_id")}")
    }
    // hand-checked fixture: known word/sentence/syllable counts
    import spark.implicits._
    val fx = Seq((1L, "The cat sat. The dog ran!")).toDF("doc_id", "text")
      .createOrReplaceTempView("fx_docs")
    val c = spark.sql(
      """SELECT size(filter(split(text, ' '), t -> t <> '')) AS w,
        |  greatest(size(regexp_extract_all(text, '[.!?]+', 0)), 1) AS s,
        |  size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS syl
        |FROM fx_docs""".stripMargin).collect().head
    assert(c.getInt(0) == 6 && c.getInt(1) == 2 && c.getInt(2) == 6)
  }

  test("centroid outliers rank the least-aligned vectors per label") {
    val rows = Similarity.centroidOutliers(spark, sf).collect()
    val byLabel = rows.groupBy(_.getAs[Int]("label"))
    byLabel.foreach { case (lbl, rs) =>
      assert(rs.length == 3, s"label $lbl")
      val cosines = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_centroid"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a <= b }, s"label $lbl order")
    }
    // the flagged minimum really is the per-label minimum (brute check)
    val all = Tables.embeddings(spark, sf).collect().map { r =>
      (r.getAs[Int]("label"), r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
    }
    val cents = all.groupBy(_._1).view.mapValues { vs =>
      val dim = vs.head._3.length
      Array.tabulate(dim)(k =>
        vs.map(v => BigDecimal(v._3(k)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble / vs.length)
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      BigDecimal(d / math.sqrt(a.map(x => x * x).sum) / math.sqrt(b.map(x => x * x).sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    byLabel.foreach { case (lbl, rs) =>
      val worstFlagged = rs.minBy(_.getAs[Int]("rank"))
      val brute = all.filter(_._1 == lbl)
        .map { case (_, id, v) => (cos(v, cents(lbl)), id) }.min
      assert(worstFlagged.getAs[Long]("vec_id") == brute._2,
        s"label $lbl: flagged ${worstFlagged.getAs[Long]("vec_id")} brute ${brute._2}")
    }
  }
}
