package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Dedup
import graft.sim.Similarity

class DedupSimSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  /** Shared planted-near-duplicate fixture (seed 42): 200 random 64-d
    * base vectors + one perturbed copy each (ids +10000, planted cosines
    * spread across ~[0.90, 0.99]) — the LSH-recall, knn-graph and PQ
    * tests all measure against this single plant, so a change to the
    * planting scheme hits every consumer at once.
    */
  private lazy val plantedRows: Seq[(Long, Int, Seq[Double])] = {
    val rnd = new scala.util.Random(42)
    val dim = 64
    val base = Array.fill(200)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    // relative perturbation ~0.3 -> cosine ~ 1/sqrt(1+0.09) ~ 0.957
    base.zipWithIndex.flatMap { case (v, i) =>
      val nrm = math.sqrt(v.map(x => x * x).sum)
      val scale = (0.15 + 0.35 * rnd.nextDouble()) * nrm / math.sqrt(dim.toDouble)
      val dup = v.map(x => x + (rnd.nextDouble() * 2 - 1) * scale)
      Seq((i.toLong, i, v.toSeq), ((i + 10000).toLong, i, dup.toSeq))
    }.toSeq
  }

  private def cosSeq(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    d / math.sqrt(a.map(x => x * x).sum) / math.sqrt(b.map(x => x * x).sum)
  }

  /** (base_id, dup_id, true cosine) for every planted pair. */
  private lazy val plantedPairs: Seq[(Long, Long, Double)] = (0 until 200)
    .map(i => (i.toLong, (i + 10000).toLong,
      cosSeq(plantedRows(2 * i)._3, plantedRows(2 * i + 1)._3)))

  private def plantedDF = {
    import spark.implicits._
    plantedRows.toDF("vec_id", "label", "v")
      .withColumn("nrm", org.apache.spark.sql.functions.sqrt(
        graft.functions.VectorOps.dot_product(col("v"), col("v"))))
  }

  test("dedup_exact groups partition the corpus") {
    val g = Dedup.exact(spark, sf)
    val total = g.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, sf).count())
  }

  test("substring dedup matches a driver-side brute-force window tally") {
    val rows = Dedup.substringDup(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // brute-force: every strided 40-char window of every doc
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val tally = scala.collection.mutable.Map[String, (Set[Long], Long)]()
    Tables.documents(spark, sf).select("doc_id", "text").collect().foreach { r =>
      val (id, t) = (r.getAs[Long]("doc_id"), r.getAs[String]("text"))
      if (t.length >= 40)
        (0 to (t.length - 40) / 10).foreach { i =>
          val h = md5hex(t.substring(i * 10, i * 10 + 40))
          val (docs, occ) = tally.getOrElse(h, (Set.empty[Long], 0L))
          tally(h) = (docs + id, occ + 1)
        }
    }
    val expect = tally.toSeq
      .map { case (h, (docs, occ)) => (h, docs.size.toLong, occ, docs.min) }
      .filter(_._2 >= 2)
      .sortBy { case (h, nd, no, _) => (-nd, -no, h) }
      .take(100)
    val got = rows.map(r => (r.getAs[String]("win_md5"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_occ"), r.getAs[Long]("sample_doc"))).toSeq
    assert(got == expect)
    // exact whole-doc duplicates share spans: the top window spans >= 2 docs
    assert(rows.head.getAs[Long]("n_docs") >= 2)
  }

  test("minhash-LSH output is a subset of the exact ngram-jaccard pairs") {
    val lsh = Dedup.minhashLsh(spark, sf).select("doc_a", "doc_b")
    val exact = Dedup.ngramJaccard(spark, sf).select("doc_a", "doc_b")
    assert(lsh.exceptAll(exact).count() == 0)
  }

  test("minhash-LSH recalls every near-identical pair (jaccard >= 0.9)") {
    val hi = Dedup.ngramJaccard(spark, sf).filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b")
    val lsh = Dedup.minhashLsh(spark, sf).select("doc_a", "doc_b")
    assert(hi.exceptAll(lsh).count() == 0)
  }

  test("simhash pairs are symmetric-free and within hamming bound") {
    val p = Dedup.simhash(spark, sf).collect()
    assert(p.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
    assert(p.forall(_.getAs[Int]("hamming") <= 3))
  }

  test("ann-lsh cosines agree with brute force for shared (query, neighbor)") {
    val ann = Similarity.annLsh(spark, sf)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("c_ann"))
    val brute = Similarity.topkBruteforce(spark, sf)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("c_bf"))
    val joined = ann.join(brute, Seq("query_id", "neighbor_id"))
    assert(joined.count() > 0)
    assert(joined.filter(col("c_ann") =!= col("c_bf")).count() == 0)
  }

  test("ivf-ann recalls a reasonable share of the exact top-10") {
    val ivf = Similarity.annIvf(spark, sf)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("c1"))
    val brute = Similarity.topkBruteforce(spark, sf)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("c2"))
    val joined = ivf.join(brute, Seq("query_id", "neighbor_id")).cache()
    val hit = joined.count()
    val total = brute.count()
    // 2-of-8 probes on 64-dim unclustered synthetic data: recall is
    // necessarily partial; assert it's meaningfully above random (2/8)
    assert(hit.toDouble / total > 0.25, s"recall ${hit.toDouble / total}")
    // every reported cosine must equal brute-force exactly (no approx math)
    assert(joined.filter(col("c1") =!= col("c2")).count() == 0)
    joined.unpersist()
  }

  test("ngram prefix join output is identical to the naive shared-shingle join") {
    val prefix = Dedup.ngramPrefixJoin(spark, sf)
    val naive = Dedup.ngramJaccard(spark, sf)
    assert(prefix.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(prefix).count() == 0)
  }

  test("banded dedup_embedding pairs are a verified subset of the exact all-pairs") {
    val banded = Similarity.dedupEmbedding(spark, sf).cache()
    val exact = Similarity.dedupEmbeddingExact(spark, sf).cache()
    // no false positives: every banded pair appears in the exact scan
    // with the same cosine (candidates are exactly verified)
    assert(banded.exceptAll(exact).count() == 0)
    // recall on this corpus's weakly-similar pairs (cosine ceiling ~0.5,
    // where hyperplane LSH is near its theoretical floor): 16 bands x 6
    // bits measures 0.714 (10/14) here — pin the measured value so a
    // banding regression (fewer effective bands, broken plane literals)
    // is caught, with a small margin for corpus variation across SFs
    val recall = banded.count().toDouble / math.max(exact.count(), 1L)
    assert(recall >= 0.6, s"banded recall $recall (expected ~0.71 measured)")
    banded.unpersist(); exact.unpersist()
  }

  test("planted high-cosine near-dups: banded recall matches the analytic >99% claim") {
    // the 16x6 banding's >99.9% recall claim applies at dedup-typical
    // cosine >= 0.9 — plant REAL perturbed duplicates there and measure
    // (round-3 verdict: the high-regime number was analytic only).
    val planted = plantedPairs.filter(_._3 >= 0.9)
    assert(planted.size >= 150, s"bad plant: only ${planted.size} pairs at cosine >= 0.9")
    val found = Similarity.lshPairsFor(plantedDF)
      .filter(col("cosine") >= 0.9)
      .select("vec_id_a", "vec_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = planted.count(p => found((p._1, p._2)))
    val recall = hit.toDouble / planted.size
    // analytic: per-pair miss probability at cosine 0.9 is
    // (1-(1-acos(.9)/pi)^6)^16 ~ 3e-4; measured on this plant: 1.0
    assert(recall >= 0.99, s"high-cosine planted recall $recall over ${planted.size} pairs")
  }

  test("pair-key ladder: width grows one bit per corpus doubling, floor 6, cap 12") {
    // fixture SFs (500/500/2000 vectors) all sit on the floor, so every
    // driver-gate hash is unchanged by the adaptive keyspace
    assert(Similarity.pairBitsFor(1L) == 6)
    assert(Similarity.pairBitsFor(2048L) == 6)
    assert(Similarity.pairBitsFor(2049L) == 7)
    assert(Similarity.pairBitsFor(4096L) == 7)
    assert(Similarity.pairBitsFor(20000L) == 10)   // the sf1 corpus
    assert(Similarity.pairBitsFor(65537L) == 12)
    assert(Similarity.pairBitsFor(Long.MaxValue) == 12)
    // the ladder invariant: occupancy target n/2^bits <= 32 until the cap
    Seq(100L, 2048L, 5000L, 20000L, 65536L).foreach { n =>
      val b = Similarity.pairBitsFor(n)
      assert(n <= 32L * (1L << b), s"occupancy broken at n=$n bits=$b")
    }
  }

  test("pair-key ladder: wider keys REFINE the floor candidates (pairs only drop)") {
    // bit j carries weight 2^j, so a (band, key) collision at width 7
    // implies the same collision at width 6 (key % 64 equal) — adaptive
    // candidates are a subset of floor candidates on the SAME frame.
    // 2500 vectors puts the ladder one step up (7 bits).
    val wide = {
      val rnd = new scala.util.Random(7)
      (0 until 2500).map(i =>
        (i.toLong, i % 25, Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    }
    import spark.implicits._
    val df = wide.toDF("vec_id", "label", "v")
      .withColumn("nrm", org.apache.spark.sql.functions.sqrt(
        graft.functions.VectorOps.dot_product(col("v"), col("v"))))
      .repartition(8)
    def pairSet(bits: Option[Int]) =
      Similarity.lshPairsFor(df, bits).select("vec_id_a", "vec_id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val floor = pairSet(Some(6))
    val adaptive = pairSet(None)   // count()=2500 -> 7 bits via the ladder
    assert(adaptive.subsetOf(floor),
      s"${(adaptive -- floor).size} adaptive pairs missing from the floor set")
    // and the wider key actually separates: strictly fewer random-collision
    // candidates on this label-unstructured frame
    assert(adaptive.size < floor.size,
      s"7-bit candidates ${adaptive.size} not below 6-bit ${floor.size}")
  }

  test("pair-key ladder: planted high-cosine recall survives the 12-bit cap") {
    // analytic at cosine 0.9: p = 1-acos(.9)/pi ~ 0.856, per-band hit
    // p^12 ~ 0.155, 16 bands -> 1-(1-p^12)^16 ~ 0.93; the plant spreads
    // cosines over [0.90, 0.99] where recall is higher still
    val planted = plantedPairs.filter(_._3 >= 0.9)
    val found = Similarity.lshPairsFor(plantedDF, Some(Similarity.maxPairBits))
      .filter(col("cosine") >= 0.9)
      .select("vec_id_a", "vec_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted.count(p => found((p._1, p._2))).toDouble / planted.size
    assert(recall >= 0.85, s"12-bit planted recall $recall over ${planted.size} pairs")
  }

  test("banded pairs-threshold tally counts only exactly-verified candidates") {
    val banded = Similarity.pairsThreshold(spark, sf).collect()
      .map(r => r.getAs[Boolean]("same_label") -> r.getAs[Long]("n_pairs")).toMap
    val exact = Similarity.pairsThresholdExact(spark, sf).collect()
      .map(r => r.getAs[Boolean]("same_label") -> r.getAs[Long]("n_pairs")).toMap
    // per label-class, the banded count never exceeds the exact count
    banded.foreach { case (k, n) => assert(n <= exact.getOrElse(k, 0L), s"class $k") }
    // and total recall holds the measured 16x6 banding level (0.69 here)
    val recall = banded.values.sum.toDouble / math.max(exact.values.sum, 1L)
    assert(recall >= 0.55, s"pairs-threshold recall $recall (expected ~0.69 measured)")
  }

  test("components partition all docs; every near-dup pair lands in one component") {
    val comp = Dedup.components(spark, sf).cache()
    val byDoc = comp.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canon_id")).toMap
    // every document labeled exactly once
    assert(byDoc.size == Tables.documents(spark, sf).count())
    // canonical id is the component minimum and is itself in the component
    byDoc.foreach { case (d, c) => assert(c <= d && byDoc(c) == c) }
    // every verified near-dup pair shares a component
    Dedup.ngramPrefixJoin(spark, sf).collect().foreach { r =>
      assert(byDoc(r.getAs[Long]("doc_a")) == byDoc(r.getAs[Long]("doc_b")))
    }
    // component sizes are consistent with the labeling
    val sizes = comp.collect().groupBy(_.getAs[Long]("canon_id"))
    sizes.foreach { case (_, rows) =>
      assert(rows.forall(_.getAs[Long]("component_size") == rows.length))
    }
    comp.unpersist()
  }

  test("components converges on a 25-doc duplicate CHAIN (deep diameter, log rounds)") {
    import spark.implicits._
    // sliding 40-token windows shifted by 8: adjacent docs share 30 of 38
    // trigram shingles (J ~ 0.65 >= 0.5), skip-one pairs share 22 of 54
    // (J ~ 0.41 < 0.5) -> the dup graph is a pure CHAIN of diameter 24,
    // the worst case for plain min-label propagation
    val words = (0 until 240).map(i => s"w$i")
    val docs = (0 until 25).map { i =>
      (i.toLong, words.slice(i * 8, i * 8 + 40).mkString(" "), "en", "chain", 40L)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_chain").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val comp = text.Dedup.components(spark, dir).collect()
    assert(comp.length == 25)
    // every doc lands in ONE component canonicalized at doc 0
    assert(comp.forall(_.getAs[Long]("canon_id") == 0L))
    assert(comp.forall(_.getAs[Long]("component_size") == 25L))
    assert(comp.count(_.getAs[Boolean]("is_canonical")) == 1)
  }

  test("sq8 quantized top-10 recalls most of the exact float top-10") {
    val exact = Similarity.topkBruteforce(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val sq8 = Similarity.annSq8(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(sq8.keySet == exact.keySet)
    sq8.values.foreach(ns => assert(ns.size == 10))
    // 8-bit linear quantization error is small relative to neighbor
    // separation: corpus-wide recall@10 stays high (measured ~0.9+; the
    // only error source is quantization — the code scan is exhaustive)
    val recall = exact.keys.toSeq
      .map(q => (sq8(q) & exact(q)).size.toDouble / 10).sum / exact.size
    assert(recall >= 0.8, s"recall@10 $recall")
    // distances are exact integers: deterministic ordering, no float seam
    Similarity.annSq8(spark, sf).collect()
      .foreach(r => assert(r.getAs[Long]("dist_q") >= 0))
  }

  test("semdedup: drop verdicts match a driver-side greedy within clusters") {
    import graft.sim.Similarity
    val rows = Similarity.semDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    // driver-side recompute: bucket by the same hyperplane signs, then
    // mark b dropped iff some same-bucket a < b has cosine >= tau
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getSeq[Double](1).toArray))
    def bucket(v: Array[Double]): Long =
      (0 until Similarity.nPlanes).map { j =>
        val d = Similarity.hyperplanes(j).zip(v).map { case (a, b) => a * b }
          .foldLeft(0.0)(_ + _)
        if (d >= 0.0) 1L << j else 0L
      }.sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byCid = vecs.groupBy(v => bucket(v._2))
    val expect = byCid.map { case (cid, vs) =>
      val sorted = vs.sortBy(_._1)
      val pairs = for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
        if cos(sorted(i)._2, sorted(j)._2) >= Similarity.semTau
      } yield (sorted(i)._1, sorted(j)._1)
      cid -> (vs.length.toLong, pairs.length.toLong, pairs.map(_._2).distinct.length.toLong)
    }
    assert(rows.length == byCid.size)
    rows.foreach { r =>
      val (nv, np, nd) = expect(r.getAs[Long]("cid"))
      assert(r.getAs[Long]("n_vecs") == nv)
      assert(r.getAs[Long]("n_dup_pairs") == np, s"cid ${r.getAs[Long]("cid")} pairs")
      assert(r.getAs[Long]("n_dropped") == nd)
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_vecs"))
    }
  }

  test("mmr: selection sequence matches an independent driver-side greedy") {
    import graft.sim.Similarity
    val rows = Similarity.simMmr(spark, sf).collect()
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == (0L until Similarity.mmrQueries).toSet)
    byQ.foreach { case (q, got) =>
      val pool = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vecs(q), v)) }
        .sortBy(c => (-c._2, c._1)).take(Similarity.mmrPool)
      var selected = Vector.empty[(Long, Double)]
      var remaining = pool
      while (selected.length < Similarity.mmrK) {
        val best = remaining.map { case (id, rel) =>
          val maxSim = if (selected.isEmpty) 0.0
            else selected.map(s => cos(vecs(id), vecs(s._1))).max
          (id, 0.5 * rel - 0.5 * maxSim)
        }.minBy { case (id, sc) => (-sc, id) }
        selected :+= best
        remaining = remaining.filterNot(_._1 == best._1)
      }
      val gotSeq = got.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("cand_id"), r.getAs[Double]("score")))
      assert(gotSeq.toVector == selected, s"query $q: $gotSeq vs $selected")
    }
  }

  test("topk returns exactly 10 ranked neighbors per query") {
    val t = Similarity.topkBruteforce(spark, sf)
    val perQuery = t.groupBy("query_id").agg(count(lit(1)).as("n"), max("rank").as("mr"))
    assert(perQuery.filter(col("n") =!= 10 || col("mr") =!= 10).count() == 0)
  }

  test("knn graph: contiguous ranks, non-increasing cosines, planted dup is rank 1") {
    // structural invariants on the real corpus
    val rows = Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Int]("rank"),
        r.getAs[Long]("dst"), r.getAs[Double]("cosine")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, g) =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to g.length), s"src $src ranks not contiguous")
      assert(byRank.forall(_._3 != src), s"src $src lists itself as a neighbor")
      assert(g.length <= Similarity.knnK)
      // ordered by (cosine desc, dst) — the window's exact tiebreak
      val key = byRank.map(t => (-t._4, t._3))
      assert(key.sameElements(key.sorted), s"src $src cosine order broken")
    }
    // planted: each high-cosine duplicate must surface as its base's
    // rank-1 neighbor (the fixture's random cosines sit far below 0.9)
    val g = Similarity.knnGraphFor(Similarity.lshPairsFor(plantedDF)).collect()
      .map(r => ((r.getAs[Long]("src"), r.getAs[Int]("rank")), r.getAs[Long]("dst")))
      .toMap
    val planted = plantedPairs.filter(_._3 >= 0.9)
    assert(planted.size >= 150)
    val rank1Hits = planted.count(p => g.get((p._1, 1)).contains(p._2))
    assert(rank1Hits >= (planted.size * 0.99).toInt,
      s"only $rank1Hits/${planted.size} planted dups surfaced at rank 1")
  }

  test("pq ann: structure, pinned recall on the random corpus, planted-dup recall") {
    val out = Similarity.annPq(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_d")))
    // 10 ranked neighbors per query, ADC non-decreasing with rank
    val perQ = out.groupBy(_._1)
    assert(perQ.nonEmpty)
    perQ.foreach { case (q, g) =>
      val byRank = g.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to 10), s"query $q")
      assert(byRank.forall(_._3 != q))
      val ds = byRank.map(_._4)
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b }, s"query $q ADC order")
    }
    // recall@10 vs the exact float L2 top-10: 64-bit codes on a
    // STRUCTURELESS random corpus are information-bounded — this pin is
    // the honest adversarial-regime floor (dedup_embedding discipline)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val byId = vecs.toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val hits = perQ.toSeq.map { case (q, g) =>
      val exact = vecs.filter(_._1 != q)
        .map { case (id, v) => (l2(byId(q), v), id) }.sorted.take(10).map(_._2).toSet
      g.map(_._3).count(exact)
    }.sum
    val recall = hits.toDouble / (perQ.size * 10)
    info(f"pq recall@10 on random corpus: $recall%.2f")
    assert(recall >= 0.30, f"recall $recall%.2f under the pinned floor")
    // planted near-duplicates — the regime PQ retrieval actually serves:
    // each base's perturbed copy must surface in its ADC top-10
    val planted = Similarity.annPqFor(plantedDF).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val dupHits = planted.count { case (q, ns) => ns(q + 10000) }
    info(s"pq planted-dup top-10 hits: $dupHits/${planted.size}")
    assert(dupHits >= (planted.size * 0.9).toInt,
      s"planted duplicates must surface: $dupHits/${planted.size}")
  }

  test("embedding drift: slice centroids match an exact driver recompute; identical slices don't drift") {
    val rows = Similarity.qualityEmbeddingDrift(spark, sf).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("centroid_cosine"), r.getAs[Boolean]("is_drifted"))).toMap
    assert(rows.nonEmpty)
    // exact recompute: decimal-quantized per-slice centroid means, then
    // the same rounded cosine
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def centroid(g: Seq[Array[Double]]): Array[Double] = {
      val dim = g.head.length
      Array.tabulate(dim) { k =>
        val s = g.map(v => BigDecimal(v(k)).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
        s.toDouble / g.length
      }
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    vecs.groupBy(_._3).foreach { case (label, g) =>
      val (ga, gb) = g.partition(_._1 % 2 == 0)
      val (na, nb, c, drifted) = rows(label)
      assert(na == ga.length && nb == gb.length)
      val want = cos(centroid(ga.map(_._2).toSeq), centroid(gb.map(_._2).toSeq))
      assert(c == want, s"label $label: $c vs $want")
      assert(drifted == (c < Similarity.driftTau))
    }
    // sanity of the instrument: two IDENTICAL slices have cosine exactly 1
    assert(cos(centroid(vecs.take(50).map(_._2).toSeq),
      centroid(vecs.take(50).map(_._2).toSeq)) == 1.0)
  }

  test("knn label propagation matches a driver-side clamped-LPA recompute") {
    val out = Similarity.knnLabelProp(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Boolean]("is_seed"),
        Option(r.getAs[Any]("prop_label")).map(_.asInstanceOf[Int]),
        r.getAs[Boolean]("agrees")))
    assert(out.nonEmpty)
    // seeds are clamped; propagation labels a real share of the rest
    out.filter(_._3).foreach(t => assert(t._4.contains(t._2)))
    val nonSeed = out.filterNot(_._3)
    assert(nonSeed.count(_._4.nonEmpty) > nonSeed.length / 2,
      "propagation should label most non-seeds through a knn graph")
    // full equivalence against an independent driver-side simulation
    val edges = Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
      .groupBy(_._1).map { case (s, es) => (s, es.map(_._2).toSeq) }
    val gold = out.map(t => (t._1, t._2)).toMap
    var cur: Map[Long, Option[Int]] = gold.map { case (id, l) =>
      (id, if (id % Similarity.lpSeedMod == 0) Some(l) else None)
    }
    for (_ <- 1 to Similarity.lpRounds) {
      val next = cur.map { case (id, prev) =>
        if (id % Similarity.lpSeedMod == 0) (id, Some(gold(id)))
        else {
          val votes = edges.getOrElse(id, Nil).flatMap(cur(_))
          if (votes.isEmpty) (id, prev)
          else {
            val counts = votes.groupBy(identity).map { case (l, v) => (l, v.size) }
            (id, Some(counts.toSeq.minBy { case (l, c) => (-c, l) }._1))
          }
        }
      }
      cur = next
    }
    out.foreach { case (id, _, _, prop, agrees) =>
      assert(prop == cur(id), s"vec $id: op $prop vs recompute ${cur(id)}")
      assert(agrees == prop.contains(gold(id)))
    }
  }

  test("cluster_kmeans profile matches a driver-side Lloyd replication") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val rows = Similarity.clusterKmeans(spark, sf).collect()
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val k = Similarity.ivfK
    val stride = math.max(vecs.length.toLong / k, 1L)
    var cents: Array[Array[Double]] = vecs.filter(_._1 % stride == 0)
      .take(k).map(_._2)
    def dist(v: Array[Double], c: Array[Double]): Double = {
      val cc = c.map(x => x * x).sum
      var dot = 0.0; var i = 0
      while (i < v.length) { dot += v(i) * c(i); i += 1 }
      cc - dot * 2
    }
    def assign(v: Array[Double]): Int =
      cents.indices.minBy(i => (dist(v, cents(i)), i))
    def q6(x: Double): JBD = JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP)
    for (_ <- 1 to Similarity.ivfIters) {
      val byC = vecs.groupBy(t => assign(t._2))
      cents = cents.zipWithIndex.map { case (c, i) =>
        byC.get(i) match {
          case Some(vs) =>
            Array.tabulate(c.length) { d =>
              val s = vs.map(t => q6(t._2(d))).reduce(_ add _)
              s.doubleValue / vs.length
            }
          case None => c
        }
      }
    }
    val byC = vecs.groupBy(t => assign(t._2))
    val expect = byC.map { case (cid, vs) =>
      val dqs = vs.map { t =>
        val vv = t._2.foldLeft(0.0)((a, x) => a + x * x)
        q6(vv + dist(t._2, cents(cid)))
      }
      val inertia = dqs.reduce(_ add _)
      (cid, (vs.length.toLong, inertia.doubleValue,
        inertia.doubleValue / vs.length, dqs.max.doubleValue))
    }
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == vecs.length.toLong)
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val cid = r.getAs[Int]("cid")
      val (n, in, mean, mx) = expect(cid)
      assert(r.getAs[Long]("n_vecs") == n, s"cluster $cid size")
      assert(r.getAs[Double]("inertia") == in, s"cluster $cid inertia")
      assert(r.getAs[Double]("mean_dist") == mean, s"cluster $cid mean")
      assert(r.getAs[Double]("max_dist") == mx, s"cluster $cid max")
    }
  }

  test("triangles: planted clique exact; real knn graph matches brute recompute") {
    import spark.implicits._
    // 5-clique (ids 0-4) + pendant path 4-5-6
    val clique = for { i <- 0 until 5; j <- i + 1 until 5 } yield (i.toLong, j.toLong)
    val edges = clique ++ Seq((4L, 5L), (5L, 6L))
    val out = Similarity.knnTrianglesFor(edges.toDF("src", "dst")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"), r.getAs[Long]("clustering_ppm")))
      .toMap
    (0L to 3L).foreach { i => assert(out(i) == ((4L, 6L, 1000000L)), s"clique node $i") }
    assert(out(4L) == ((5L, 6L, 600000L)))   // clique node + pendant edge
    assert(out(5L) == ((2L, 0L, 0L)))        // path interior: open wedge
    assert(out(6L) == ((1L, 0L, 0L)))        // leaf
    assert(out.values.map(_._2).sum == 30L)  // C(5,3)=10 triangles x 3 nodes

    // real knn graph: per-node counts match a brute neighbor-set recompute
    val knn = Similarity.knnGraph(spark, sf)
    val und = knn.collect()
      .map(r => { val s = r.getAs[Long]("src"); val d = r.getAs[Long]("dst")
        (math.min(s, d), math.max(s, d)) }).distinct
    val nbrs = (und.map(e => (e._1, e._2)) ++ und.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, es) => (v, es.map(_._2).toSet) }
    val got = Similarity.knnTrianglesFor(knn).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val v = r.getAs[Long]("vec_id")
      val ns = nbrs(v).toSeq
      val expT = (for { i <- ns.indices; j <- i + 1 until ns.length
        if nbrs(ns(i)).contains(ns(j)) } yield 1).size.toLong
      assert(r.getAs[Long]("degree") == ns.length.toLong, s"node $v degree")
      assert(r.getAs[Long]("n_triangles") == expT, s"node $v triangles")
    }
  }

  test("recall report equals a driver-side overlap of ivf and brute top-10") {
    val rows = Similarity.simRecallReport(spark, sf).collect()
    val ivf = Similarity.annIvf(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, ns) => (q, ns.map(_._2).toSet) }
    val brute = Similarity.topkBruteforce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).map { case (q, ns) => (q, ns.map(_._2).toSet) }
    assert(rows.map(_.getAs[Long]("query_id")).toSet == brute.keySet)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val hits = brute(q).intersect(ivf.getOrElse(q, Set.empty)).size.toLong
      assert(r.getAs[Long]("n_true") == brute(q).size.toLong)
      assert(r.getAs[Long]("n_hits") == hits, s"query $q")
      assert(r.getAs[Long]("recall_ppm") == hits * 1000000L / brute(q).size)
    }
    // the probe actually finds most of the truth on this corpus
    val overall = rows.map(_.getAs[Long]("n_hits")).sum.toDouble /
      rows.map(_.getAs[Long]("n_true")).sum
    assert(overall > 0.2, s"ivf recall collapsed: $overall")
  }

  test("probe sweep: recall monotone in budget; full probe is exact; p=2 matches the report") {
    val rows = Similarity.simIvfProbeSweep(spark, sf).collect()
      .sortBy(_.getAs[Int]("probe_count"))
    assert(rows.map(_.getAs[Int]("probe_count")).toSeq == Similarity.ivfSweepProbes)
    // micro-average consistency within each row
    rows.foreach { r =>
      assert(r.getAs[Long]("recall_ppm") ==
        r.getAs[Long]("total_hits") * 1000000L / r.getAs[Long]("total_true"))
      assert(r.getAs[Long]("total_true") == r.getAs[Long]("n_queries") * 10)
    }
    // more probes can only help
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("total_hits") <= b.getAs[Long]("total_hits"),
        s"recall regressed from nprobe ${a.getAs[Int]("probe_count")}")
    }
    // probing every list IS brute force: the sanity anchor
    assert(rows.last.getAs[Long]("recall_ppm") == 1000000L)
    // the sweep's nprobe = ivfProbe row must micro-average exactly what
    // the per-query recall report measures (same quantizer, same path)
    val rep = Similarity.simRecallReport(spark, sf).collect()
    val repHits = rep.map(_.getAs[Long]("n_hits")).sum
    val atDefault = rows.find(_.getAs[Int]("probe_count") == Similarity.ivfProbe).get
    assert(atDefault.getAs[Long]("total_hits") == repHits)
  }

  test("knn classify report matches a driver-side seed-vote recompute") {
    val rows = Similarity.knnClassify(spark, sf).collect()
    val gold = Tables.embeddings(spark, sf).select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val nbrs = Similarity.knnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
      .groupBy(_._1).map { case (s, es) => (s, es.map(_._2).toSeq) }
    val m = Similarity.lpSeedMod
    val evals = gold.keys.toSeq.filter(_ % m != 0).map { id =>
      val votes = nbrs.getOrElse(id, Nil).filter(_ % m == 0).map(gold)
      val pred = if (votes.isEmpty) None
        else Some(votes.groupBy(identity).map { case (l, v) => (l, v.size) }
          .toSeq.minBy { case (l, c) => (-c, l) }._1)
      (gold(id), pred)
    }.toSeq
    val expect = evals.groupBy(_._1).map { case (lbl, es) =>
      (lbl, (es.length.toLong,
        es.count(e => e._2.contains(lbl)).toLong,
        es.count(_._2.isEmpty).toLong))
    }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val lbl = r.getAs[Int]("label")
      val (n, correct, abstain) = expect(lbl)
      assert(r.getAs[Long]("n_eval") == n, s"label $lbl n_eval")
      assert(r.getAs[Long]("n_correct") == correct, s"label $lbl correct")
      assert(r.getAs[Long]("n_abstain") == abstain, s"label $lbl abstain")
      assert(r.getAs[Long]("accuracy_ppm") == correct * 1000000L / n)
    }
  }

  test("ivf-pq: probes bound the cells, ADC agrees with the exhaustive PQ index") {
    val rows = Similarity.annIvfPq(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 20)
    byQ.values.foreach { rs =>
      assert(rs.length == 10)
      // candidates come only from the query's nprobe cells
      assert(rs.map(_.getAs[Int]("cid")).distinct.length <= Similarity.ivfProbe)
    }
    // shared index proof: for every (query, neighbor) the composed path
    // shares with the exhaustive PQ top-10, the ADC distance is IDENTICAL
    // (same codebooks, same LUT, same fold) — pruning changes the
    // candidate set, never the arithmetic
    val pq = Similarity.annPq(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("adc_d")).toMap
    val common = rows.flatMap { r =>
      pq.get((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
        .map(adc => (adc, r.getAs[Double]("adc_d")))
    }
    assert(common.nonEmpty, "no overlap between composed and exhaustive top-10s")
    common.foreach { case (a, b) => assert(a == b) }
    // and the composed path can only lose candidates vs exhaustive PQ:
    // any shared pair must rank at least as well in the pruned index
    val ivfpqRank = rows.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id")) -> r.getAs[Int]("rank")).toMap
    val pqRank = Similarity.annPq(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Int]("rank")).toMap
    ivfpqRank.foreach { case (k, rk) =>
      pqRank.get(k).foreach(prk => assert(rk <= prk, s"$k pruned rank $rk > $prk"))
    }
  }

  test("dup-ngram coverage matches a driver-side cross-doc 8-gram tally") {
    val rows = Dedup.dupNgramCoverage(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val n = Dedup.dupGramN
    val gramsByDoc: Map[Long, Set[String]] = docs.map { case (id, text) =>
      val toks = text.split(" ", -1).filter(_.nonEmpty)
      (id, toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet)
    }.toMap
    val docCount: Map[String, Int] = gramsByDoc.values.flatten
      .groupBy(identity).map { case (g, v) => (g, v.size) }
    assert(rows.length == docs.length) // zero-gram docs kept
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val gs = gramsByDoc(id)
      val dup = gs.count(docCount(_) >= 2).toLong
      assert(r.getAs[Long]("n_grams_distinct") == gs.size.toLong, s"doc $id distinct")
      assert(r.getAs[Long]("n_dup_grams") == dup, s"doc $id dup")
      val ppm = if (gs.isEmpty) 0L else dup * 1000000L / gs.size
      assert(r.getAs[Long]("dup_gram_ppm") == ppm, s"doc $id ppm")
    }
  }
}
