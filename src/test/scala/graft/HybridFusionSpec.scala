package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Similarity
import graft.text.{Dedup, Search, TextStats}

/** Driver-side recomputes for the round-7b pipeline additions:
  * hybrid RRF fusion, binary hamming ANN, canonicalized dedup, and the
  * perplexity-decile profile.
  */
class HybridFusionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  def sf: String = TestSession.sf

  test("hybrid RRF equals the fusion of its two legs, in exact integer ppb") {
    val lex = Search.bm25(spark, sf).collect()
      .sortBy(r => (-r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
      .zipWithIndex.map { case (r, i) => r.getAs[Long]("doc_id") -> (i + 1) }.toMap
    // semantic leg recomputed in plain Scala
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble))
    val q = vecs.find(_._1 == Search.hybridQueryVec).get._2
    val qn = math.sqrt(q.map(x => x * x).sum)
    def cos(v: Seq[Double]) = {
      val d = v.zip(q).map { case (x, y) => x * y }.sum
      BigDecimal(d / (math.sqrt(v.map(x => x * x).sum) * qn))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val sem = vecs.filter(_._1 != Search.hybridQueryVec)
      .map { case (id, v) => id -> cos(v) }
      .sortBy { case (id, c) => (-c, id) }.take(Search.topN)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val expected = (lex.keySet ++ sem.keySet).map { id =>
      id -> (lex.get(id).map(r => 1000000000L / (Search.rrfK + r)).getOrElse(0L) +
        sem.get(id).map(r => 1000000000L / (Search.rrfK + r)).getOrElse(0L))
    }.toMap
    val rows = Search.searchHybridRrf(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("rrf_ppb") == expected(r.getAs[Long]("doc_id")))
    }
    // output is sorted by fused score
    val scores = rows.map(_.getAs[Long]("rrf_ppb"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("hamming ANN recalls most of the exact top-10; planted dups surface at rank 1") {
    val exact = Similarity.topkBruteforce(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val ham = Similarity.annHamming(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    assert(ham.keySet == exact.keySet)
    ham.values.foreach(ns => assert(ns.size == 10))
    val recall = exact.keys.toSeq
      .map(q => (ham(q) & exact(q)).size.toDouble / 10).sum / exact.size
    // 60-bit sketches over a STRUCTURELESS random 64-d corpus sit near
    // their information floor (random pairs at 30±4 bits barely separate
    // from the exact top-10's ~0.4-cosine tail): measured 0.495 at
    // sf0.001 — the sim_ann_pq regime (0.42 pinned). The planted test
    // below shows the high-cosine regime this sketch is actually for.
    assert(recall >= 0.4, s"hamming recall $recall (measured 0.495)")
  }

  test("hamming ANN surfaces planted near-dups at rank 1") {
    // planted fixture: 200 base vectors (ids 0..199) + perturbed copies
    // (ids +10000) at cosine ~[0.90, 0.99] — for the 20 query ids the
    // copy must out-rank everything in a structureless corpus, and its
    // ~6/60 expected sketch hamming (acos(.95)/pi ~ 0.10) places it far
    // inside the top-50 candidate cut (random pairs sit at ~30/60)
    val rnd = new scala.util.Random(42)
    val dim = 64
    val base = Array.fill(200)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      val nrm = math.sqrt(v.map(x => x * x).sum)
      val scale = (0.15 + 0.35 * rnd.nextDouble()) * nrm / math.sqrt(dim.toDouble)
      val dup = v.map(x => x + (rnd.nextDouble() * 2 - 1) * scale)
      Seq((i.toLong, i, v.toSeq), ((i + 10000).toLong, i, dup.toSeq))
    }.toSeq
    import spark.implicits._
    val df = rows.toDF("vec_id", "label", "v")
      .withColumn("nrm", sqrt(graft.functions.VectorOps.dot_product(col("v"), col("v"))))
    val got = Similarity.annHammingFor(df).collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val hit = (0L until 20L).count(q => got.get(q).contains(q + 10000))
    assert(hit >= 19, s"planted rank-1 hits $hit/20")
  }

  test("pair calibration matches a driver-side bucket tally of the banded pairs") {
    val vecs = Tables.embeddings(spark, sf).select(
        col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorOps.dot_product(col("v"), col("v"))))
    val pairs = Similarity.lshPairsFor(vecs).collect()
      .filter(!_.isNullAt(2))
      .map(r => (r.getAs[Double]("cosine"), r.getAs[Boolean]("same_label")))
    val want = pairs.groupBy { case (c, _) => math.floor(c * 20).toInt }
      .map { case (b, ps) => b -> (ps.length.toLong, ps.count(_._2).toLong) }
    val rows = Similarity.simPairCalibration(spark, sf).collect()
    assert(rows.length == want.size && rows.nonEmpty)
    rows.foreach { r =>
      val (n, s) = want(r.getAs[Int]("bucket"))
      assert(r.getAs[Long]("n_pairs") == n)
      assert(r.getAs[Long]("n_same") == s)
      assert(r.getAs[Long]("same_ppm") == s * 1000000L / n)
    }
    // on THIS corpus labels are independent of geometry, so the curve
    // is flat near 1/|labels| — the report correctly measures "no
    // signal" (a real encoder's curve rises; the planted-dup fixtures
    // cover that regime elsewhere). Pin the flatness loosely:
    val mass = rows.map(r => (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_same")))
    val overall = mass.map(_._2).sum.toDouble / mass.map(_._1).sum
    assert(overall > 0.05 && overall < 0.2, s"overall same-label rate $overall")
  }

  test("nll deciles: balanced tiles, monotone bands, token mass conserved") {
    val rows = TextStats.textNllDeciles(spark, sf).collect()
    assert(rows.length == 10)
    val scoreable = TextStats.unigramNll(spark, sf)
      .filter(col("n_tokens") > 0)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == scoreable.count())
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1, s"unbalanced tiles: ${sizes.mkString(",")}")
    val tokTotal = scoreable.agg(sum(col("n_tokens"))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("tot_tokens")).sum == tokTotal)
    // band edges rise with the decile and contain the decile mean
    rows.sortBy(_.getAs[Int]("decile")).sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("max_nll") <= b.getAs[Double]("min_nll") + 1e-12)
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("decile_avg_nll") >= r.getAs[Double]("min_nll") - 1e-9)
      assert(r.getAs[Double]("decile_avg_nll") <= r.getAs[Double]("max_nll") + 1e-9)
    }
  }

  test("canonical dedup matches a plain-Scala canonicalization of the corpus") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def canon(s: String) =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
    val groups = docs.groupBy { case (_, t) => canon(t) }
    val byCanon = groups.map { case (c, ds) =>
      c -> (ds.length.toLong, ds.map(_._2).distinct.length.toLong, ds.map(_._1).min)
    }
    val rows = Dedup.canonical(spark, sf).collect()
    assert(rows.length == byCanon.size)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.length)
    val gotVariants = rows.map(r =>
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_raw_variants"),
        r.getAs[Long]("canonical_doc_id"))).sortBy(_._3)
    val wantVariants = byCanon.values.toArray.sortBy(_._3)
    assert(gotVariants.toSeq == wantVariants.toSeq)
    // canonicalization can only merge exact groups, never split
    assert(rows.length <= Dedup.exact(spark, sf).count())
  }
}
