package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.Similarity

/** Adversarial embeddings corpus: zero vectors (NaN cosines), exact
  * duplicates, and a corpus smaller than the IVF centroid count / top-k
  * depth. Every embeddings-path query must run and stay sane — the
  * synthetic testdata can't produce any of these.
  */
class EdgeEmbeddingsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  lazy val edgeDir: String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_eemb").toString
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(k => ((seed * 31 + k * 7) % 13 - 6) / 6.0f)
    val rows = Seq(
      (0L, Array.fill(64)(0.0f), "a"),          // zero vector: nrm = 0
      (1L, vec(1), "a"),
      (2L, vec(1), "b"),                        // exact duplicate of 1
      (3L, vec(3), "b"),
      (4L, vec(4), "a"))                        // corpus n=5 < k=8, < top-10
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private val embQueries = Seq("sim_topk_bruteforce", "sim_ann_lsh",
    "sim_ann_ivf", "sim_pairs_threshold", "dedup_embedding",
    "sim_label_centroids",
    // r10: range counting over the zero-vector corpus (NULL cosines
    // drop out of every >= tau filter), assortativity on a 5-node graph
    "sim_range_search", "knn_assortativity",
    // r11 (ADVICE): NULL cosines inside the hard-negative ranking window
    "sim_hard_negatives")

  test("every embeddings-path query survives the adversarial corpus") {
    embQueries.foreach { k =>
      val n = SparkEntry.queries(k)(spark, edgeDir).count()
      assert(n >= 0, k)
    }
  }

  test("zero-vector cosines are NULL and never rank above real neighbors") {
    val topk = Similarity.topkBruteforce(spark, edgeDir).collect()
    // the duplicate pair must rank each other first with cosine 1.0
    val d1 = topk.filter(_.getAs[Long]("query_id") == 1L)
      .sortBy(_.getAs[Int]("rank"))
    assert(d1.head.getAs[Long]("neighbor_id") == 2L)
    assert(d1.head.getAs[Double]("cosine") == 1.0)
    // no NaN anywhere; pairs involving the zero vector are NULL, and
    // NULLs sort after real cosines (desc default) so a real neighbor
    // holds rank 1 wherever one exists
    topk.foreach { r =>
      val c = r.getAs[Any]("cosine")
      assert(c == null || !c.asInstanceOf[Double].isNaN, r.toString)
    }
    val q1rank1 = topk.filter(r => r.getAs[Long]("query_id") == 1L &&
      r.getAs[Int]("rank") == 1).head
    assert(q1rank1.getAs[Any]("cosine") != null)
  }

  test("ivf on a corpus smaller than k still assigns and ranks") {
    val out = Similarity.annIvf(spark, edgeDir).collect()
    assert(out.nonEmpty)
    // every query gets at most n-1 neighbors, ranks contiguous from 1
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.sameElements(1 to ranks.length))
      assert(ranks.length <= 4)
    }
  }

  test("pq distortion survives a degenerate corpus (zero vectors, duplicates)") {
    // sim_pq_distortion requires >= pqK seed vectors BY DESIGN (a short
    // codebook would corrupt the flat-tensor stride — it fails loudly),
    // so its adversarial corpus is a second dir: 20 vectors, four of
    // them all-zero (degenerate subspace centroids that collapse onto
    // each other) and two exact-duplicate pairs
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_eemb_pq").toString
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(k => ((seed * 31 + k * 7) % 13 - 6) / 6.0f)
    val rows = (0L to 19L).map { i =>
      val v = if (i % 5 == 0) Array.fill(64)(0.0f)       // 4 zero vectors
              else if (i == 2L || i == 7L) vec(1)        // duplicate pair
              else vec(i.toInt)
      (i, v, if (i % 2 == 0) "a" else "b")
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("sim_pq_distortion")(spark, dir).collect()
    assert(out.length == 16) // one row per subspace, even degenerate ones
    out.foreach { r =>
      val mse = r.getAs[Any]("mse")
      assert(mse != null && !mse.asInstanceOf[Double].isNaN &&
        mse.asInstanceOf[Double] >= 0.0, r.toString)
    }
  }

  test("exact-duplicate pair is found by the banded LSH dedup") {
    val pairs = Similarity.dedupEmbedding(spark, edgeDir).collect()
    // identical vectors share every band -> always a candidate, cosine 1.0
    assert(pairs.exists(r => r.getAs[Long]("vec_id_a") == 1L &&
      r.getAs[Long]("vec_id_b") == 2L && r.getAs[Double]("cosine") == 1.0))
  }
}
