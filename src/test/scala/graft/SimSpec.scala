package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.ml.Sim

/** Auto-dispatching similarity search (SURVEY.md §4 stretch: the
  * brute-force → IVF rewrite as a library function).
  */
class SimSpec extends AnyFunSuite with SparkFixture with Matchers {

  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("auto below threshold is exactly the brute-force result") {
    val brute = Sim.bruteTopK(emb, 5).collect()
    val auto = Sim.topK(emb, 5, auto = true, ivfThreshold = Long.MaxValue).collect()
    auto shouldBe brute
  }

  test("auto above threshold swaps to IVF and preserves >= 0.9 recall") {
    val brute = Sim.bruteTopK(emb, 5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // threshold 1 forces the IVF path; probing every cell makes the coarse
    // quantizer lossless, so the swap must preserve the exact neighbour set
    // (recall 1.0). Real deployments trade nprobe < nCells for speed.
    val swapped = Sim.topK(emb, 5, auto = true, ivfThreshold = 1,
        nCells = 16, nprobe = 16)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = swapped.intersect(brute).size.toDouble / brute.size
    recall should be >= 0.9
  }

  test("IVF-PQ recalls a useful fraction of exact neighbours from codes alone") {
    val brute = Sim.bruteTopK(emb, 5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ADC ranks candidates from compact codes; nprobe = nCells removes
    // coarse-probe loss so the measured recall isolates quantization error.
    // The synthetic corpus is near-random (no inter-dim correlation), the
    // WORST case for PQ — m=16 (4-dim subspaces, 64-bit codes) + a deeper
    // refine shortlist is what the hard case needs; structured real
    // embeddings do better at coarser settings
    val pq = Sim.ivfpqTopK(emb, 5, nCells = 16, nprobe = 16, m = 16,
        codebookK = 16, refine = 8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pq.intersect(brute).size.toDouble / brute.size
    info(f"IVF-PQ recall@5 vs exact: $recall%.3f")
    recall should be >= 0.7
  }

  test("IVF-PQ degenerates to the exact result when refine covers the corpus") {
    // nprobe = nCells → every item is a candidate; refine ≥ n/k → the ADC
    // shortlist keeps them all; the exact re-rank then IS brute force.
    // Quantization can only hurt SHORTLISTING, never the emitted sims —
    // this pins that boundary: ids/ranks exactly, sims to a tolerance
    // (the two paths compute cosine with different float orderings —
    // dot of pre-normalized vectors vs dot/(na*nb) — so bit-for-bit
    // Double equality would hinge on the 6-dp rounding landing the same
    // side of a boundary)
    val brute = Sim.bruteTopK(emb, 5).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val pq = Sim.ivfpqTopK(emb, 5, nCells = 16, nprobe = 16, refine = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    pq.map(t => (t._1, t._2, t._3)) shouldBe brute.map(t => (t._1, t._2, t._3))
    pq.zip(brute).foreach { case (p, b) => p._4 shouldBe (b._4 +- 1e-6) }
  }

  test("sampled quantizer training preserves the exact-at-boundary guarantee") {
    // maxTrainRows far below the corpus size forces the Bernoulli-sampled
    // fit path (the 100 TB posture: quantizers train on a bounded sample,
    // the full frame is only transformed). With nprobe = nCells the coarse
    // quantizer is lossless REGARDLESS of centroid quality, so a sampled
    // fit must still reproduce the exact neighbour set — sampling can move
    // centroids, never correctness at this boundary.
    val brute = Sim.bruteTopK(emb, 5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfS = Sim.ivfTopK(emb, 5, nCells = 16, nprobe = 16, maxTrainRows = 100)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    ivfS shouldBe brute
    val pqS = Sim.ivfpqTopK(emb, 5, nCells = 16, nprobe = 16, refine = 1000,
        maxTrainRows = 100)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pqS shouldBe brute
  }

  test("auto PQ tier adapts m to the embedding dimension") {
    import spark.implicits._
    // dim = 6: divisor search runs [2, min(pqM, dim/2)] = [2, 3] → m = 3
    // (2-dim subspaces) — the auto path must pick it instead of throwing
    // on dim % 8 != 0 (the fixed-m=8 failure mode)
    val rnd = new scala.util.Random(11)
    val d6 = (1 to 40).map(i => (i.toLong, Array.fill(6)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val hits6 = Sim.topK(d6, 3, auto = true, pqThreshold = 1, nCells = 4, nprobe = 4)
    hits6.count() should be > 0L
    // dim = 7 (prime): no divisor in [2, min(8, 3)] — the dim/2 cap is
    // what keeps m = dim (1-dim "subspaces", no product structure) out,
    // so this genuinely exercises the IVF fallback branch; must not throw
    val d7 = (1 to 40).map(i => (i.toLong, Array.fill(7)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val hits7 = Sim.topK(d7, 3, auto = true, pqThreshold = 1, nCells = 4, nprobe = 4)
    hits7.count() should be > 0L
  }

  test("IVF-PQ emitted sims are exact and rank-consistent") {
    val rows = Sim.ivfpqTopK(emb, 5, nCells = 16, nprobe = 16).collect()
    rows should not be empty
    // sims come from the exact refine (graft_dot over normalized vectors):
    // every emitted sim must equal the true cosine of the pair
    val vecs = emb.collect().map { r =>
      val e = r.getSeq[Float](1).map(_.toDouble).toArray
      r.getLong(0) -> e
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    rows.foreach { r =>
      val (a, rn, b, sim) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      math.abs(sim - cos(vecs(a), vecs(b))) should be < 1e-4
      rn should be >= 1L
    }
    // within each query the sims are non-increasing in rank
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      g.sortBy(_.getLong(1)).map(_.getDouble(3)).sliding(2).foreach {
        case Array(x, y) => x should be >= y - 1e-9
        case _ =>
      }
    }
  }

  test("LSH near-dup pairs: candidates cover every exact tau=0.4 pair") {
    // the sub-quadratic dedup_embed sibling: random-hyperplane signatures,
    // banded bucket join, exact cosine re-rank. With 16 bands × 2 bits the
    // analytic per-pair miss rate at sim = 0.4 (the hardest regime: p_bit
    // = 0.63) is (1 - 0.63²)^16 ≈ 3e-4, so the fixed-seed candidate set
    // must cover the exact pair set on this corpus.
    val exact = Sim.cosinePairs(emb, col("a_id") < col("b_id"))
      .where(col("sim") >= 0.4)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Sim.cosineLshPairs(emb, 0.4)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.diff(lsh) shouldBe empty
    // and re-ranking is exact: LSH never emits a below-threshold pair
    lsh.diff(exact) shouldBe empty
  }

  test("cosinePairsAuto: exact below the gate, LSH-equivalent above it") {
    val exact = Sim.cosinePairs(emb, col("a_id") < col("b_id"))
      .where(col("sim") >= 0.4)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // default gate (500k) keeps this corpus on the exact path
    val below = Sim.cosinePairsAuto(emb, 0.4)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    below shouldBe exact
    // gate 1 forces the LSH path; on this corpus the 16×2 bands' analytic
    // miss rate is ~3e-4 (see above), so the swap is set-identical too
    val above = Sim.cosinePairsAuto(emb, 0.4, lshThreshold = 1)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    above shouldBe exact
  }

  test("LSH signatures are deterministic for a fixed seed") {
    val a = Sim.cosineLshPairs(emb, 0.4, seed = 7L).collect().map(_.toString).sorted
    val b = Sim.cosineLshPairs(emb, 0.4, seed = 7L).collect().map(_.toString).sorted
    a shouldBe b
  }

  test("LSH: null head-row embedding, all-null corpus, and typed empty result") {
    // a null embedding in the FIRST row must not NPE the dimension probe —
    // the probe aggregates over non-null rows, so the result is identical
    // to the clean corpus (the null row is norm-filtered out anyway)
    val embType = emb.schema("embedding").dataType
    val nullRow = emb.limit(1)
      .select(lit(999999L).as("vec_id"), lit(null).cast(embType).as("embedding"))
    val spiked = nullRow.unionByName(emb)
    val clean = Sim.cosineLshPairs(emb, 0.4).collect().map(_.toString).sorted
    Sim.cosineLshPairs(spiked, 0.4).collect().map(_.toString).sorted shouldBe clean
    // an all-null corpus yields zero pairs, not a crash
    Sim.cosineLshPairs(nullRow, 0.4).count() shouldBe 0L
    // the empty result keeps vec_id's REAL type (int corpus → int ids)
    val intCorpus = emb.select(col("vec_id").cast("int").as("vec_id"), col("embedding"))
      .limit(0)
    val ep = Sim.cosineLshPairs(intCorpus, 0.4)
    ep.count() shouldBe 0L
    ep.schema("a_id").dataType shouldBe org.apache.spark.sql.types.IntegerType
    ep.schema("b_id").dataType shouldBe org.apache.spark.sql.types.IntegerType
  }

  test("LSH bucket cap bounds degenerate-corpus candidate fan-out") {
    import spark.implicits._
    // 30 identical embeddings: every signature is identical, so every band
    // collapses into ONE bucket of size 30 — the degenerate-boilerplate
    // shape whose pair fan-out is quadratic. A cap below the bucket size
    // must bound candidate volume to zero (documented recall loss applies
    // to over-cap buckets only); at the default cap the exact quadratic
    // pair set comes back.
    val dup = (1 to 30).map(i => (i.toLong, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    Sim.cosineLshPairs(dup, 0.4, maxBucket = 10).count() shouldBe 0L
    Sim.cosineLshPairs(dup, 0.4).count() shouldBe (30L * 29 / 2)
  }

  test("IVF path ranks are internally consistent (sim non-increasing)") {
    Sim.topK(emb, 5, auto = true, ivfThreshold = 1).collect()
      .groupBy(_.getLong(0)).foreach { case (_, rows) =>
        val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
        byRank.sliding(2).foreach {
          case Array(hi, lo) => hi should be >= lo
          case _ =>
        }
      }
  }
}
