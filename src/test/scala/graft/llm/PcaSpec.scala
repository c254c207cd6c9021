package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Pca]]: on a planted fixture whose variance is concentrated on
  * one axis, power iteration recovers that axis (component ≈ ±1 there,
  * ≈ 0 elsewhere) and the Rayleigh eigenvalue ≈ the planted variance;
  * on real corpus data the result is a unit vector with a sane
  * variance-explained share, and the operator is deterministic. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("planted dominant axis is recovered with its variance") {
    // 8-dim rows: dim 3 swings ±10 (variance 100); dim 5 swings ±1
    // (variance 1); everything else constant (variance 0)
    val rows = (0 until 40).map { k =>
      val s3 = if (k % 2 == 0) 10.0f else -10.0f
      val s5 = if (k % 4 < 2) 1.0f else -1.0f
      (k.toLong, Array(0.5f, 0f, 0f, s3, 0f, s5, 0f, 0.25f).toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
    val out = Pca.pcaPowerOf(e, dims = 8).orderBy(col("pos")).collect()
    assert(out.length == 8)
    val comp = out.map(_.getDouble(1))
    assert(math.abs(math.abs(comp(3)) - 1.0) < 1e-4,
      s"dominant axis not found: ${comp.toSeq}")
    comp.zipWithIndex.filter(_._2 != 3).foreach { case (c, i) =>
      assert(math.abs(c) < 1e-3, s"non-dominant axis $i got weight $c")
    }
    val eig = out.head.getDouble(2)
    assert(math.abs(eig - 100.0) < 0.1, s"eigenvalue $eig != planted 100")
    // variance explained = 100 / (100 + 1) up to the tiny rounding terms
    assert(math.abs(out.head.getDouble(3) - 100.0 / 101.0) < 1e-3)
  }

  test("abtt removes the dominant axis: coeff = planted swing, residual = the rest") {
    val rows = (0 until 40).map { k =>
      val s3 = if (k % 2 == 0) 10.0f else -10.0f
      val s5 = if (k % 4 < 2) 1.0f else -1.0f
      (k.toLong, Array(0.5f, 0f, 0f, s3, 0f, s5, 0f, 0.25f).toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
    val out = Pca.abttOf(e, Pca.pcaPowerOf(e, dims = 8)).collect()
    assert(out.length == 40)
    out.foreach { r =>
      // projection onto the (±) dominant axis is the ±10 swing of dim 3;
      // what survives removal is exactly dim 5's ±1 swing
      assert(math.abs(math.abs(r.getDouble(1)) - 10.0) < 1e-3,
        s"coeff ${r.getDouble(1)}")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-3,
        s"residual ${r.getDouble(2)}")
    }
  }

  test("corpus result is a unit vector with var_explained in (0, 1]") {
    val out = Pca.pcaPower(spark, sf001).collect()
    assert(out.length == Similarity.Dims)
    val norm = math.sqrt(out.map(r => r.getDouble(1) * r.getDouble(1)).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"not unit: $norm")
    val ve = out.head.getDouble(3)
    assert(ve > 0.0 && ve <= 1.0, s"var_explained $ve out of range")
    assert(out.map(_.getDouble(2)).distinct.length == 1, "eigenvalue not replicated")
  }

  test("deflation recovers the planted top-3 axes in variance order") {
    // dims 3, 5, 6 carry variance 100, 25, 4; everything else constant
    val rows = (0 until 40).map { k =>
      val s3 = if (k % 2 == 0) 10.0f else -10.0f
      val s5 = if (k % 4 < 2) 5.0f else -5.0f
      val s6 = if (k % 8 < 4) 2.0f else -2.0f
      (k.toLong, Array(0.5f, 0f, 0f, s3, 0f, s5, s6, 0.25f).toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
    val out = Pca.pcaTopDOf(e, dims = 8).collect()
    assert(out.length == 24)
    val byComp = out.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1))).toMap
    val wantAxis = Map(1L -> 3, 2L -> 5, 3L -> 6)
    val wantEig = Map(1L -> 100.0, 2L -> 25.0, 3L -> 4.0)
    for (k <- 1L to 3L) {
      val comp = byComp(k).map(_.getDouble(2))
      assert(math.abs(math.abs(comp(wantAxis(k))) - 1.0) < 1e-3,
        s"component $k missed axis ${wantAxis(k)}: ${comp.toSeq}")
      val eig = byComp(k).head.getDouble(3)
      assert(math.abs(eig - wantEig(k)) < 0.1,
        s"component $k eigenvalue $eig != ${wantEig(k)}")
    }
    // var_explained shares a single denominator: ratios match eigenvalues
    val ve = (1L to 3L).map(k => byComp(k).head.getDouble(4))
    assert(math.abs(ve(0) / ve(1) - 4.0) < 0.05, s"ve ratio: $ve")
  }

  test("corpus top-3 directions are pairwise orthogonal, eigenvalues ordered") {
    val out = Pca.pcaTopD(spark, sf001).collect()
    assert(out.length == 3 * Similarity.Dims)
    val vs = (1L to 3L).map(k =>
      out.filter(_.getLong(0) == k).sortBy(_.getLong(1))
        .map(_.getDouble(2)))
    vs.foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"not unit: $n")
    }
    for (a <- 0 until 3; b <- a + 1 until 3) {
      val dot = vs(a).zip(vs(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 1e-3, s"v${a + 1}·v${b + 1} = $dot")
    }
    // the corpus spectrum is near-flat (max var_explained ~2.4 %), so 8
    // truncated power rounds leave convergence error comparable to the
    // eigen-gaps — small ordering inversions between adjacent components
    // are expected and honest (the planted fixture pins STRICT ordering
    // where a real gap exists); pin that no component is grossly out of
    // place and all are positive
    val eigs = (1L to 3L).map(k =>
      out.filter(_.getLong(0) == k).head.getDouble(3))
    assert(eigs.forall(_ > 0.0), s"non-positive eigenvalue: $eigs")
    for (i <- 0 until 2)
      assert(eigs(i) >= eigs(i + 1) * 0.9,
        s"eigenvalue inversion beyond convergence tolerance: $eigs")
  }
}
