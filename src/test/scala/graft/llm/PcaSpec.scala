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
}
