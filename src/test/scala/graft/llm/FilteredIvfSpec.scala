package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins FILTERED-IVF retrieval (r19, VERDICT #7): the metadata
  * predicate composes INTO the probed-list scan —
  *
  *  - PRE-FILTER semantics: every served neighbor satisfies the
  *    predicate, and k still fills when enough allowed vectors live in
  *    the probed lists (post-probe filtering would under-fill);
  *  - the index is REAL: an allowed vector outside the probed lists is
  *    never a candidate, even when it would out-rank the served set;
  *  - on a planted-cluster fixture the filtered scan reaches
  *    recall@k = 1.0 vs the FILTERED brute baseline at NProbe ≪ K.
  *
  * Fixture: the IvfPruningSpec geometry (16 planted clusters, exact
  * directions as centroids) with an even/odd allowed-set. */
class FilteredIvfSpec extends SparkSpec {
  import spark.implicits._

  private val Dims = Similarity.Dims
  private val K = 16
  private val MembersPerCluster = 12
  private val Queries = 6
  private val NProbe = 2
  private val TopK = 5
  private val CentroidBase = 100

  private def noise(salt: String, i: Int): Float = {
    val md = MessageDigest.getInstance("MD5")
    val h = md.digest(s"$salt|$i".getBytes("UTF-8"))
    (((h(0) & 0xff) / 255.0 - 0.5) * 0.3).toFloat
  }

  private def base(k: Int): Array[Float] =
    Array.tabulate(Dims)(i => if (i / 4 == k) 1.0f else 0.0f)

  private def member(k: Int, salt: String): Array[Float] = {
    val b = base(k)
    Array.tabulate(Dims)(i => b(i) + noise(salt, i))
  }

  private lazy val vectors: Seq[(Long, Array[Float])] =
    (0 until Queries).map(q => q.toLong -> member(q, s"q$q")) ++
      (0 until K).map(k => (CentroidBase + k).toLong -> base(k)) ++
      (for (k <- 0 until K; m <- 0 until MembersPerCluster)
        yield (200L + k * MembersPerCluster + m) -> member(k, s"m$k|$m"))

  /** Allowed ids: EVEN member ids only (queries/centroids excluded —
    * candidates come from the member population). */
  private lazy val allowedIds: Set[Long] =
    vectors.map(_._1).filter(id => id >= 200L && id % 2 == 0).toSet

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

  /** Filtered brute baseline: exact top-k over the allowed set. */
  private lazy val filteredBrute: Map[Long, Seq[Long]] = {
    val all = vectors.toMap
    (0 until Queries).map { q =>
      val qv = all(q.toLong)
      q.toLong -> vectors
        .filter { case (id, _) => id != q.toLong && allowedIds.contains(id) }
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(TopK).map(_._1).toSeq
    }.toMap
  }

  private lazy val idx = Similarity
    .ivfIndexOf(vectors.toDF("vec_id", "embedding"),
      CentroidBase, K, Queries, NProbe)
    .persist()

  private lazy val served: Map[Long, Seq[Long]] = Similarity
    .filteredIvfTopKOf(idx,
      allowedIds.toSeq.toDF("vec_id"), Queries, NProbe, TopK)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    .groupBy(_._1)
    .map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2).toSeq }

  test("every served neighbor satisfies the predicate; k fills") {
    (0L until Queries.toLong).foreach { q =>
      val got = served.getOrElse(q, Seq.empty)
      assert(got.size == TopK, s"query $q must fill k, got ${got.size}")
      assert(got.forall(allowedIds.contains),
        s"query $q served a filtered-out neighbor: $got")
    }
  }

  test("clustered fixture: filtered recall@k = 1.0 vs the filtered brute") {
    val hits = (0L until Queries.toLong).map { q =>
      served(q).count(filteredBrute(q).contains)
    }.sum
    assert(hits == Queries * TopK,
      s"expected perfect filtered recall on planted clusters, " +
        s"got $hits/${Queries * TopK}")
  }

  test("the filter composes INTO the index: unprobed lists never serve") {
    // candidates must come from the query's NProbe probed lists only:
    // an allowed vector assigned to an UNPROBED list is absent even
    // when its cosine would rank (build a probe map from the index)
    val assigned = idx.where(col("rn") === 1)
      .select("vec_id", "cent_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = idx.where(col("rn") <= NProbe && col("vec_id") < Queries)
      .select("vec_id", "cent_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    (0L until Queries.toLong).foreach { q =>
      served(q).foreach(n =>
        assert(probed(q).contains(assigned(n)),
          s"query $q served $n from an unprobed list — the predicate " +
            "was applied post-scan, not composed into it"))
    }
  }
}
