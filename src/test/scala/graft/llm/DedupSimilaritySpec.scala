package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioral tests for the LLM-pipeline operators (beyond the
  * oracle-parity gate): dedup finds what it should on hand-built corpora,
  * LSH recall against brute force, hash-parity sanity. */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("hash64 matches the documented DuckDB construction on a known value") {
    // md5('abc') = 900150983cd24fb0... → first 15 hex = 0x900150983cd24fb
    val got = Seq("abc").toDF("s").select(Text.hash64(col("s"))).collect().head.getLong(0)
    assert(got == java.lang.Long.parseLong("900150983cd24fb", 16))
    assert(got == 648541476951500027L) // cross-checked in DuckDB
  }

  test("shingles: distinct word k-grams, empty below k tokens") {
    val r = Seq("a b c d", "a b", "x x x x").toDF("t")
      .select(Text.shingles(col("t"), 3).as("sh")).collect()
    assert(r(0).getSeq[String](0).toSet == Set("a b c", "b c d"))
    assert(r(1).getSeq[String](0).isEmpty)
    assert(r(2).getSeq[String](0) == Seq("x x x")) // distinct
  }

  test("exact dedup groups identical texts under one canonical id") {
    val docs = Seq((1L, "same text here"), (2L, "same text here"), (3L, "different"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = Dedup.exact(spark, dir).collect()
    assert(out.length == 2)
    val dupGroup = out.find(_.getLong(2) == 2L).get
    assert(dupGroup.getLong(1) == 1L) // canonical = min doc_id
  }

  test("ngram Jaccard and MinHash-LSH agree on sf0.001") {
    val exhaustive = Dedup.ngramJaccard(spark, sf001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(spark, sf001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exhaustive)) // LSH+verify can only return true pairs
    assert(lsh == exhaustive) // at J≥0.5 with 16×4 banding, misses are ~impossible
  }

  test("simhash chunk banding is pigeonhole-EXACT for hamming ≤ 3") {
    // brute-force ground truth from the signatures themselves: every pair
    // at hamming ≤ 3 MUST be found by the 4×15-bit chunk join (a pair can
    // only differ in ≤3 chunks), and nothing else may appear
    val sigs = Dedup.simhashSignatures(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= Dedup.HammingThreshold
    } yield (ia, ib)).toSet
    val banded = Dedup.simhashPairs(spark, sf001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute)
    assert(brute.nonEmpty) // planted near-dups exist at this sf
  }

  test("simhash catches most very-high-Jaccard pairs (approximate by design)") {
    val nearDups = Dedup.ngramJaccard(spark, sf001)
      .where(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val simPairs = Dedup.simhashPairs(spark, sf001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val coverage = (nearDups & simPairs).size.toDouble / nearDups.size
    assert(coverage >= 0.5, s"coverage=$coverage") // 60-bit simhash @ hd≤3
  }

  test("ANN-LSH is sound: correct rerank, bucket-rule candidates, no self") {
    // NB: this corpus has no tight clusters (max off-diagonal cosine ≈0.5),
    // so recall@5 on effectively-random vectors is not a meaningful metric;
    // what must hold is soundness of the candidate generation + rerank.
    val bruteCos = Similarity.bruteTopK(spark, sf001)
    val ann = Similarity.annLshTopK(spark, sf001).collect()
    assert(ann.nonEmpty)
    ann.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ranks = rows.map(_.getInt(3)).sorted
      assert(ranks.sameElements(1 to rows.length)) // dense ranks from 1
      val cosines = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.sameElements(cosines.sortBy(-_))) // descending
    }
    assert(ann.forall(r => r.getLong(1) != r.getLong(0))) // no self-match
    // rerank uses the exact cosine: any (q,n) pair that brute force also
    // ranked must carry the identical rounded cosine
    val bruteMap = bruteCos.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ann.forall { r =>
      bruteMap.get((r.getLong(0), r.getLong(1)))
        .forall(_ == r.getDouble(2))
    })
  }

  test("cosine: self-similarity rounds to exactly 1.0") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet").limit(5)
    val r = e.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(_.getDouble(0))
    assert(r.forall(_ == 1.0))
  }

  test("multimodal decode is deterministic; stub and real tiers both present") {
    val f1 = Multimodal.features(spark, sf001).collect()
    val f2 = Multimodal.features(spark, sf001).collect()
    assert(f1.sameElements(f2))
    val (ppm, stub) = f1.partition(_.getString(1) == "image/ppm")
    assert(ppm.nonEmpty && stub.nonEmpty)
    // stub tier: fake-dimension ranges, no channel stats
    assert(stub.forall { r =>
      val w = r.getLong(4); val h = r.getLong(5)
      w >= 320 && w < 640 && h >= 240 && h < 480 && r.isNullAt(7)
    })
    // real tier: parsed PPM header dims + actual channel means (pixel
    // payload is ASCII text '.'-padded, so means land in the byte range)
    assert(ppm.forall { r =>
      r.getLong(4) == Multimodal.PpmWidth && r.getLong(6) == 1L &&
        r.getDouble(7) > 0 && r.getDouble(7) < 256
    })
  }
}
