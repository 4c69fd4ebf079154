package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.{Dedup, FuzzyJoin, Sampling, Similarity}

/** End-to-end LIBRARY-USER test: a miniature training-data curation
  * pipeline composed purely from the public operator APIs (no declared
  * query involved) — the "a user of the reference could switch to this
  * library" claim exercised as an integration, not per-operator:
  *
  *   consistent sample → quality gate → near-dup candidates →
  *   connected components → survivor selection → embedding attach →
  *   SRP similarity pairs + IVF neighbors + fuzzy lede matching over
  *   the survivors.
  *
  * Asserts the cross-operator INVARIANTS a pipeline author relies on:
  * stage outputs compose (schemas line up), dedup survivors are unique
  * per cluster, sampling is a subset, and every similarity pair points
  * at surviving docs. */
class LibraryPipelineSpec extends SparkTestBase {

  test("curation pipeline composes from the public library APIs") {
    val docs = graft.engine.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text", "lang")
    val total = docs.count()

    // 1. consistent 50% sample — rerun-stable admission by doc_id
    val sampled = docs.where(Sampling.admitted(50, col("doc_id")))
    val nSampled = sampled.count()
    assert(nSampled > 0 && nSampled < total)

    // 2. quality gate: token count bounds (map-only, like q44's gates)
    val gated = sampled.where(GraftFunctions.tokenCount(col("text")).between(3, 10000))
    assert(gated.count() > 0)

    // 3. near-dup candidate pairs (portable MinHash banding)
    val pairs = Dedup.minhashCandidates(gated, "doc_id", "text",
      numHashes = 16, bands = 4, bucketCap = 64, portable = true)
      .select("doc_a", "doc_b")

    // 4. transitive clusters → min-id survivor per cluster
    val survivors =
      if (pairs.isEmpty) gated.select(col("doc_id"))
      else {
        val labels = Dedup.connectedComponents(pairs, "doc_a", "doc_b", maxIter = 20)
        val drop = labels.where(col("node") =!= col("label"))
          .select(col("node").as("doc_id"))
        gated.select("doc_id").join(drop, Seq("doc_id"), "left_anti")
      }
    val nSurvivors = survivors.count()
    assert(nSurvivors > 0 && nSurvivors <= gated.count())

    // 5. attach embeddings to the surviving docs (multimodal join shape)
    val emb = graft.engine.Tables.table(spark, sfDir, "embeddings")
      .withColumnRenamed("vec_id", "doc_id")
    val enriched = survivors.join(emb, "doc_id")

    // 6. SRP-blocked similarity pairs over the curated corpus
    val sims = Similarity.srpBandedPairs(enriched, "doc_id", "embedding",
      threshold = 0.0, dim = 64)
    val survivorIds = survivors.collect().map(_.getLong(0)).toSet
    val simRows = sims.collect()
    assert(simRows.nonEmpty, "curated corpus should still have similar pairs")
    simRows.foreach { r =>
      assert(survivorIds.contains(r.getLong(0)) && survivorIds.contains(r.getLong(1)),
        "similarity pairs must reference only curated survivors")
      assert(r.getLong(0) < r.getLong(1))
    }

    // 7. ANN retrieval over the curated corpus (r05 ivfTopK): centroids
    // seeded from the 10 smallest surviving ids, 5 probe docs; every
    // neighbor must be a survivor and ranks must be dense from 1
    val centroids = enriched.orderBy("doc_id").limit(10)
      .select(col("doc_id").as("cid"),
        col("embedding").cast("array<double>").as("cv"))
    val probes = enriched.orderBy("doc_id").limit(5)
    val ann = Similarity.ivfTopK(enriched, probes, centroids,
      "doc_id", "embedding", k = 3, nprobe = 2).collect()
    assert(ann.nonEmpty, "IVF search over the curated corpus found nothing")
    ann.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length),
        "per-probe ranks must be dense from 1")
    }
    assert(ann.forall(r => survivorIds.contains(r.getLong(2))),
      "ANN neighbors must be curated survivors")

    // 8. fuzzy matching on the survivors' 2-token ledes (r05 FuzzyJoin):
    // lossless PassJoin candidates — spot-check symmetry + the distance
    // contract on whatever pairs the corpus yields
    val ledes = gated.select(
      concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("lede"))
    val fuzzy = FuzzyJoin.similarStringPairs(ledes, "lede", 2).collect()
    fuzzy.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs must be ordered")
      val d = r.getInt(2)
      assert(d >= 1 && d <= 2, s"dist out of contract: $d")
    }
  }
}
