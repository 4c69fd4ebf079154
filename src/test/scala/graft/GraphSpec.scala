package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/**
 * Semantics of the graph library (q139 family). The oracle parity run
 * proves Spark ≡ DuckDB on the engine binding; these prove the MATH is
 * the intended PageRank — via an independent plain-Scala reimplementation
 * of the integer-scaled iteration on a seeded random graph (the q127
 * pattern: guards against the engine and the oracle sharing a misreading),
 * plus structural sanity (mass conservation bound, in-link dominance).
 */
class GraphSpec extends SparkTestBase {

  private def edgesDf(edges: Seq[(Int, Int, Long)]) = {
    import spark.implicits._
    edges.toDF("src", "dst", "w")
  }

  /** Plain-Scala twin of Graph.pagerank's integer arithmetic. */
  private def referencePagerank(edges: Seq[(Int, Int, Long)], iters: Int,
      d: Int): Map[Int, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = ((100L - d) * Graph.Scale) / (100L * n)
    var r: Map[Int, Long] = nodes.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .map { case (s, t, w) => t -> (r(s) * w) / outw(s) }
        .groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2).sum }
      r = nodes.map(v => v -> (base + (d * contrib.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("pagerank matches an independent reimplementation on a random graph") {
    val rnd = new scala.util.Random(4242)
    val raw = Seq.fill(60)((rnd.nextInt(12), rnd.nextInt(12), (rnd.nextInt(5) + 1).toLong))
      .filter { case (s, t, _) => s != t }
    // collapse duplicate (src,dst) pairs the way the engine's edge agg would
    val edges = raw.groupBy(e => (e._1, e._2))
      .map { case ((s, t), es) => (s, t, es.map(_._3).sum) }.toSeq
    val got = Graph.pagerank(edgesDf(edges), iters = 3, d = 85)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = referencePagerank(edges, iters = 3, d = 85)
    assert(got === want)
  }

  test("a chain concentrates rank downstream; total mass stays bounded") {
    val edges = Seq((1, 2, 1L), (2, 3, 1L))
    val r = Graph.pagerank(edgesDf(edges), iters = 3, d = 85)
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r(3) > r(2) && r(2) > r(1))
    // Dangling mass (node 3 has no out-edges) leaks, so total ≤ Scale.
    assert(r.values.sum <= Graph.Scale)
  }

  test("an extra in-link raises rank, all else equal") {
    // 1 and 2 are symmetric targets of 3; adding 4 -> 1 must rank 1 above 2.
    val edges = Seq((3, 1, 1L), (3, 2, 1L), (4, 1, 1L))
    val r = Graph.pagerank(edgesDf(edges), iters = 3, d = 85)
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r(1) > r(2))
  }

  /** Plain-Scala twin of Graph.personalizedPagerank's integer arithmetic. */
  private def referencePpr(edges: Seq[(Int, Int, Long)], seeds: Set[Int],
      iters: Int, d: Int): Map[Int, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val bSeed = ((100L - d) * Graph.Scale) / (100L * seeds.size)
    def b(v: Int) = if (seeds(v)) bSeed else 0L
    var r: Map[Int, Long] =
      nodes.map(v => v -> (if (seeds(v)) Graph.Scale / seeds.size else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .map { case (s, t, w) => t -> (r(s) * w) / outw(s) }
        .groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2).sum }
      r = nodes.map(v => v -> (b(v) + (d * contrib.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("personalized pagerank matches an independent reimplementation") {
    import spark.implicits._
    val rnd = new scala.util.Random(1717)
    val raw = Seq.fill(70)((rnd.nextInt(14), rnd.nextInt(14), (rnd.nextInt(4) + 1).toLong))
      .filter { case (s, t, _) => s != t }
    val edges = raw.groupBy(e => (e._1, e._2))
      .map { case ((s, t), es) => (s, t, es.map(_._3).sum) }.toSeq
    val seedSet = Set(2, 5, 11)
    val got = Graph.personalizedPagerank(edgesDf(edges),
        seedSet.toSeq.toDF("v"), iters = 3, d = 85)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = referencePpr(edges, seedSet, iters = 3, d = 85)
    assert(got === want)
  }

  test("the library is node-type generic: string ids rank identically to ints") {
    import spark.implicits._
    val intEdges = Seq((1, 2, 3L), (2, 3, 1L), (3, 1, 2L), (1, 3, 1L))
    val strEdges = intEdges.map { case (s, t, w) => (s"n$s", s"n$t", w) }
    val ri = Graph.pagerank(intEdges.toDF("src", "dst", "w"))
      .collect().map(r => s"n${r.getInt(0)}" -> r.getLong(1)).toMap
    val rs = Graph.pagerank(strEdges.toDF("src", "dst", "w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ri === rs)
  }

  test("shortestPaths matches an independent BFS on a random graph; bounds hold") {
    import spark.implicits._
    val rnd = new scala.util.Random(909)
    val edges = Seq.fill(40)((rnd.nextInt(15), rnd.nextInt(15)))
      .filter { case (s, t) => s != t }.distinct.map { case (s, t) => (s, t, 1L) }
    val sources = Set(0, 7)
    val got = Graph.shortestPaths(edges.toDF("src", "dst", "w"),
        sources.toSeq.toDF("v"), maxHops = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // reference BFS, capped at 3 hops
    var dist = sources.map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val next = edges.flatMap { case (s, t, _) =>
        dist.get(s).map(d => t -> (d + 1)) }
        .groupBy(_._1).map { case (t, ds) => t -> ds.map(_._2).min }
      dist = (dist.keySet ++ next.keySet)
        .map(v => v -> math.min(dist.getOrElse(v, Long.MaxValue),
          next.getOrElse(v, Long.MaxValue))).toMap
    }
    assert(got === dist)
    assert(got.values.forall(d => d >= 0 && d <= 3))
    assert(sources.forall(s => !got.contains(s) || got(s) == 0L))
  }

  test("shortestPaths edge cases: zero hops returns the sources; empty sources reach nothing") {
    import spark.implicits._
    val edges = Seq((1, 2, 1L), (2, 3, 1L)).toDF("src", "dst", "w")
    val zero = Graph.shortestPaths(edges, Seq(1, 7).toDF("v"), maxHops = 0)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(zero === Map(1 -> 0L, 7 -> 0L))
    val none = Graph.shortestPaths(edges, Seq.empty[Int].toDF("v"), maxHops = 3)
    assert(none.count() === 0L)
  }

  test("pagerank is partitioning-invariant (integer arithmetic, no float accumulation)") {
    // The determinism contract: scaled-BIGINT ranks with integer division
    // must be bit-identical regardless of how the edge list is split.
    val edges = Seq((1, 2, 3L), (2, 3, 1L), (3, 1, 2L), (1, 3, 1L), (4, 1, 5L))
    val one = Graph.pagerank(edgesDf(edges).repartition(1))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val many = Graph.pagerank(edgesDf(edges).repartition(7))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(one === many)
  }

  test("oversized edge weights fail loudly instead of silently overflowing ranks") {
    // r07 (ADVICE r06 #3): rank·w < 2^63 was a doc-comment contract only;
    // an oversized weight silently overflowed Long and corrupted every
    // rank on BOTH engines (the oracle shares the arithmetic, so parity
    // held while the results were meaningless). Now it's enforced.
    import spark.implicits._
    val edges = Seq((1, 2, Graph.MaxEdgeWeight + 1), (2, 1, 1L)).toDF("src", "dst", "w")
    val ex = intercept[IllegalArgumentException](Graph.pagerank(edges))
    assert(ex.getMessage.contains("headroom"))
    val ex2 = intercept[IllegalArgumentException](
      Graph.personalizedPagerank(edges, Seq(1).toDF("v")))
    assert(ex2.getMessage.contains("headroom"))
  }

  test("personalized pagerank: rank mass stays in the seeds' reach") {
    // two disconnected components; seeding in one must leave the other at 0
    val edges = Seq((1, 2, 1L), (2, 1, 1L), (10, 11, 1L), (11, 10, 1L))
    import spark.implicits._
    val r = Graph.personalizedPagerank(edgesDf(edges), Seq(1).toDF("v"),
        iters = 3, d = 85)
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r(1) > 0 && r(2) > 0)
    assert(r(10) === 0L && r(11) === 0L)
  }

  test("shortestPaths releases dead frontier blocks eagerly (r08)") {
    // Each hop localCheckpoints a frontier; without eager RDD-level
    // release those blocks linger until GC + ContextCleaner (which in a
    // short-lived test — and in a memory-pressured production round —
    // has not run). After an 8-hop run only the FINAL frontier's
    // checkpoint plus the tracked edge cache may remain registered.
    import spark.implicits._
    val sc = spark.sparkContext
    graft.engine.CacheReaper.release()
    val before = sc.getPersistentRDDs.keySet
    val edges = (0L until 8L).map(i => (i, i + 1, 1L)).toDF("src", "dst", "w")
    val d = graft.operators.Graph.shortestPaths(
      edges.select("src", "dst"), Seq(0L).toDF("v"), maxHops = 8)
    assert(d.count() === 9)
    val added = sc.getPersistentRDDs.keySet -- before
    // unreleased would leave ≥ 9 frontier RDDs; released leaves the final
    // frontier + the edge cache (≤ 3 allows for an internal split)
    assert(added.size <= 3,
      s"dead frontiers not released: ${added.size} new persistent RDDs")
    graft.engine.CacheReaper.release()
  }
}
