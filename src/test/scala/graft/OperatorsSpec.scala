package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, Sessionize}

/** Edge-case tests for the library operators on hand-built micro-fixtures
  * (SURVEY §5.2.2): as-of no-match NULLs, strict inequality, tie handling;
  * session gap boundary semantics. */
class OperatorsSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("AsofJoin.left: strict earlier-than, no-match NULL, per-key isolation") {
    import spark.implicits._
    val purchases = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // exact-tie with a view → strict < excludes it
      (2L, 10L, ts("2024-01-01 12:00:00")), // matches the 10:00 view
      (3L, 20L, ts("2024-01-01 09:00:00")), // user 20 has no views → NULL
      (4L, 30L, ts("2024-01-01 08:00:00"))  // view exists but LATER → NULL
    ).toDF("event_id", "user_id", "ts")
    val views = Seq(
      (100L, 10L, ts("2024-01-01 10:00:00")),
      (101L, 30L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")

    val out = AsofJoin.left(purchases, views, on = "user_id",
      leftTs = "ts", rightTs = "ts", rightPayload = Map("ts" -> "view_ts"))
      .select("event_id", "view_ts").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap

    assert(out(1L).isEmpty, "tie at identical ts must NOT match (strict <)")
    assert(out(2L).contains(ts("2024-01-01 10:00:00")))
    assert(out(3L).isEmpty, "user with no right rows gets NULL")
    assert(out(4L).isEmpty, "later right rows must not match")
  }

  test("AsofJoin.left: picks the LATEST earlier right row, payload correct") {
    import spark.implicits._
    val left = Seq((1L, 5L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (200L, 5L, ts("2024-01-01 09:00:00")),
      (201L, 5L, ts("2024-01-01 11:30:00")), // the latest earlier
      (202L, 5L, ts("2024-01-01 11:59:59"))  // even later — this one wins
    ).toDF("event_id", "user_id", "ts")
    val out = AsofJoin.left(left, right, "user_id", "ts", "ts",
      Map("ts" -> "view_ts", "event_id" -> "view_id")).collect().head
    assert(out.getAs[Timestamp]("view_ts") == ts("2024-01-01 11:59:59"))
    assert(out.getAs[Long]("view_id") == 202L)
  }

  test("AsofJoin.left: duplicate (key, ts) right rows never mix payload columns") {
    // Regression for the per-column min() dedup: with two right rows at the
    // SAME (key, ts), the survivor must be ONE real row (the min_by struct
    // winner), never a synthetic row mixing columns from both.
    import spark.implicits._
    val left = Seq((1L, 5L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      // (id=300, tag="zzz") and (id=301, tag="aaa") at the same ts:
      // per-column min would fabricate (300, "aaa") — a row that exists
      // nowhere in the input
      (300L, "zzz", 5L, ts("2024-01-01 11:00:00")),
      (301L, "aaa", 5L, ts("2024-01-01 11:00:00"))
    ).toDF("view_id", "tag", "user_id", "ts")
    val out = AsofJoin.left(left, right, "user_id", "ts", "ts",
      Map("view_id" -> "view_id", "tag" -> "view_tag")).collect().head
    val got = (out.getAs[Long]("view_id"), out.getAs[String]("view_tag"))
    assert(got == (300L, "zzz") || got == (301L, "aaa"),
      s"payload columns mixed across right rows: $got")
  }

  test("Sessionize.byGap: boundary exactly at the gap stays in-session") {
    import spark.implicits._
    val gap = 600L // 10 min
    val df = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:10:00")), // exactly gap later → SAME session
      (3L, 7L, ts("2024-01-01 10:20:01")), // gap + 1s → NEW session
      (4L, 8L, ts("2024-01-01 10:00:00"))  // other key unaffected
    ).toDF("event_id", "user_id", "ts")
    val sessions = Sessionize.byGap(df, "user_id", "ts", gap, "event_id")
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sessions(1L) == sessions(2L), "gap boundary is inclusive (strict > starts new)")
    assert(sessions(3L) == sessions(2L) + 1)
    assert(sessions(4L) == 1L)
  }

  test("Sessionize.summarize matches manual session math") {
    import spark.implicits._
    val df = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 10:05:00")),
      (3L, 7L, ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = Sessionize.summarize(df, "user_id", "ts", 600, "event_id")
      .orderBy("session_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2 && out(0).getAs[Long]("dur_s") == 300)
    assert(out(1).getAs[Long]("n_events") == 1 && out(1).getAs[Long]("dur_s") == 0)
  }

  test("Packing.concatChunk: conservation, fill, chunk continuity") {
    import spark.implicits._
    import graft.operators.Packing
    // token counts chosen to straddle several 16-token sequences, incl. one
    // doc (40 toks) spanning 3+ sequences and a doc landing exactly on a
    // boundary
    val docs = (1L to 20L).map(i => (i, (i * 7 % 23 + 1).toInt)).toDF("doc_id", "n")
    val out = Packing.concatChunk(docs, "doc_id", "n", budget = 16, shards = 4)
      .collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    // every token of every doc lands in exactly one chunk
    val expected = (1L to 20L).map(i => i -> (i * 7 % 23 + 1)).toMap
    byDoc.foreach { case (id, rows) =>
      assert(rows.map(_.getAs[Long]("n_toks")).sum == expected(id), s"doc $id")
    }
    // chunk spans are within [0, budget) and non-empty
    out.foreach { r =>
      val (s, e) = (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"))
      assert(s >= 0 && e <= 16 && s < e, s"bad span [$s,$e)")
    }
    // within each (shard, seq), docs tile the sequence contiguously from 0
    // (except the shard's final partially-filled sequence, which still
    // starts at 0 and has no holes)
    out.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq")))
      .foreach { case ((sh, sq), rows) =>
        val spans = rows.sortBy(_.getAs[Long]("tok_start"))
          .map(r => (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end")))
        assert(spans.head._1 == 0, s"shard $sh seq $sq starts at ${spans.head._1}")
        spans.sliding(2).foreach {
          case Array((_, e1), (s2, _)) => assert(e1 == s2, s"hole in $sh/$sq")
          case _ =>
        }
      }
    // every sequence except each shard's last is filled to the budget
    val fills = out.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq")))
      .view.mapValues(_.map(_.getAs[Long]("n_toks")).sum).toMap
    val lastSeq = fills.keys.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    fills.foreach { case ((sh, sq), f) =>
      if (sq < lastSeq(sh)) assert(f == 16, s"underfilled $sh/$sq: $f") else assert(f <= 16)
    }
  }

  test("Clustering.kmeans: separates well-separated clusters, partition-order-free") {
    import spark.implicits._
    import graft.operators.Clustering
    // 3 tight blobs far apart; ids interleaved across blobs so the init
    // centroids (lowest 3 ids) start one-per-blob region
    val centers = Seq((0.0, 0.0), (100.0, 100.0), (-100.0, 100.0))
    val pts = (0 until 30).map { i =>
      val (cx, cy) = centers(i % 3)
      (i.toLong, Array(cx + (i % 5) * 0.1, cy + (i % 7) * 0.1))
    }
    val df = pts.toDF("id", "vec")
    val out = Clustering.kmeans(df, "id", "vec", k = 3, iters = 4)
      .select("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // all members of a blob land together, blobs land apart
    val byBlob = (0 until 30).groupBy(_ % 3).view.mapValues(_.map(i => out(i.toLong)).toSet)
    byBlob.foreach { case (b, cs) => assert(cs.size == 1, s"blob $b split: $cs") }
    assert(byBlob.values.map(_.head).toSet.size == 3, "blobs merged")
    // identical result under a different partitioning (micro-quantized sums
    // make the centroid means order-free)
    val out2 = Clustering.kmeans(df.repartition(7), "id", "vec", k = 3, iters = 4)
      .select("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == out2)
  }

  test("Sampling: thresholds nest, admission is partitioning-invariant, rate ~pct") {
    import graft.operators.Sampling
    val li = graft.engine.Tables.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey")
    def keys = Seq(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    val total = li.count()
    // subset-consistency: the 5% sample is CONTAINED in the 10% sample
    // (the property engine-RNG samplers lack — a curation pipeline can
    // grow its sample without invalidating what it already admitted)
    val n5 = li.where(Sampling.admitted(5, keys: _*)).count()
    val n10 = li.where(Sampling.admitted(10, keys: _*)).count()
    val n5notIn10 = li.where(Sampling.admitted(5, keys: _*)
      && !Sampling.admitted(10, keys: _*)).count()
    assert(n5notIn10 == 0, "5% sample must be a subset of the 10% sample")
    assert(n5 < n10 && n10 < total)
    assert(li.where(Sampling.admitted(100, keys: _*)).count() == total)
    assert(li.where(Sampling.admitted(0, keys: _*)).count() == 0)
    // partitioning-invariance: admission is a pure function of the key
    val repart = li.repartition(7).where(Sampling.admitted(10, keys: _*))
    assert(repart.count() == n10)
    assert(repart.exceptAll(li.where(Sampling.admitted(10, keys: _*))).count() == 0)
    // admission rate lands near the target (loose 3-sigma-ish bound)
    assert(math.abs(n10.toDouble / total - 0.10) < 0.02,
      s"10% sample admitted $n10 of $total")
    // r05 (ADVICE r04): NEGATIVE keys must hash into [0,100) like any
    // other — before the pmod fix a negative residue compared < pct at
    // every pct, silently admitting 100% of such rows
    import spark.implicits._
    val neg = (-1000L until 0L).toDF("k")
    val negPct = neg.select(Sampling.admissionPct(Seq(col("k"))).as("p"))
    assert(negPct.where(col("p") < 0 || col("p") >= 100).count() == 0,
      "admission percentile must stay in [0,100) for negative keys")
    val negN10 = neg.where(Sampling.admitted(10, col("k"))).count()
    assert(negN10 > 0 && negN10 < 300,
      s"negative keys must sample near the target rate, admitted $negN10/1000")
    // stratified: strata absent from the map are dropped entirely
    val docs = graft.engine.Tables.table(spark, sfDir, "documents")
    val strat = docs.where(Sampling.stratifiedAdmitted(col("lang"),
      Map("en" -> 100, "de" -> 0), col("doc_id")))
    val langs = strat.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en"), s"expected only en, got $langs")
  }

  test("BloomFilter: no false negatives; FP rate bounded; prefilter superset of exact") {
    import spark.implicits._
    import graft.operators.BloomFilter
    val members = (0L until 500L).map(_ * 3).toDF("k")     // 0,3,6,...
    val probes = (0L until 3000L).toDF("p")                 // 1/3 are members
    val bits = 64 * 256                                     // m=16384, n=500, k=5 → FP ~0.1%
    val passed = BloomFilter.semiFilter(probes, "p", members, "k", bits, 5)
      .as[Long].collect().toSet
    val truth = (0L until 3000L).filter(v => v % 3 == 0 && v < 1500).toSet
    assert(truth.subsetOf(passed), "false negative: a true member failed the bloom")
    val fps = passed -- truth
    assert(fps.size <= 30, s"FP rate too high: ${fps.size} of 2000 non-members passed")
  }
}
