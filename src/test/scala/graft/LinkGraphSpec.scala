package graft

import org.apache.spark.sql.functions._
import graft.operators.LinkGraph

/** Link-graph PageRank: hand-computed references, exact-vs-production
  * parity, dangling-mass conservation, hub ordering.
  */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of the leaky recurrence, summed in src order
    * like pageRankExact.
    */
  private def refRanks(
      n: Int, edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val outdeg = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.size.toDouble }
    var r = (0L until n).map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(_._1).sorted
          .foldLeft(0.0)((acc, s) => acc + r(s) / outdeg(s))
      }
      r = (0L until n).map(id =>
        id -> ((1.0 - d) / n + d * in.getOrElse(id, 0.0))).toMap
    }
    r
  }

  private def rankMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap

  test("two-node cycle holds the uniform fixed point exactly") {
    val nodes = Seq(0L, 1L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val got = rankMap(LinkGraph.pageRankExact(nodes, edges, iters = 7))
    assert(got.values.forall(r => math.abs(r - 0.5) < 1e-15), got)
  }

  test("exact ranks bit-match the driver-side reference recurrence") {
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 0L), (3L, 0L), (2L, 1L),
      (3L, 2L)).map { case (a, b) => (a, b) }
    val nodes = (0L until 4).toDF("id")
    val got = rankMap(
      LinkGraph.pageRankExact(nodes, edges.toDF("src", "dst"),
        iters = 5, damping = 0.85))
    val want = refRanks(4, edges, 5, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, r) =>
      assert(r == want(id), s"node $id: got $r want ${want(id)}") }
  }

  test("hub out-ranks its spokes") {
    // 1..9 all link to 0; 0 links back to 1. The 0↔1 two-cycle makes
    // ranks oscillate with period 2 (damped by 0.85/iter), so use
    // enough iterations for the swing to settle under the hub's lead.
    val edges = ((1L to 9L).map(s => (s, 0L)) :+ (0L, 1L))
      .toDF("src", "dst")
    val nodes = (0L until 10).toDF("id")
    val got = rankMap(LinkGraph.pageRankExact(nodes, edges, iters = 15))
    assert((1L to 9L).forall(s => got(0L) > got(s)), got)
  }

  test("production flavor matches exact on a dangling-free graph") {
    val nodes = (0L until 20).toDF("id")
    val edges = (0L until 20).flatMap(s =>
      Seq((s, (s * 3 + 1) % 20), (s, (s * 5 + 2) % 20)))
      .toDF("src", "dst")
    val exact = rankMap(LinkGraph.pageRankExact(nodes, edges, iters = 5))
    val prod = rankMap(LinkGraph.pageRank(nodes, edges, iters = 5,
      redistributeDangling = false))
    exact.foreach { case (id, r) =>
      assert(math.abs(r - prod(id)) < 1e-12, s"node $id: $r vs ${prod(id)}")
    }
  }

  test("dangling redistribution conserves total mass at ~1") {
    // node 3 has no out-edges: leaky total < 1, redistributed total ~ 1
    val nodes = (0L until 4).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))
      .toDF("src", "dst")
    val leaky = rankMap(LinkGraph.pageRank(nodes, edges, iters = 8,
      redistributeDangling = false)).values.sum
    val full = rankMap(LinkGraph.pageRank(nodes, edges, iters = 8,
      redistributeDangling = true)).values.sum
    assert(leaky < 0.95, s"leaky total $leaky should lose dangling mass")
    assert(math.abs(full - 1.0) < 1e-9, s"redistributed total $full")
  }

  test("harmonic centrality: exact small-graph values when balls " +
    "stay under k") {
    // path 0 -> 1 -> 2: C_H(0)=0, C_H(1)=1/1, C_H(2)=1/1 + 1/2
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = LinkGraph.harmonicCentrality(nodes, edges,
      rounds = 3, k = 64).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) == 0.0, got)
    assert(got(1L) == 1.0, got)
    assert(got(2L) == 1.5, got)
  }

  test("harmonic centrality: the pointed-at hub dominates") {
    // 1..9 -> 0 (distance 1 each): C_H(0) = 9; spokes get only 0's
    // back-link contribution
    val nodes = (0L until 10).toDF("id")
    val edges = ((1L to 9L).map(s => (s, 0L)) :+ (0L, 1L))
      .toDF("src", "dst")
    val got = LinkGraph.harmonicCentrality(nodes, edges,
      rounds = 3, k = 64).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((1L to 9L).forall(s => got(0L) > got(s)), got)
    assert(got(0L) == 9.0, got) // all reachers at distance 1, exact
  }

  test("harmonic centrality: k-truncated sketches stay within " +
    "estimator tolerance of the exact run") {
    val n = 60
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n.toLong).flatMap(s =>
      Seq((s, (s * 3 + 1) % n), (s, (s * 5 + 2) % n), (s, (s + 7) % n)))
      .toDF("src", "dst")
    val exact = LinkGraph.harmonicCentrality(nodes, edges,
      rounds = 4, k = 1024).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sk = LinkGraph.harmonicCentrality(nodes, edges,
      rounds = 4, k = 16).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // k=16 KMV: rel. error ~1/sqrt(k-2) per ball; harmonic sums a few
    // balls, allow a generous band but require correlation
    exact.foreach { case (id, ex) =>
      assert(math.abs(sk(id) - ex) <= math.max(3.0, ex * 0.6),
        s"node $id: sketch ${sk(id)} vs exact $ex")
    }
  }

  test("label propagation: two disjoint triangles collapse to their " +
    "min labels and never mix") {
    val nodes = (0L until 6).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (3L, 4L), (4L, 5L), (5L, 3L)).toDF("src", "dst")
    val got = LinkGraph.labelPropagation(nodes, edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(0L, 1L, 2L).map(got) == Set(0L), got)
    assert(Set(3L, 4L, 5L).map(got) == Set(3L), got)
  }

  test("label propagation: isolated node keeps its own label; " +
    "tie breaks to the smaller label") {
    val nodes = (0L until 4).toDF("id")
    // node 2 hears labels {0, 1} once each -> tie -> 0
    val edges = Seq((0L, 2L), (1L, 2L)).toDF("src", "dst")
    val got = LinkGraph.labelPropagation(nodes, edges, iters = 1,
      undirected = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) == 0L, got)
    assert(got(3L) == 3L, got) // no neighbors: self carry-through
  }

  test("triangleCounts: known shapes — triangle, square, star, " +
    "isolated node; direction/duplicates ignored") {
    val nodes = (0L until 8).toDF("id")
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L),   // triangle 0-1-2
      (1L, 0L),                        // reverse dup: no double count
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 3L), // square: no triangles
      (0L, 7L)).toDF("src", "dst")     // pendant on 0
    val got = LinkGraph.triangleCounts(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 0L,
      4L -> 0L, 5L -> 0L, 6L -> 0L, 7L -> 0L), got)
  }

  test("triangleCounts: K4 gives each node 3 of the 4 triangles") {
    val nodes = (0L until 4).toDF("id")
    val edges = (for (a <- 0L until 4; b <- 0L until 4 if a < b)
      yield (a, b)).toDF("src", "dst")
    val got = LinkGraph.triangleCounts(nodes, edges).collect()
      .map(r => r.getLong(1))
    assert(got.forall(_ == 3L), got.toSeq)
  }

  test("kCore: cascading peel — a pendant chain hanging off a " +
    "clique peels over successive rounds") {
    // K4 clique 0-3 (internal degree 3) + chain 3-4-5
    val nodes = (0L until 6).toDF("id")
    val clique = for (a <- 0L until 4; b <- 0L until 4 if a < b)
      yield (a, b)
    val edges = (clique ++ Seq((3L, 4L), (4L, 5L))).toDF("src", "dst")
    val got = LinkGraph.kCore(nodes, edges, k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // 5 peels (deg 1), then 4 (deg 1 after), clique survives at k=3
    assert((0L until 4).forall(got(_)), got)
    assert(!got(4L) && !got(5L), got)
  }

  test("kCore: k above max degree empties the core; duplicates and " +
    "direction do not inflate degree") {
    val nodes = (0L until 3).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L)).toDF("src", "dst")
    val none = LinkGraph.kCore(nodes, edges, k = 3, rounds = 2)
      .filter(col("in_core")).count()
    assert(none == 0L)
    val all2 = LinkGraph.kCore(nodes, edges, k = 1, rounds = 2)
      .filter(col("in_core")).count()
    assert(all2 == 3L)
  }


  test("clusteringCoefficient: K4 nodes at 1.0, ring nodes at 0, " +
    "low-degree NULL") {
    val nodes = (0L until 8).toDF("id")
    val k4 = for (a <- 0L until 4; b <- 0L until 4 if a < b)
      yield (a, b)
    // ring 4-5-6, pendant 7 (degree 1 -> NULL)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L), (6L, 4L), (0L, 7L)))
      .toDF("src", "dst")
    val got = LinkGraph.clusteringCoefficient(nodes, edges).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L) == Some(1.0) && got(2L) == Some(1.0), got)
    // node 0: deg 4 (K4 + pendant), 3 triangles -> 6/12 = 0.5
    assert(got(0L) == Some(0.5), got)
    assert(got(4L) == Some(1.0)) // triangle 4-5-6
    assert(got(7L) == None, got) // degree 1
  }


  test("reciprocityRatio: mutual pair at 1.0, one-way chain at 0, " +
    "mixed node at 0.5, no-outlink node NULL") {
    val nodes = (0L until 5).toDF("id")
    val edges = Seq(
      (0L, 1L), (1L, 0L),  // mutual pair
      (0L, 2L),            // one-way: node 0 is mixed (1 of 2 mutual)
      (2L, 3L)).toDF("src", "dst") // 3 has no outlinks -> NULL
    val got = LinkGraph.reciprocityRatio(nodes, edges).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got(0L) == ((2L, 1L, Some(0.5))), got)
    assert(got(1L) == ((1L, 1L, Some(1.0))), got)
    assert(got(2L) == ((1L, 0L, Some(0.0))), got)
    assert(got(3L) == ((0L, 0L, None)), got)
    assert(got(4L) == ((0L, 0L, None)), got) // isolated
  }

  test("degreeAssortativity: star is perfectly disassortative (-1), " +
    "constant-degree ring is NULL") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = LinkGraph.degreeAssortativity(star).head()
    assert(r.getAs[Long]("n_nodes") == 4L)
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Long]("r_micro") == -1000000L, r)
    // ring of 4: every degree is 2 → zero variance → NULL
    val ring = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .toDF("src", "dst")
    assert(LinkGraph.degreeAssortativity(ring).head().isNullAt(2))
  }

  test("modularity: two triangles bridged by one edge score the " +
    "hand Q terms; a random-cut assignment scores lower") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L),
      (5L, 3L), (2L, 3L)).toDF("src", "dst")
    // natural split: each community has e_in=3, d_tot=7, m=7 →
    // Q_c = 3/7 − (7/14)² = 0.178571...
    val good = (0L to 5L).map(i => (i, i / 3)).toDF("id", "community")
    val gm = LinkGraph.modularity(edges, good).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(gm == Map(0L -> 178571L, 1L -> 178571L), gm)
    // parity split cuts both triangles: strictly worse total Q
    val bad = (0L to 5L).map(i => (i, i % 2)).toDF("id", "community")
    val bq = LinkGraph.modularity(edges, bad).collect()
      .map(_.getLong(4)).sum
    assert(bq < 2 * 178571L, bq)
  }

  test("hitsPathCounts: hand-computed two-round path counts on a " +
    "co-citation wedge; self-loops and duplicate edges collapse") {
    val nodes = (0L until 5).toDF("id")
    // 1→2, 3→2, 2→4, plus a self-loop and a duplicate to be dropped
    val edges = Seq((1L, 2L), (1L, 2L), (3L, 2L), (2L, 4L), (4L, 4L))
      .toDF("src", "dst")
    val got = LinkGraph.hitsPathCounts(nodes, edges, rounds = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // round 1: h=(1:1, 3:1, 2:1); a=(2:2, 4:1)
    // round 2: h=(1:2, 3:2, 2:1); a=(2:4, 4:1)
    assert(got(1L) == ((2L, 0L)), got)
    assert(got(3L) == ((2L, 0L)), got)
    assert(got(2L) == ((1L, 4L)), got)
    assert(got(4L) == ((0L, 1L)), got)
    assert(got(0L) == ((0L, 0L)), got) // isolated
  }

  test("checkpointEvery truncates lineage without changing ranks") {
    val nodes = (0L until 12).toDF("id")
    val edges = (0L until 12).map(s => (s, (s * 7 + 1) % 12))
      .toDF("src", "dst")
    val plain = rankMap(LinkGraph.pageRank(nodes, edges, iters = 6,
      redistributeDangling = false))
    val ckpt = rankMap(LinkGraph.pageRank(nodes, edges, iters = 6,
      redistributeDangling = false, checkpointEvery = 2))
    plain.foreach { case (id, r) =>
      assert(math.abs(r - ckpt(id)) < 1e-12, s"node $id") }
  }

  test("hitsPathCounts: a hub whose degree would overflow 64-bit " +
    "path counts trips the guard loudly instead of wrapping") {
    val n = 260
    val nodes = (0L until n.toLong).toDF("id")
    // star: 1..259 -> 0, so max degree 259 and 259^8 > 2^63 at rounds=4
    val edges = (1L until n.toLong).map(s => (s, 0L)).toDF("src", "dst")
    val err = intercept[IllegalArgumentException] {
      LinkGraph.hitsPathCounts(nodes, edges, rounds = 4)
    }
    assert(err.getMessage.contains("overflow"), err.getMessage)
    // the same graph at rounds=2 (259^4 << 2^63) runs fine
    val ok = LinkGraph.hitsPathCounts(nodes, edges, rounds = 2)
      .filter(col("id") === 0L).head()
    assert(ok.getLong(2) > 0L)
  }

  test("iterative ops keep O(1) persisted frames across a 10-round " +
    "run — superseded rounds unpersist once the next materializes") {
    val sc = spark.sparkContext
    val nodes = (0L until 40).toDF("id")
    val edges = (0L until 40L).flatMap(s =>
      Seq((s, (s * 7 + 1) % 40), (s, (s + 13) % 40))).toDF("src", "dst")
    def leaked(body: => org.apache.spark.sql.DataFrame): Int = {
      val before = sc.getPersistentRDDs.size
      body.count()
      sc.getPersistentRDDs.size - before
    }
    // each op may leave its FINAL round (and a static edge frame)
    // cached for the returned frame — but never one frame per round
    assert(leaked(LinkGraph.pageRank(nodes, edges, iters = 10)) <= 2)
    assert(leaked(LinkGraph.labelPropagation(nodes, edges,
      iters = 10)) <= 2)
    assert(leaked(LinkGraph.kCore(nodes, edges, k = 2,
      rounds = 10)) <= 3)
    assert(leaked(LinkGraph.hitsPathCounts(nodes, edges,
      rounds = 3)) <= 3)
    assert(leaked(LinkGraph.harmonicCentrality(nodes, edges,
      rounds = 10, k = 8)) <= 1)
  }

  test("personalized PageRank: mass restarts onto the seeds — nodes " +
    "unreachable from any seed rank exactly 0, and seeding EVERY node " +
    "reproduces the uniform-teleport exact ranks") {
    // two disjoint 2-cycles: {0,1} and {2,3}; seed only node 0
    val nodes = (0L until 4).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val got = rankMap(LinkGraph.personalizedPageRankExact(
      nodes, edges, seeds, iters = 6))
    assert(got(2L) == 0.0 && got(3L) == 0.0, got)
    assert(got(0L) > got(1L), got) // the seed holds the teleport mass
    assert(math.abs(got.values.sum - 1.0) < 1e-9, got) // no dangling
    // seeding every node = uniform restart = plain exact PageRank
    val all = rankMap(LinkGraph.personalizedPageRankExact(
      nodes, edges, nodes, iters = 6))
    val plain = rankMap(LinkGraph.pageRankExact(nodes, edges, iters = 6))
    plain.foreach { case (id, r) =>
      assert(r == all(id), s"node $id: $r vs ${all(id)}") }
  }

  test("personalized PageRank: duplicate seed ids and seeds outside " +
    "the node set neither double-count rank nor leak teleport mass; " +
    "an all-unknown seed set fails loudly") {
    val nodes = (0L until 4).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val clean = rankMap(LinkGraph.personalizedPageRankExact(
      nodes, edges, Seq(0L).toDF("id"), iters = 6))
    // the ppr-CLI shape: an arbitrary seeds parquet with duplicates
    // and ids not present in the edge-derived node set
    val messy = Seq(0L, 0L, 0L, 99L, 77L).toDF("id")
    val got = rankMap(LinkGraph.personalizedPageRankExact(
      nodes, edges, messy, iters = 6))
    assert(got == clean, s"$got != $clean")
    assert(math.abs(got.values.sum - 1.0) < 1e-9, got)
    assert(got.size == 4, got) // no duplicated node rows
    intercept[IllegalArgumentException] {
      LinkGraph.personalizedPageRankExact(
        nodes, edges, Seq(99L).toDF("id"), iters = 6)
    }
  }

  test("pageRank tol-based early stop matches the fixed-round result " +
    "once converged, and never changes tol=0 semantics") {
    val nodes = (0L until 12).toDF("id")
    val edges = (0L until 12).map(s => (s, (s * 7 + 1) % 12))
      .toDF("src", "dst")
    // 50 fixed rounds ≈ the fixed point; tol run must land there too
    val fixed = rankMap(LinkGraph.pageRank(nodes, edges, iters = 50))
    val early = rankMap(LinkGraph.pageRank(nodes, edges, iters = 50,
      tol = 1e-12))
    fixed.foreach { case (id, r) =>
      assert(math.abs(r - early(id)) < 1e-9, s"node $id") }
    // a loose tol stops well before the ceiling — ranks differ from
    // the fixed point but are still a valid distribution (~1 mass)
    val loose = rankMap(LinkGraph.pageRank(nodes, edges, iters = 50,
      tol = 0.2))
    assert(math.abs(loose.values.sum - 1.0) < 1e-9)
  }
}
