package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** g01 fixed-point PageRank: structural properties that must hold for
  * ANY input graph, beyond the oracle's value equality.
  */
class GraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("g01 ranks are positive, bounded, and totally ordered") {
    val out = Graph.g01.fn(spark, dir).collect()
    assert(out.length == 50)
    // every rank at least the undamped floor 0.15 (in 1e-12 units)
    assert(out.forall(_.getLong(2) >= 150000000000L))
    // result order is the declared total order (rank desc, id asc)
    val pairs = out.map(r => (r.getLong(2), r.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy(p => (-p._1, p._2))))
  }

  test("g01 conserves total mass up to the documented rounding loss") {
    // the FULL rank table (no top-50 slice): total mass must equal
    // N·MassUnit minus only the documented truncation losses. Per
    // round the loss is < E_directed (one sub-degree remainder per
    // source node, spread over its edges) + 100·N (the damping
    // division); the 0.85 factor geometric-sums that to < ~7×, so
    // 10·(E + 100·N) is a safely conservative envelope. Anything
    // outside it means a broken damping constant, an overflow, or a
    // leak — exactly the regressions this pin exists to catch.
    val full = Graph.fulfilmentRanks(spark, dir)
    val total = full.agg(sum("r")).head.getLong(0)
    val n = full.count()
    val li = graft.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey")
    val o = graft.Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val eDirected = 2L * li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().count()
    val bound = 10L * (eDirected + 100L * n)
    val dev = math.abs(total - n * Graph.MassUnit)
    assert(dev <= bound,
      s"total mass $total deviates from ${n * Graph.MassUnit} by $dev > $bound")
    // the truncation loss is real (degrees are non-uniform, so the
    // integer divisions genuinely discard remainders)
    assert(total < n * Graph.MassUnit)
  }

  test("g02 personalization concentrates mass on the seed set") {
    val out = Graph.g02.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getLong(3)))
    assert(out.length == 30)
    // sf0.001 has two seed suppliers (suppkey 0 and 5): they must own
    // the head of the personalized ranking, far above every non-seed
    val (seeds, rest) = out.partition(_._3)
    assert(seeds.map(_._1).toSet == Set(10000000L, 10000005L))
    assert(seeds.map(_._4).min > 3L * rest.map(_._4).max,
      "teleport mass must separate seeds from the damped-flow tail")
    // and the flag is consistent with the arithmetic membership rule
    assert(out.forall(r => r._3 == (r._1 >= 10000000L && (r._1 - 10000000L) % 5 == 0)))
  }

  test("g03 triangle counts are closed-form exact on K4 and a path") {
    import spark.implicits._
    // K4: every node has degree 3 and sits in C(3,2) = 3 triangles
    val k4 = (for { a <- 0L to 3L; b <- (a + 1) to 3L } yield (a, b))
      .toDF("da", "db")
    val outK4 = Graph.triangleCounts(k4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(outK4.toSeq == Seq((0L, 3L, 3L), (1L, 3L, 3L),
      (2L, 3L, 3L), (3L, 3L, 3L)))
    // a path has wedges but zero triangles — the closing-edge join
    // must prune every wedge, not count them
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("da", "db")
    assert(Graph.triangleCounts(path).count() == 0L)
    // K4 plus a pendant vertex: the pendant joins no triangle and
    // must be absent from the output (not present with a zero count)
    val pendant = k4.union(Seq((3L, 9L)).toDF("da", "db"))
    val outP = Graph.triangleCounts(pendant).collect()
    assert(!outP.map(_.getLong(0)).contains(9L))
    assert(outP.length == 4)
  }

  test("g10 clustering coefficients are closed-form exact on K4, a path, and a pendant") {
    import spark.implicits._
    // K4: deg 3, 3 triangles, 3 wedges → lcc = 1.0 everywhere
    val k4 = (for { a <- 0L to 3L; b <- (a + 1) to 3L } yield (a, b))
      .toDF("da", "db")
    val outK4 = Graph.clusteringCoefficients(k4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(outK4.toSeq == Seq((0L, 3L, 3L, 3L, 1.0), (1L, 3L, 3L, 3L, 1.0),
      (2L, 3L, 3L, 3L, 1.0), (3L, 3L, 3L, 3L, 1.0)))
    // a path: interior nodes have a wedge but no triangle — they must
    // APPEAR with lcc = 0 (the left join is the point; g03 drops them)
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("da", "db")
    val outP = Graph.clusteringCoefficients(path).collect()
      .map(r => (r.getLong(0), r.getDouble(4))).sortBy(_._1)
    assert(outP.toSeq == Seq((1L, 0.0), (2L, 0.0)))
    // K4 + pendant on node 3: node 3's degree rises to 4 → 6 wedges,
    // still 3 triangles → lcc = 0.5; the degree-1 pendant is excluded
    val pendant = k4.union(Seq((3L, 9L)).toDF("da", "db"))
    val outPen = Graph.clusteringCoefficients(pendant).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(!outPen.map(_._1).contains(9L))
    assert(outPen.find(_._1 == 3L).contains((3L, 6L, 0.5)))
    assert(outPen.filter(_._1 < 3L).forall(_._3 == 1.0))
  }

  test("g03 per-node counts triple-count each triangle on the corpus") {
    val out = Graph.g03.fn(spark, dir).collect()
    assert(out.nonEmpty)
    // Σ per-node counts = 3 × (total triangles): every triangle lands
    // on exactly its three corners, no more, no fewer
    assert(out.map(_.getLong(2)).sum % 3 == 0)
    // membership in a triangle needs degree ≥ 2
    assert(out.forall(_.getLong(1) >= 2L))
    // declared total order
    val pairs = out.map(r => (r.getLong(2), r.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy(p => (-p._1, p._2))))
  }

  test("g04 peeling is closed-form exact on K4+path, a cycle, and a path") {
    import spark.implicits._
    // K4 with a pendant path 3–9–10: the path peels away (9 and 10
    // never reach degree 2 once the tail is gone), leaving exactly K4
    // with all degrees 3 — converged well within the round budget
    val k4 = (for { a <- 0L to 3L; b <- (a + 1) to 3L } yield (a, b))
      .toDF("da", "db")
    val g = k4.union(Seq((3L, 9L), (9L, 10L)).toDF("da", "db"))
    val out = Graph.kcorePeel(g, 2, Graph.KcoreRounds).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq == Seq((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
    // a cycle IS its own 2-core: nothing peels, degrees stay 2
    val c5 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 4L))
      .toDF("da", "db")
    val outC = Graph.kcorePeel(c5, 2, Graph.KcoreRounds).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(outC.toSeq == (0L to 4L).map(i => (i, 2L)))
    // a 5-path fully peels within the budget (2 rounds from each end)
    val p5 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("da", "db")
    assert(Graph.kcorePeel(p5, 2, Graph.KcoreRounds).count() == 0L)
    // the documented NON-converged case: a path longer than 2·rounds
    // still has its middle intact after the budget — the fixed-round
    // contract, not a bug; a fixpoint loop would finish the job
    val long = (0L until 12L).map(i => (i, i + 1)).toDF("da", "db")
    assert(Graph.kcorePeel(long, 2, Graph.KcoreRounds).count() > 0L)
  }

  test("g04 corpus core keeps only nodes of degree ≥ k with cycles") {
    val out = Graph.g04.fn(spark, dir).collect()
    assert(out.nonEmpty, "sf0.001 near-dup cliques must survive the 2-core")
    // converged on this corpus: every survivor holds core degree ≥ 2
    assert(out.forall(_.getLong(1) >= 2L))
    // the 2-core is a subgraph of the triangle-bearing node set's
    // closure: every g03 triangle corner survives 2-core peeling
    // (a triangle is itself a 2-core)
    val tri = Graph.g03.fn(spark, dir).collect().map(_.getLong(0)).toSet
    val core = out.map(_.getLong(0)).toSet
    assert(tri.subsetOf(core))
    // declared total order
    val ids = out.map(_.getLong(0))
    assert(ids.sameElements(ids.sorted))
  }

  test("g05 hop distances respect bipartite parity and the seed set") {
    val out = Graph.g05.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    // distance 0 ⇔ exactly the every-5th suppliers (the g02 seed rule)
    val seeds = out.filter(_._3 == 0L).map(_._1).toSet
    assert(seeds == Set(10000000L, 10000005L))
    // the fulfilment graph is bipartite: customers sit at ODD hops
    // from any supplier seed, suppliers at EVEN — a wrong edge
    // direction or an off-by-one in the propagation breaks parity
    assert(out.forall { case (_, tpe, d) =>
      if (tpe == "supplier") d % 2 == 0 else d % 2 == 1
    })
    // nothing beyond the round budget; order is the declared total
    assert(out.forall(_._3 <= Graph.BfsRounds))
    val keys = out.map(r => (r._3, r._1))
    assert(keys.sameElements(keys.sortBy(identity)))
  }

  test("g01 supplier hubs outrank customers on the fulfilment graph") {
    val out = Graph.g01.fn(spark, dir).collect()
    // the graph is bipartite with ~10x more customers than suppliers:
    // every supplier has ~10x the degree, so the head of the ranking
    // must be all suppliers (degree dominates a damped walk)
    assert(out.take(10).forall(_.getString(1) == "supplier"))
  }

  test("g06 Adamic–Adar is closed-form exact and the hub cap binds") {
    import spark.implicits._
    val w2 = math.round(1e12 / math.log(2.0))
    val w3 = math.round(1e12 / math.log(3.0))
    // part 100: {1,2} (d=2); part 200: {1,2,3} (d=3); part 300: a hub
    // with 21 customers (over the cap — contributes NOTHING); part
    // 400: degree 1 (below the band)
    val e = (Seq((1L, 100L), (2L, 100L), (1L, 200L), (2L, 200L), (3L, 200L), (4L, 400L))
      ++ (1L to 21L).map(c => (c, 300L)))
      .toDF("c", "p")
    val out = Graph.adamicAdar(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      (1L, 2L) -> ((2L, w2 + w3)),
      (1L, 3L) -> ((1L, w3)),
      (2L, 3L) -> ((1L, w3))),
      s"got $out")
  }

  test("g07 weighted distances dominate hop counts and share g05's reachable set") {
    val hops = Graph.g05.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val wd = Graph.g07.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(wd.nonEmpty)
    // same rounds, same seeds, same graph → identical reachable set
    assert(wd.map(_._1).toSet == hops.keySet)
    wd.foreach { case (id, tpe, d) =>
      // every edge weighs ≥ 1, so the weighted distance can never be
      // below the hop count; seeds stay at exactly 0
      assert(d >= hops(id), s"node $id: weighted $d < hops ${hops(id)}")
      if (hops(id) == 0L) assert(d == 0L && tpe == "supplier")
      // bipartite parity survives weighting: suppliers at even hops
      assert((hops(id) % 2 == 0) == (tpe == "supplier"), s"node $id")
    }
    // the weights are not degenerate: some node is strictly farther
    // in cost than in hops
    assert(wd.exists { case (id, _, d) => d > hops(id) })
  }

  test("g08 LP is closed-form exact on two bridged triangles") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} joined by the bridge 3–4: three
    // synchronous majority rounds settle each triangle on one label
    // (hand-traced: {1,2,3}→1, {4,5,6}→3) and the bridge must NOT
    // merge them — the distinction from g05's min-flooding, which
    // would collapse both into label 1
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.labelPropagation(pairs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), s"got $out")
  }

  test("g08 corpus communities are plural, disjoint by construction, and capped") {
    val rows = Graph.g08.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length > 1 && rows.length <= 50)
    // sizes are ordered, representatives are distinct and ≤ community
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    assert(rows.map(_._3).distinct.length == rows.length)
  }

  test("g09 modularity is closed-form exact: Q=1/2 on two cliques, Q=0 on one") {
    import spark.implicits._
    def q(rows: Array[org.apache.spark.sql.Row]): Double =
      rows.map(_.getDouble(5)).sum
    // two disjoint K3s with the perfect 2-community partition:
    // m=6, each community e_c=3, d_c=6 → per-community contribution
    // (4·6·3 − 36)/(4·36) = 1/4, Q = 1/2 — the disconnected-cliques
    // maximum for equal halves
    val two = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("src", "dst")
    val lblTwo = Graph.labelPropagation(two, 3) // settles per-clique
    val rTwo = Graph.modularity(two, lblTwo, 6L).collect()
    assert(rTwo.length == 2)
    rTwo.foreach { r =>
      assert(r.getLong(1) == 3L && r.getLong(2) == 3L && r.getLong(3) == 6L)
      assert(r.getLong(4) == 36L && r.getDouble(5) == 0.25)
    }
    assert(q(rTwo) == 0.5)
    // one K4 as a single community: e_c = m, d_c = 2m → q_num =
    // 4m² − 4m² = 0 → Q = 0 (a one-block partition is never better
    // than random, however dense)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val oneLbl = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)).toDF("id", "lbl")
    val rOne = Graph.modularity(k4, oneLbl, 6L).collect()
    assert(rOne.length == 1 && rOne.head.getLong(4) == 0L && q(rOne) == 0.0)
  }

  test("g09 corpus readout reconciles with g08's partition and the edge count") {
    val rows = Graph.g09.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // degree mass sums to 2m and internal edges never exceed m
    val m2 = rows.map(_._4).sum
    val mInternal = rows.map(_._3).sum
    assert(m2 % 2 == 0 && mInternal <= m2 / 2)
    // per-community identity: q_num = 4m·e_c − d_c², contribution is
    // exactly q_num / 4m²
    val m = m2 / 2
    rows.foreach { case (_, _, ec, dc, qn, qc) =>
      assert(qn == 4L * m * ec - dc * dc)
      assert(qc == qn.toDouble / (4L * m * m).toDouble)
    }
    // LP genuinely beats a random partition (Q = 0): 0.12 on this
    // tiny sf0.001 graph, 0.48 at sf0.1 — the floor pins the sign
    // and real margin without overfitting the corpus size
    assert(rows.map(_._6).sum > 0.05, s"Q = ${rows.map(_._6).sum}")
  }

  /** Symmetrize an undirected edge list for [[Graph.assortativityOf]]. */
  private def sym(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    (edges ++ edges.map { case (a, b) => (b, a) }).toDF("src", "dst")
  }

  test("g11 closed forms: star K1,3 -> -1, 4-path -> -0.5") {
    // star: center 0, leaves 1..3. Degrees (3,1,1,1); every edge pairs
    // a hub with a leaf -> perfectly disassortative.
    val star = Graph.assortativityOf(sym(Seq((0L, 1L), (0L, 2L), (0L, 3L))))
      .head()
    assert(star.getLong(0) == 6 && star.getLong(1) == 18 &&
      star.getLong(2) == 12 && star.getLong(3) == 30)
    assert(star.getDouble(4) == -1.0)
    // path 0-1-2-3: degrees (1,2,2,1); by hand n=6, sxy=16, sx=10,
    // sxx=18 -> r = (96-100)/(108-100) = -0.5
    val path = Graph.assortativityOf(
      sym(Seq((0L, 1L), (1L, 2L), (2L, 3L)))).head()
    assert(path.getLong(0) == 6 && path.getLong(1) == 16 &&
      path.getLong(2) == 10 && path.getLong(3) == 18)
    assert(path.getDouble(4) == -0.5)
  }

  test("g12 closed forms: end-pivot path scores 1/1, 1/2, 1/3; two pivots sum") {
    import spark.implicits._
    // path 0-1-2-3, pivot {0}: dist(1)=1, dist(2)=2, dist(3)=3 —
    // harmonic_nano = the shared round(1e9/d) literals; the pivot
    // itself is absent (no dist >= 1 row)
    val ue = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    val one = Graph.harmonicFrom(ue, Seq(0L).toDF("id"), 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(one == Map(
      1L -> ((1L, 1000000000L)),
      2L -> ((1L, 500000000L)),
      3L -> ((1L, 333333333L))))
    // pivots at BOTH ends: interior nodes sum contributions from each
    // pivot independently (node 1: 1/1 + 1/2; node 2: 1/2 + 1/1);
    // each end node sees only the other end at 1/3
    val two = Graph.harmonicFrom(ue, Seq(0L, 3L).toDF("id"), 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(two == Map(
      0L -> ((1L, 333333333L)),
      1L -> ((2L, 1500000000L)),
      2L -> ((2L, 1500000000L)),
      3L -> ((1L, 333333333L))))
  }

  test("g11 regular graph (zero degree variance) -> NULL, not NaN") {
    // 4-cycle: every degree is 2, so the Pearson denominator
    // n·Σx²−(Σx)² is exactly 0 — assortativity is undefined and the
    // NULLIF guard must emit NULL (NaN would diverge from DuckDB's
    // division semantics in the shared oracle text)
    val cyc = Graph.assortativityOf(
      sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))).head()
    assert(cyc.getLong(0) == 8)
    assert(cyc.isNullAt(4), "regular graph must yield NULL assortativity")
  }

  test("g11 corpus row is self-consistent and strongly disassortative") {
    val r = Graph.g11.fn(spark, dir).head()
    val (n, sxy, sx, sxx) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // symmetrized edge list: n is even, statistics positive
    assert(n > 0 && n % 2 == 0 && sxy > 0 && sx > 0 && sxx >= sx)
    // Cauchy-Schwarz: n·sxy ≤ n·sxx (degree products can't beat squares
    // on a symmetric list) and the coefficient reproduces the integers
    assert(r.getDouble(4) ==
      (n * sxy - sx * sx).toDouble / (n * sxx - sx * sx).toDouble)
    // bipartite hub-and-spoke commerce graph: firmly negative
    assert(r.getDouble(4) < -0.5, s"r = ${r.getDouble(4)}")
  }
}
