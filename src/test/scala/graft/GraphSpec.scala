package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** T1 unit coverage for operators/Graph (pageRank). */
class GraphSpec extends SparkSpec {

  test("pageRank: a 3-cycle is stationary at 1/3 every round") {
    import spark.implicits._
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val ranks = Graph.pageRank(edges, iters = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // r = (1-d)/3 + d*(1/3) = 1/3 exactly on the 9-dp grid each round
    assert(ranks.keySet === Set("a", "b", "c"))
    ranks.values.foreach(v => assert(math.abs(v - 0.333333333) < 1e-9))
  }

  test("pageRank: star a->b, c->b concentrates rank in b; dangling b leaks") {
    import spark.implicits._
    val edges = Seq(("a", "b", 1L), ("c", "b", 1L)).toDF("src", "dst", "w")
    val ranks = Graph.pageRank(edges, iters = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // base = (1.0-0.85)/3; hand-rolled: a,c have no in-edges -> base from
    // iter 1 on; b's iter-3 mass = 0.85*(0.05+0.05) + base = 0.135
    assert(math.abs(ranks("a") - 0.05) < 1e-9)
    assert(math.abs(ranks("c") - 0.05) < 1e-9)
    assert(math.abs(ranks("b") - 0.135) < 1e-9)
  }

  test("pageRank: weighted out-edges split rank by w/W; total mass conserved (no dangling)") {
    import spark.implicits._
    // a -> b (w=3), a -> c (w=1); b -> a; c -> a : no dangling nodes, so
    // sum of ranks stays 1 on the rounding grid
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val ranks = Graph.pageRank(edges, iters = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6)
    // b receives 3x c's share from a every round -> strictly higher rank
    assert(ranks("b") > ranks("c"))
    // a receives from both b and c -> the hub outranks the spokes
    assert(ranks("a") > ranks("b"))
  }

  test("x_graph_cc: the path graph resolves to the mod-6 residue components") {
    // node u = doc_id mod 84, edge u -> u+6: six 15-node PATHS (diameter
    // 14) — the regime where the pointer jump earns its O(log d); the
    // canonical min-member label of node u is exactly u mod 6.
    val rows = SparkEntry.queries("x_graph_cc")(spark, sf()).collect()
    assert(rows.length === 90)
    rows.foreach { r =>
      val (node, comp, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(comp === node % 6, s"node $node labeled $comp")
      assert(n === 15L, s"component of $node sized $n")
    }
  }

  test("triangleCount: known counts on a hand graph; hub star stays triangle-free") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every node in C(3,2)=3 triangles) plus a star
    // hub 5 -> {6,7,8} (no closing edges: zero triangles), bridged 4-5.
    val k4 = for (i <- 1 to 4; j <- (i + 1) to 4) yield (i.toLong, j.toLong)
    val star = Seq((5L, 6L), (5L, 7L), (5L, 8L), (4L, 5L))
    // feed edges in MIXED orientation + a duplicate + a self-loop: the
    // operator must canonicalize all three away
    val edges = (k4 ++ star).map { case (u, v) => (v, u) }
      .toDF("u", "v").unionByName(Seq((1L, 2L), (6L, 6L)).toDF("u", "v"))
    val got = Graph.triangleCount(edges).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 0L, 6L -> 0L, 7L -> 0L, 8L -> 0L))
  }

  test("bfsHops: hand graph — hops settle on shortest paths; unreachable stays NULL") {
    import spark.implicits._
    // path 1-2-3-4 plus shortcut 1-3 (so 4 is 2 hops, not 3), and an
    // island 9-10 with no source; sources = {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (9L, 10L))
      .toDF("u", "v")
    val src = Seq(1L).toDF("node")
    val got = Graph.bfsHops(edges, src).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      9L -> -1L, 10L -> -1L))
  }

  test("bfsHops: multi-source takes the nearer seed; chain depth settles at fixpoint") {
    import spark.implicits._
    // chain 1-2-...-7 with sources at both ends: hops = min distance to
    // an end — exercises >1 propagation round and frontier termination
    val edges = (1L to 6L).map(i => (i, i + 1)).toDF("u", "v")
    val src = Seq(1L, 7L).toDF("node")
    val got = Graph.bfsHops(edges, src).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 2L, 6L -> 1L, 7L -> 0L))
  }

  test("kCore: triangle with pendant path peels the path over multiple rounds") {
    import spark.implicits._
    // triangle {1,2,3} is the 2-core; pendant path 3-4-5-6 peels one
    // node per round from the free end (3 rounds) — pins the iterative
    // cascade, not just a single-round degree filter
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("u", "v")
    val got = Graph.kCore(edges, k = 2).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: k above the densest core returns empty; mixed orientation + dups canonicalize") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 3L))
      .toDF("u", "v")
    assert(Graph.kCore(edges, k = 3).isEmpty) // a triangle has no 3-core
    val core2 = Graph.kCore(edges, k = 2).as[(Long, Long)].collect().toMap
    assert(core2 === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("triangleCount: oriented form equals naive a<b<c enumeration on the fixture graph") {
    import spark.implicits._
    val edges = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
      .select(pmod(col("doc_id"), lit(29)).as("u"),
        pmod(expr("doc_id div 29"), lit(29)).as("v"))
    val got = Graph.triangleCount(edges).as[(Long, Long)].collect().toMap
    // naive: canonical edges, join e1(a,b) e2(b,c) close e3(a,c)
    val e = edges.select(least($"u", $"v").as("a"), greatest($"u", $"v").as("b"))
      .filter($"a" =!= $"b").distinct()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val naive = tri.select(explode(array($"x", $"y", $"z")).as("n"))
      .groupBy("n").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (n, c) => assert(c === naive.getOrElse(n, 0L)) }
    assert(naive.keySet.subsetOf(got.keySet))
    assert(got.values.sum > 0, "fixture graph must contain triangles")
  }

  test("commonNeighbors: hand graph — non-edges ranked by shared neighbors; edges excluded") {
    import spark.implicits._
    // square 1-2-3-4-1 plus a chord-free diagonal candidate: (1,3) and
    // (2,4) each share TWO neighbors and are non-adjacent; every
    // adjacent pair shares none (no triangles). Add a pendant 5-1:
    // (5,2) and (5,4) share exactly neighbor 1.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 1L),
      (2L, 1L) /* duplicate, reversed — must canonicalize away */)
      .toDF("u", "v")
    val got = Graph.commonNeighbors(edges)
      .as[(Long, Long, Long)].collect()
      .map { case (u, v, c) => (u, v) -> c }.toMap
    assert(got((1L, 3L)) === 2L && got((2L, 4L)) === 2L)
    assert(got((2L, 5L)) === 1L && got((4L, 5L)) === 1L)
    assert(!got.contains((3L, 5L)), "3 and 5 share no neighbor")
    // adjacent pairs never appear, whatever their wedge count
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 5L)).foreach { e =>
      assert(!got.contains(e), s"edge $e must be excluded")
    }
    // minCommon filters the tail
    val strong = Graph.commonNeighbors(edges, minCommon = 2)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2)).toSet
    assert(strong === Set((1L, 3L), (2L, 4L)))
  }
}
