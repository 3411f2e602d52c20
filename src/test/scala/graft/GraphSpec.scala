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
}
