package graft.operators

import graft.SparkSpec

/** Integer-grid PageRank ([[Graph]]). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference single-machine implementation of the exact integer
    * recurrence (independent of the DataFrame formulation).
    */
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr = nodes.map(_ -> Graph.Scale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => pr(u) / outdeg(u) }.sum).toMap
      pr = nodes.map(n =>
        n -> (15 * Graph.Scale + 85 * in.getOrElse(n, 0L)) / 100).toMap
    }
    pr
  }

  test("pageRank matches the integer recurrence exactly on a graph with " +
      "a hub, a chain, and a dangling sink") {
    val edges = Seq[(Long, Long)](
      // hub 1 -> {2,3,4,5}; chain 2->3->4; 5 is reached only via the hub;
      // 6->1 feeds the hub; 4 dangles (no out-edges: mass evaporates)
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 3L), (3L, 4L), (6L, 1L), (5L, 6L))
    val expected = ref(edges, iters = 4)
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("ranks order sensibly: the hub's feeder chain concentrates rank, " +
      "every rank carries the teleport floor") {
    val edges = Seq[(Long, Long)](
      (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), // star into 1
      (1L, 2L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val floor = 15 * Graph.Scale / 100
    assert(got.values.forall(_ >= floor))
    assert(got(1L) > got(2L), "the star center must outrank a leaf")
    assert(got(2L) > got(3L), "node 2 gets 1's full rank, 3 only teleport")
  }
}
