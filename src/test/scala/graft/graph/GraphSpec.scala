package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def g(edges: (Long, Long)*): Graph =
    Graph.fromEdges(edges.toSeq.toDF("src", "dst"))

  test("connectedComponents finds two components") {
    val cc = g((1L, 2L), (2L, 3L), (10L, 11L)).connectedComponents()
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("sssp computes hop distances and null for unreachable") {
    val d = g((1L, 2L), (2L, 3L), (10L, 11L)).sssp(1L)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 10L -> -1L, 11L -> -1L))
  }

  test("pregel runs a custom weighted-SSSP with edge attributes") {
    // 1 -2-> 2 -3-> 3, plus a direct 1 -10-> 3: shortest 1→3 is 5
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 3L), (1L, 3L, 10L))
      .toDF("src", "dst", "w")
    val INF = Long.MaxValue
    val dist = Graph.fromEdges(edges).pregel(
      stateCols = Seq("dist" -> when(col("id") === 1L, 0L).otherwise(INF)),
      sendMsg = Seq(Pregel.toDst(
        when(Pregel.src("dist") =!= INF, Pregel.src("dist") + Pregel.edge("w")))),
      mergeMsg = min(Pregel.msg),
      vprog = Seq("dist" -> least(col("dist"), coalesce(Pregel.msg, col("dist")))),
      maxIter = 10, haltOnNoChange = true)
      .as[(Long, Long)].collect().toMap
    assert(dist == Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
  }

  test("pregel sends against edge direction reading dst state") {
    // max id reachable by following edges forward: messages flow toSrc
    val reach = g((1L, 2L), (2L, 3L), (4L, 2L)).pregel(
      stateCols = Seq("reach" -> col("id")),
      sendMsg = Seq(Pregel.toSrc(Pregel.dst("reach"))),
      mergeMsg = max(Pregel.msg),
      vprog = Seq("reach" -> greatest(col("reach"), coalesce(Pregel.msg, col("reach")))),
      maxIter = 10, haltOnNoChange = true)
      .as[(Long, Long)].collect().toMap
    assert(reach == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L))
  }

  test("scatterGather min-label propagation matches connectedComponents") {
    // the reference's ConnectedComponents IS a scatter-gather program
    // (library/ConnectedComponents.java); same fixpoint expected
    val es = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L))
    val both = es ++ es.map(e => (e._2, e._1))
    val sg = g(both: _*).scatterGather(
      stateCols = Seq("comp" -> col("id")),
      scatter = Seq(Pregel.toDst(Pregel.src("comp"))),
      combine = min(Pregel.msg),
      gather = Seq("comp" -> least(col("comp"), coalesce(Pregel.msg, col("comp")))),
      maxIter = 20, haltOnNoChange = true)
      .as[(Long, Long)].collect().toMap
    val canned = g(es: _*).connectedComponents().as[(Long, Long)].collect().toMap
    assert(sg == canned)
  }

  test("gatherSumApply weighted SSSP reaches the GSA example's fixpoint") {
    // reference gsa/GSASingleSourceShortestPaths: gather = neighbor
    // dist + edge weight, sum = min, apply = keep the smaller
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 3L), (1L, 3L, 10L))
      .toDF("src", "dst", "w")
    val INF = Long.MaxValue
    val gsa = Graph.fromEdges(edges).gatherSumApply(
      stateCols = Seq("dist" -> when(col("id") === 1L, 0L).otherwise(INF)),
      gather = when(Pregel.src("dist") =!= INF, Pregel.src("dist") + Pregel.edge("w")),
      sum = min(Pregel.msg),
      apply = Seq("dist" -> least(col("dist"), coalesce(Pregel.msg, col("dist")))),
      maxIter = 10, haltOnNoChange = true)
      .as[(Long, Long)].collect().toMap
    assert(gsa == Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
  }

  test("triangleCount on K4 gives 3 per vertex") {
    val k4 = g((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val t = k4.triangleCount().as[(Long, Long)].collect().toMap
    assert(t == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("pageRank mass sums to ~1 and favors the hub") {
    val star = g((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L))
    val pr = star.pageRank(iters = 15).as[(Long, Double)].collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
    assert(pr(1L) > pr(3L) && pr(1L) > pr(4L))
  }

  test("labelPropagation separates two cliques") {
    // two triangles bridged by one edge: labels converge per clique
    val gg = g((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val labels = gg.labelPropagation(iters = 4).as[(Long, Long)].collect().toMap
    assert(labels(1L) == labels(2L))
    assert(labels(10L) == labels(11L) && labels(11L) == labels(12L))
  }

  test("hits separates hubs from authorities at the fixpoint") {
    // 1→2←3: vertex 2 is the sole authority, 1 and 3 are hubs
    val h = g((1L, 2L), (3L, 2L)).hits(iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(h(2L) == (0L, 1000000L))
    assert(h(1L) == (1000000L, 0L) && h(3L) == (1000000L, 0L))
  }

  test("triadicCensus on K4 is all triangles") {
    val c = g((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .triadicCensus().as[(Long, Long, Long, Long)].collect().head
    assert(c == ((0L, 0L, 0L, 4L)))
  }

  test("communityDetection converges per clique with attenuation ties") {
    // two disjoint triangles: round 1 adopts min neighbor, round 2
    // settles each clique on its min vertex id (ties → smallest label)
    val gg = g((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
    val labels = gg.communityDetection(maxIter = 2).as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("summarize collapses groups into a super-graph") {
    val verts = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val (sv, se) = new Graph(verts, edges).summarize("grp")
    assert(sv.as[(String, Long)].collect().toMap == Map("a" -> 2L, "b" -> 1L))
    assert(se.as[(String, String, Long)].collect().toSet ==
      Set(("a", "a", 1L), ("a", "b", 1L)))
  }

  test("degrees and subgraph") {
    val gg = g((1L, 2L), (2L, 3L))
    val deg = gg.degrees.as[(Long, Long)].collect().toMap
    assert(deg == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    val sub = gg.subgraph(col("id") < 3)
    assert(sub.undirected.count() == 2) // only 1<->2 remains
  }

  test("directed degrees, set ops and vertex joins") {
    val g1 = g((1L, 2L), (2L, 3L))
    assert(g1.inDegrees.as[(Long, Long)].collect().toMap == Map(2L -> 1L, 3L -> 1L))
    assert(g1.outDegrees.as[(Long, Long)].collect().toMap == Map(1L -> 1L, 2L -> 1L))

    val g2 = g((2L, 3L), (3L, 4L))
    val u = g1.union(g2)
    assert(u.vertices.count() == 4)
    assert(u.edges.count() == 4) // bag union keeps the duplicate 2->3

    val d = g1.difference(g2) // remove vertices {2,3,4} and their edges
    assert(d.vertices.as[Long].collect().toSet == Set(1L))
    assert(d.edges.count() == 0)

    val i = g1.intersect(g2)
    assert(i.edges.as[(Long, Long)].collect().toSet == Set((2L, 3L)))
    assert(i.vertices.as[Long].collect().toSet == Set(2L, 3L))

    val joined = g1.joinWithVertices(Seq((1L, "x")).toDF("id", "tag"))
    assert(joined.vertices.where("tag = 'x'").count() == 1)
    assert(joined.vertices.count() == 3)

    val fe = g1.filterOnEdges(col("src") === 1L)
    assert(fe.edges.count() == 1 && fe.vertices.count() == 3)

    val me = g1.mapEdges(col("src") + col("dst"), "w")
    assert(me.edges.where("w = 3").count() == 1)
  }
}
