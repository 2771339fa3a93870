package graft.kg

import graft.pipeline.{Mention, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def bruteCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) { val ra = find(a); val rb = find(b); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // normalize to min member per component
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  test("matches brute-force union-find on random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 200
      val edges = Seq.fill(150)((rng.nextInt(n).toLong, rng.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val want = bruteCC(edges)
      val got = ConnectedComponents.run(edges.toDS()).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("r6 driver-local fast path == distributed star contraction (incl. self-loops)") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(300)((rng.nextInt(250).toLong, rng.nextInt(250).toLong)) // self-loops kept
      val local = ConnectedComponents.run(edges.toDS()).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val dist = ConnectedComponents.run(edges.toDS(), localMaxEdges = -1).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(local == dist, s"trial $trial")
    }
  }

  test("chain graph converges (log-round contraction, not diameter-bound)") {
    import spark.implicits._
    // force the distributed path (r6: small inputs default to the local one)
    val edges = (0L until 300L).map(i => (i, i + 1))
    val got = ConnectedComponents.run(edges.toDS(), maxIter = 12, localMaxEdges = -1).collect()
    assert(got.forall(_.getLong(1) == 0L), "all nodes should reach component 0")
  }

  test("run() and link() leave no cached relations behind (no cacheManager leak)") {
    // round-1 review finding: allNodes.cache()/surf.cache() leaked; the
    // localCheckpoint replacements must register NOTHING in the cacheManager
    import spark.implicits._
    spark.catalog.clearCache()
    val edges = (0L until 50L).map(i => (i, i + 1))
    ConnectedComponents.run(edges.toDS()).collect()
    assert(spark.sharedState.cacheManager.isEmpty, "CC.run leaked a cached relation")
    val mentions = (0 until 200).map { i =>
      Mention(f"conv$i%04d", 0, 0, if (i % 2 == 0) "PERSON" else "ORGANIZATION",
        0, 10, if (i % 3 == 0) "Alice Johnson" else s"Acme Corp $i")
    }.toDS()
    EntityLink.link(mentions).collect()
    assert(spark.sharedState.cacheManager.isEmpty, "EntityLink.link leaked a cached relation")
  }
}

class EntityLinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def m(etype: String, surface: String, n: Int): Seq[Mention] =
    (0 until n).map(i => Mention(s"c$i", 0, 0, etype, 0, surface.length, surface))

  test("links title variants and near-identical surfaces; keeps types apart") {
    import spark.implicits._
    val mentions = (
      m("PERSON", "Alice Johnson", 5) ++ m("PERSON", "Dr. Alice Johnson", 2) ++
      m("PERSON", "Bob Chen", 3) ++
      m("ORGANIZATION", "Acme Corp.", 4) ++ m("ORGANIZATION", "Acme Corp", 2) ++
      m("ORGANIZATION", "Globex Inc.", 3) ++
      m("LOCATION", "Berlin", 6)).toDS()
    val linked = EntityLink.link(mentions).collect()
    def entity(surface: String) = linked.find(_.getAs[String]("surface") == surface).get.getAs[Long]("entity_id")
    assert(entity("Alice Johnson") == entity("Dr. Alice Johnson"))
    assert(entity("Acme Corp.") == entity("Acme Corp"))
    assert(entity("Alice Johnson") != entity("Bob Chen"))
    assert(entity("Acme Corp.") != entity("Globex Inc."))
    val canon = linked.find(_.getAs[String]("surface") == "Dr. Alice Johnson").get
      .getAs[String]("canonical_surface")
    assert(canon == "Alice Johnson") // higher mention count wins
  }
}
