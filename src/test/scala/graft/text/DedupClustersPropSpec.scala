package graft.text

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property check: the distributed min-label CC must equal a plain
  * in-JVM union-find on random graphs (few cases — each runs Spark
  * jobs; the fixed-fixture spec covers the shapes, this covers the
  * space). */
object DedupClustersPropSpec extends Properties("DedupClusters") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.SparkTestBase.spark

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    nV <- Gen.choose(2, 25)
    nE <- Gen.choose(1, 35)
    edges <- Gen.listOfN(nE, for {
      a <- Gen.choose(0L, nV.toLong)
      b <- Gen.choose(0L, nV.toLong) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges.distinct

  /** Reference: textbook union-find with path compression. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // normalize root to the component MINIMUM id
    val byRoot = vertices.groupBy(find)
    byRoot.flatMap { case (_, vs) =>
      val m = vs.min
      vs.map(_ -> m)
    }
  }

  property("equals union-find on random graphs") =
    Prop.forAllNoShrink(edgesGen) { edges =>
      edges.nonEmpty ==> {
        import spark.implicits._
        val got = DedupClusters
          .connectedComponents(edges.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == unionFind(edges)
      }
    }
}
