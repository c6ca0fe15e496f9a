package graft.sim

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property check: the triangle block-pair near-dup join must equal the
  * in-JVM all-pairs kernel on random vector sets and thresholds —
  * covers block boundary cases (ids spread across / clustered within
  * blocks) the fixture data can't. */
object KnnPropSpec extends Properties("Knn.triangle") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = graft.SparkTestBase.spark

  private val corpusGen: Gen[(List[(Long, Array[Float])], Int, Double)] = for {
    n <- Gen.choose(2, 40)
    // ids deliberately sparse + clustered so block assignment (id mod B)
    // gets uneven blocks and empty blocks
    ids <- Gen.listOfN(n, Gen.choose(0L, 200L)).map(_.distinct)
    vecs <- Gen.listOfN(ids.length,
      Gen.listOfN(8, Gen.choose(-1.0f, 1.0f)).map(_.toArray))
    blocks <- Gen.oneOf(3, 7, 16)
    threshold <- Gen.oneOf(-10.0, 0.0, 0.5)
  } yield (ids.zip(vecs), blocks, threshold)

  property("equals in-JVM all-pairs kernel") =
    Prop.forAllNoShrink(corpusGen) { case (rows, blocks, threshold) =>
      import spark.implicits._
      val df = rows.toDF("vec_id", "embedding")
      val got = Knn.cosineNearDupPairs(df, threshold, numBlocks = blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val sorted = rows.sortBy(_._1).toArray
      val expected = (for {
        a <- sorted.indices.iterator
        b <- (a + 1) until sorted.length
        c = Knn.roundedDot(sorted(a)._2, sorted(b)._2)
        if c >= threshold
      } yield (sorted(a)._1, sorted(b)._1, c)).toSet
      got == expected
    }
}
