package graft.sim

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group covariance SUFFICIENT STATISTICS over the embedding
  * column — the PCA/whitening prep pass: for every label and every
  * dimension pair i ≤ j, the exact sums (n, Σxᵢ, Σxⱼ, Σxᵢxⱼ) from
  * which cov(i,j) = (n·Σxᵢxⱼ − Σxᵢ·Σxⱼ)/n² follows. The op emits the
  * raw sums, not the quotient: sums quantized to floor(v·10⁶)
  * micro-units are EXACT longs cross-engine (products ≤ 10¹², group
  * sums ≤ 10¹⁵ ≪ 2⁶³), while the covariance quotient is precisely
  * the round-a-division hazard the mean-pool gate hit — downstream
  * divides in whatever precision it wants.
  *
  * Two implementations, proven equal by CovarianceSpec:
  *  - the declarative gate: explode → self-join on (vec_id, i ≤ j) —
  *    SQL-mirrorable, shuffles rows × d(d+1)/2;
  *  - [[CovSumsAgg]], the scale path: a mergeable typed Aggregator
  *    holding one d(d+1)/2-long buffer per group, so the corpus is
  *    ONE partial-aggregated pass (shuffle carries groups × buffer,
  *    never row pairs) — the Misra–Gries/TopKAgg pattern applied to
  *    second moments.
  */
object Covariance {

  /** Declarative form: (label, dim_i, dim_j, n, s_i, s_j, s_ij) for
    * i ≤ j, micro-unit longs. */
  def sufficientStats(emb: DataFrame): DataFrame = {
    val dt = emb.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("vq", floor(col("v").cast("double") * 1000000.0).cast("long"))
      .select(col("vec_id"), col("label"), col("dim"), col("vq"))
    val a = dt.select(col("vec_id"), col("label"), col("dim").as("dim_i"),
      col("vq").as("vq_i"))
    val b = dt.select(col("vec_id"), col("dim").as("dim_j"), col("vq").as("vq_j"))
    a.join(b, Seq("vec_id"))
      .filter(col("dim_i") <= col("dim_j"))
      .groupBy(col("label"), col("dim_i"), col("dim_j"))
      .agg(count(lit(1)).as("n"),
        sum(col("vq_i")).as("s_i"),
        sum(col("vq_j")).as("s_j"),
        sum(col("vq_i") * col("vq_j")).as("s_ij"))
  }

  /** DuckDB mirror of [[sufficientStats]]. */
  def sufficientStatsSql(): String =
    s"""WITH dt AS (
       |  SELECT vec_id, label, CAST(i - 1 AS INT) AS dim,
       |    CAST(FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000.0)
       |      AS BIGINT) AS vq
       |  FROM embeddings,
       |    LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) s)
       |SELECT a.label, a.dim AS dim_i, b.dim AS dim_j,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(SUM(a.vq) AS BIGINT) AS s_i,
       |  CAST(SUM(b.vq) AS BIGINT) AS s_j,
       |  CAST(SUM(a.vq * b.vq) AS BIGINT) AS s_ij
       |FROM dt a JOIN dt b ON a.vec_id = b.vec_id AND a.dim <= b.dim
       |GROUP BY 1, 2, 3""".stripMargin

  /** Mergeable one-pass buffer: n plus packed sums. sums layout:
    * [0, d) per-dim Σvq; [d, d + d(d+1)/2) upper-triangle Σvqᵢvqⱼ in
    * row-major (i, j ≥ i) order. */
  case class CovBuf(n: Long, d: Int, sums: Array[Long])

  /** Typed Aggregator over float embedding arrays (the scale path). */
  object CovSumsAgg extends Aggregator[Array[Float], CovBuf, CovBuf] {
    private def tri(d: Int) = d * (d + 1) / 2
    override def zero: CovBuf = CovBuf(0L, -1, Array.emptyLongArray)

    private def ensure(b: CovBuf, d: Int): CovBuf =
      if (b.d == d) b
      else {
        require(b.d < 0, s"ragged embedding widths: ${b.d} vs $d")
        CovBuf(b.n, d, new Array[Long](d + tri(d)))
      }

    override def reduce(b0: CovBuf, v: Array[Float]): CovBuf = {
      val d = v.length
      val b = ensure(b0, d)
      val vq = new Array[Long](d)
      var i = 0
      while (i < d) { vq(i) = math.floor(v(i).toDouble * 1000000.0).toLong; i += 1 }
      i = 0
      var k = d
      while (i < d) {
        b.sums(i) += vq(i)
        var j = i
        while (j < d) { b.sums(k) += vq(i) * vq(j); j += 1; k += 1 }
        i += 1
      }
      CovBuf(b.n + 1, d, b.sums)
    }

    override def merge(x: CovBuf, y: CovBuf): CovBuf =
      if (x.d < 0) y
      else if (y.d < 0) x
      else {
        require(x.d == y.d)
        var i = 0
        while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
        CovBuf(x.n + y.n, x.d, x.sums)
      }

    override def finish(r: CovBuf): CovBuf = r
    override def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
    override def outputEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
  }

  /** One-pass grouped sufficient stats via [[CovSumsAgg]], exploded to
    * the SAME schema as [[sufficientStats]]. */
  def sufficientStatsOnePass(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(CovSumsAgg.toColumn.name("buf"))
      .flatMap { case (label, buf) =>
        val d = buf.d
        var k = d
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long, Long, Long, Long)]
        var i = 0
        while (i < d) {
          var j = i
          while (j < d) {
            out += ((label, i, j, buf.n, buf.sums(i), buf.sums(j), buf.sums(k)))
            j += 1; k += 1
          }
          i += 1
        }
        out
      }
      .toDF("label", "dim_i", "dim_j", "n", "s_i", "s_j", "s_ij")
  }

  /** Exact Pearson correlation matrix over named numeric columns: ONE
    * aggregate folds every Σx, Σx², Σxy as order-immune decimals, then
    * each pair's r = (n·Sxy − Sx·Sy) / (√(n·Sxx−Sx²)·√(n·Syy−Sy²)) is
    * a handful of IEEE ops on exact operands — cross-engine
    * hash-identical (the channel-correlation audit: is Throttle
    * actually redundant with Speed before a feature is dropped?).
    * Output (col_x, col_y, n, corr), upper triangle i < j. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2)
    import graft.queries.QueryDsl.dsum
    val aggs = count(lit(1)).as("_n") +:
      (cols.map(c => dsum(col(c)).as(s"_s_$c")) ++
        cols.map(c => dsum(col(c) * col(c)).as(s"_q_$c")) ++
        (for (i <- cols.indices; j <- cols.indices if i < j)
          yield dsum(col(cols(i)) * col(cols(j)))
            .as(s"_p_${cols(i)}_${cols(j)}")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = for (i <- cols.indices; j <- cols.indices if i < j) yield {
      val (x, y) = (cols(i), cols(j))
      val n = col("_n").cast("double")
      val num = n * col(s"_p_${x}_$y") - col(s"_s_$x") * col(s"_s_$y")
      val dx = sqrt(n * col(s"_q_$x") - col(s"_s_$x") * col(s"_s_$x"))
      val dy = sqrt(n * col(s"_q_$y") - col(s"_s_$y") * col(s"_s_$y"))
      struct(lit(x).as("col_x"), lit(y).as("col_y"), col("_n").as("n"),
        when(dx > 0 && dy > 0, num / (dx * dy)).as("corr"))
    }
    one.select(explode(array(pairs: _*)).as("v"))
      .select(col("v.col_x"), col("v.col_y"), col("v.n"), col("v.corr"))
  }

  /** [[corrMatrix]] with LONG sufficient statistics — the fast path
    * when every column is integer-valued and bounded so that
    * Σx·y < 2⁶³ (e.g. quantized telemetry channels): plain long sums
    * stay inside whole-stage codegen instead of the BigDecimal
    * aggregation path (~6× on the bench precedent, a_moments).
    * Caller guarantees the bound; the algebra is identical. */
  def corrMatrixLong(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2)
    val aggs = count(lit(1)).as("_n") +:
      (cols.map(c => sum(col(c).cast("long")).as(s"_s_$c")) ++
        cols.map(c => sum(col(c).cast("long") * col(c).cast("long"))
          .as(s"_q_$c")) ++
        (for (i <- cols.indices; j <- cols.indices if i < j)
          yield sum(col(cols(i)).cast("long") * col(cols(j)).cast("long"))
            .as(s"_p_${cols(i)}_${cols(j)}")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = for (i <- cols.indices; j <- cols.indices if i < j) yield {
      val (x, y) = (cols(i), cols(j))
      val n = col("_n").cast("double")
      val num = n * col(s"_p_${x}_$y").cast("double") -
        col(s"_s_$x").cast("double") * col(s"_s_$y").cast("double")
      val dx = sqrt(n * col(s"_q_$x").cast("double") -
        col(s"_s_$x").cast("double") * col(s"_s_$x").cast("double"))
      val dy = sqrt(n * col(s"_q_$y").cast("double") -
        col(s"_s_$y").cast("double") * col(s"_s_$y").cast("double"))
      struct(lit(x).as("col_x"), lit(y).as("col_y"), col("_n").as("n"),
        when(dx > 0 && dy > 0, num / (dx * dy)).as("corr"))
    }
    one.select(explode(array(pairs: _*)).as("v"))
      .select(col("v.col_x"), col("v.col_y"), col("v.n"), col("v.corr"))
  }

  /** DuckDB mirror of [[corrMatrixLong]]. */
  def corrMatrixLongSql(fromSql: String, cols: Seq[String]): String = {
    val sums = (s"COUNT(*) AS n" +:
      (cols.map(c => s"CAST(SUM($c) AS BIGINT) AS s_$c") ++
        cols.map(c => s"CAST(SUM($c * $c) AS BIGINT) AS q_$c") ++
        (for (i <- cols.indices; j <- cols.indices if i < j)
          yield s"CAST(SUM(${cols(i)} * ${cols(j)}) AS BIGINT) AS p_${cols(i)}_${cols(j)}")))
      .mkString(",\n  ")
    val sel = (for (i <- cols.indices; j <- cols.indices if i < j) yield {
      val (x, y) = (cols(i), cols(j))
      s"""SELECT '$x' AS col_x, '$y' AS col_y, n,
         |  CASE WHEN sqrt(CAST(n AS DOUBLE) * CAST(q_$x AS DOUBLE)
         |             - CAST(s_$x AS DOUBLE) * CAST(s_$x AS DOUBLE)) > 0
         |        AND sqrt(CAST(n AS DOUBLE) * CAST(q_$y AS DOUBLE)
         |             - CAST(s_$y AS DOUBLE) * CAST(s_$y AS DOUBLE)) > 0
         |    THEN (CAST(n AS DOUBLE) * CAST(p_${x}_$y AS DOUBLE)
         |          - CAST(s_$x AS DOUBLE) * CAST(s_$y AS DOUBLE))
         |      / (sqrt(CAST(n AS DOUBLE) * CAST(q_$x AS DOUBLE)
         |              - CAST(s_$x AS DOUBLE) * CAST(s_$x AS DOUBLE))
         |         * sqrt(CAST(n AS DOUBLE) * CAST(q_$y AS DOUBLE)
         |                - CAST(s_$y AS DOUBLE) * CAST(s_$y AS DOUBLE)))
         |  END AS corr
         |FROM g""".stripMargin
    }).mkString("\nUNION ALL\n")
    s"""WITH g AS (
       |  SELECT $sums
       |  FROM ($fromSql))
       |$sel""".stripMargin
  }

  /** DuckDB mirror of [[corrMatrix]]. */
  def corrMatrixSql(fromSql: String, cols: Seq[String]): String = {
    import graft.queries.QueryDsl.dsumSql
    val sums = (s"COUNT(*) AS n" +:
      (cols.map(c => s"${dsumSql(c)} AS s_$c") ++
        cols.map(c => s"${dsumSql(s"$c * $c")} AS q_$c") ++
        (for (i <- cols.indices; j <- cols.indices if i < j)
          yield s"${dsumSql(s"${cols(i)} * ${cols(j)}")} AS p_${cols(i)}_${cols(j)}")))
      .mkString(",\n  ")
    val sel = (for (i <- cols.indices; j <- cols.indices if i < j) yield {
      val (x, y) = (cols(i), cols(j))
      s"""SELECT '$x' AS col_x, '$y' AS col_y, n,
         |  CASE WHEN sqrt(CAST(n AS DOUBLE) * q_$x - s_$x * s_$x) > 0
         |        AND sqrt(CAST(n AS DOUBLE) * q_$y - s_$y * s_$y) > 0
         |    THEN (CAST(n AS DOUBLE) * p_${x}_$y - s_$x * s_$y)
         |      / (sqrt(CAST(n AS DOUBLE) * q_$x - s_$x * s_$x)
         |         * sqrt(CAST(n AS DOUBLE) * q_$y - s_$y * s_$y))
         |  END AS corr
         |FROM g""".stripMargin
    }).mkString("\nUNION ALL\n")
    s"""WITH g AS (
       |  SELECT $sums
       |  FROM ($fromSql))
       |$sel""".stripMargin
  }
}
