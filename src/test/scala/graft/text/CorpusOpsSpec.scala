package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-4 corpus operators: temperature mixing, token-budget
  * selection, stratified split, TF-IDF, chunk dedup, incremental
  * (Bloom-pruned) dedup. */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("temperatureMix upweights small domains, never upsamples, is repartition-stable") {
    val actual = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val picked = CorpusPipeline.temperatureMix(docs, targetTotal = 300L)
    val pickedBySource = picked.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // no domain can exceed its actual count (acceptance rate ≤ 1)
    pickedBySource.foreach { case (s, n) => assert(n <= actual(s)) }
    // selection is a pure doc_id-hash predicate → identical under
    // repartitioning
    val rep = CorpusPipeline.temperatureMix(docs.repartition(13), 300L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rep === picked.select("doc_id").collect().map(_.getLong(0)).toSet)
    // α=0.5 property: selected fraction is HIGHER for a small domain
    // than a same-target proportional mix would give — i.e. the
    // per-domain acceptance rate is the same only when counts are
    // equal; here all sources are equal-sized, so rates must be ~equal
    val rates = pickedBySource.map { case (s, n) => n.toDouble / actual(s) }
    assert(rates.max - rates.min < 0.5) // equal-sized sources → similar rates
  }

  test("temperatureMix √-weighting: small domain gets a higher acceptance rate") {
    import spark.implicits._
    // 9:1 skew, target half the corpus: rate(small)/rate(big) should
    // approach √(big/small) = 3 (capped at 1.0)
    val skewed = (0L until 1000L).map(i =>
      (i, s"text $i", if (i < 900) "en" else "zh", if (i < 900) "big" else "small", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val picked = CorpusPipeline.temperatureMix(skewed, targetTotal = 500L)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rBig = picked.getOrElse("big", 0L).toDouble / 900.0
    val rSmall = picked.getOrElse("small", 0L).toDouble / 100.0
    assert(rSmall > rBig * 1.8, s"rSmall=$rSmall rBig=$rBig") // √9 = 3 expected
  }

  test("tokenBudgetSelect: within budget per lang, maximal, quality-ordered") {
    val budget = 3000L
    val sel = CorpusPipeline.tokenBudgetSelect(docs, budget).collect()
    val byLang = sel.groupBy(_.getString(1))
    byLang.foreach { case (_, rows) =>
      val maxCum = rows.map(_.getLong(3)).max
      assert(maxCum <= budget)
    }
    // maximality: for each lang the next (excluded) doc would overflow
    // — equivalently the selection equals the QUALIFY-window oracle,
    // which the gate proves; here assert non-vacuity + per-lang rows
    assert(byLang.size === 5 && sel.nonEmpty)
  }

  test("stratifiedSplit balances within every stratum (global split can't guarantee this)") {
    val split = CorpusPipeline.stratifiedSplit(docs, 0.8)
    val fracs = split.groupBy("lang")
      .agg(avg(when(col("split") === "train", 1.0).otherwise(0.0)).as("frac"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    fracs.foreach { case (lang, f) =>
      assert(f > 0.6 && f < 0.95, s"$lang train frac $f out of band")
    }
    // leakage-free: every doc appears exactly once
    assert(split.count() === docs.count())
    assert(split.select("doc_id").distinct().count() === docs.count())
  }

  test("tfidf top terms on a hand corpus") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry dates")).toDF("doc_id", "text")
    val got = Tfidf.topTerms(tiny, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getString(1)).toMap
    // doc 1: apple tf=2 df=1 → 2·ln3 ≈ 2.197 beats banana (1·ln1.5)
    assert(got((1L, 1)) === "apple")
    assert(got((1L, 2)) === "banana")
    // doc 3: cherry tf=2 df=2 → 2·ln1.5 ≈ .811 < dates 1·ln3 ≈ 1.099
    assert(got((3L, 1)) === "dates")
    assert(got((3L, 2)) === "cherry")
  }

  test("chunk dedup flags the planted boilerplate in every doc but the first") {
    val boiled = ChunkDedup.withBoilerplate(docs, 16)
    val stats = ChunkDedup.dupChunkStats(boiled, 16).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val planted = stats.keys.filter(_ % 3 == 0).toSeq.sorted
    // first planted doc (id 0) introduces the header: zero dups unless
    // its own tail repeats (it doesn't — random words)
    assert(stats(planted.head)._2 === 0L)
    // every later planted doc's first chunk is a dup of doc 0's header
    planted.tail.foreach { id =>
      assert(stats(id)._2 >= 1L, s"doc $id should carry the dup header chunk")
    }
    // unplanted docs may legitimately share chunks with their near-dup
    // cluster partners (the corpus has jaccard≥0.9 near-dups), but the
    // planted header must dominate: most dup chunks live in planted docs
    val plantedDups = planted.tail.size
    val unplantedDups = stats.filter(_._1 % 3 != 0).values.map(_._2).sum
    assert(unplantedDups < plantedDups,
      s"unplanted dup chunks $unplantedDups should be rare vs planted $plantedDups")
  }

  test("chunk dedup exact counts on a hand corpus") {
    import spark.implicits._
    // 4-word chunks; doc 2 repeats doc 1's first chunk; doc 3 repeats
    // its own first chunk as its second
    val tiny = Seq(
      (1L, "a b c d e f"),          // chunks: [a b c d], [e f]
      (2L, "a b c d x y z w"),      // [a b c d](dup), [x y z w]
      (3L, "p q r s p q r s")).toDF("doc_id", "text") // [p q r s], [p q r s](dup)
    val got = ChunkDedup.dupChunkStats(tiny, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === ((2L, 0L)))
    assert(got(2L) === ((2L, 1L)))
    assert(got(3L) === ((2L, 1L)))
  }

  test("incremental dedup: bloom prunes, verification keeps it exact") {
    val refMax = 250L
    val ref = docs.filter(col("doc_id") < refMax)
    val result = IncrementalDedup.gateQuery(docs, refMax)
    val got = result.select("doc_id").collect().map(_.getLong(0)).toSet
    // exact semantics: all genuinely-new docs kept, every planted
    // re-crawl (identical text, shifted id) dropped
    val expectNew = docs.filter(col("doc_id") >= refMax)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expectNew, "re-crawls must be removed, new docs kept")
    // and the planted re-crawls existed (non-vacuous)
    assert(ref.filter(col("doc_id") % 7 === 0).count() > 0)
    // bloom layer: no false negatives by construction; false-positive
    // rate within ~5× of the 1% design point on this corpus
    val refH = ref.select(IncrementalDedup.contentHash60.as("h"))
    val agg = udaf(new graft.functions.BloomFilterAgg(250L, 0.01),
      org.apache.spark.sql.Encoders.scalaLong)
    val bytes = refH.agg(agg(col("h"))).head().getAs[Array[Byte]](0)
    val bf = graft.functions.BloomFilterAgg.deserialize(bytes)
    val refHashes = refH.collect().map(_.getLong(0))
    assert(refHashes.forall(bf.mightContainLong)) // zero false negatives
    val novel = docs.filter(col("doc_id") >= refMax)
      .select(IncrementalDedup.contentHash60.as("h"))
      .collect().map(_.getLong(0)).filterNot(refHashes.toSet)
    val fp = novel.count(bf.mightContainLong).toDouble / novel.length
    assert(fp < 0.05, s"false-positive rate $fp way above design 0.01")
  }

  test("unigram entropy: uniform docs score ln(n), repeated-word docs score 0") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "a b c d"),      // uniform over 4 → H = ln 4
      (2L, "x x x x"),      // single word → H = 0
      (3L, "a a b b")).toDF("doc_id", "text") // uniform over 2 → ln 2
    val got = Tfidf.unigramEntropy(tiny).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - math.log(4)) < 1e-5)
    assert(got(2L) === 0.0)
    assert(math.abs(got(3L) - math.log(2)) < 1e-5)
  }

  test("bigram LM score: in-distribution test text outscores out-of-distribution") {
    import spark.implicits._
    // ids chosen so the default 0.9 hash split puts most in train; we
    // instead force the split via trainFrac near-1 minus two probes is
    // fragile — use the real operator on the real corpus and assert
    // the distributional property on planted outliers
    val base = docs.limit(200)
    // plant an out-of-distribution doc: words the corpus never uses
    val ood = Seq((999999L, "zzq qxv vkk zzq qxv vkk zzq qxv vkk", "xx",
      "srcX", 35L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val scored = LmScore.bigramLogProb(base.unionByName(ood)).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // the planted doc must land in some split; if test, it scores far
    // below every in-distribution test doc (unseen unigrams → ln(1/V))
    scored.get(999999L).foreach { oodScore =>
      val others = scored.filterNot(_._1 == 999999L).values
      assert(others.isEmpty || oodScore < others.min,
        s"ood=$oodScore vs best-of-rest=${others.minOption}")
    }
    // scores are finite negatives (log-probs), n_bigrams positive
    assert(scored.values.forall(v => v < 0 && !v.isNaN && !v.isInfinite))
    assert(scored.nonEmpty)
  }

  test("url canonicalization: case/slash/query variants collide, schemes stay apart") {
    import spark.implicits._
    val tiny = Seq(
      (0L, "x"),   // → https://WWW.Example.COM/Docs/0/
      (1L, "x"),   // → https://www.example.com/Docs/1?utm_source=feed#sec
      (50L, "x"),  // → https://www.example.com/Docs/0?... (50%50=0, 50%3=2 → http!)
      (3L, "x"),   // → https://WWW.Example.COM/Docs/3/
      (51L, "x")   // → 51%3=0 → https variant of Docs/1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.urlCanonicalDedup(TextAnalysis.urlDirtyDocs(tiny))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 (query+fragment variant of Docs/1) and doc 51 (uppercase
    // trailing-slash variant of Docs/1) canonicalize identically
    assert(got("https://www.example.com/Docs/1") === ((2L, 1L)))
    // http is a different canonical URL than https
    assert(got.contains("http://www.example.com/Docs/0"))
    assert(got("https://www.example.com/Docs/0") === ((1L, 0L)))
  }

  test("epoch shuffle: every doc placed once, epochs permute, replays are identical") {
    val e1 = CorpusPipeline.epochShuffle(docs, epoch = 1)
    val e2 = CorpusPipeline.epochShuffle(docs, epoch = 2)
    val n = docs.count()
    // a permutation: every doc exactly once, positions contiguous per shard
    assert(e1.count() === n)
    assert(e1.select("doc_id").distinct().count() === n)
    val maxPos = e1.groupBy("shard")
      .agg(max("pos_in_shard").as("mx"), count(lit(1)).as("c")).collect()
    maxPos.foreach(r => assert(r.getLong(1) === r.getLong(2)))
    // different epochs give different orders (same shard sizes not required)
    val o1 = e1.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val o2 = e2.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(o1 !== o2)
    // same epoch replays bit-identically under repartitioning
    val replay = CorpusPipeline.epochShuffle(docs.repartition(13), epoch = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(replay === o1)
  }

  test("feature hashing: stateless, stable, counts conserved") {
    import spark.implicits._
    val tiny = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val fh = Tfidf.featureHash(tiny, dim = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // counts conserved: Σn per doc = token count
    assert(fh.filter(_._1._1 == 1L).values.sum === 3L)
    assert(fh.filter(_._1._1 == 2L).values.sum === 2L)
    // the same word hashes to the same bucket in every doc (no
    // per-partition or per-doc state — the whole point of the trick)
    val aBucket1 = fh.collect { case ((1L, b), n) if n == 2L => b }
    assert(aBucket1.size === 1) // "a" twice in doc 1
    assert(fh.contains((2L, aBucket1.head))) // "a" in doc 2, same bucket
    // buckets are within [0, dim)
    assert(fh.keys.forall { case (_, b) => b >= 0 && b < 8 })
  }

  test("curriculum stages: quality-ordered, balanced per language") {
    val staged = CorpusPipeline.curriculumStages(docs, 4)
    // every lang gets all 4 stages, sizes within 1 of each other
    staged.groupBy("lang", "stage").count().collect()
      .groupBy(_.getString(0)).foreach { case (_, rows) =>
        assert(rows.map(_.getInt(1)).toSet === Set(1, 2, 3, 4))
        val sizes = rows.map(_.getLong(2))
        assert(sizes.max - sizes.min <= 1)
      }
    // stage 1 is the high-quality end: its mean alpha ratio beats stage 4
    val byStage = staged.groupBy("stage").agg(avg("alpha_ratio").as("a"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(byStage(1) > byStage(4))
  }

  test("bloom membership expression codegen matches the interpreted path") {
    import spark.implicits._
    val values = (0L until 200L).toDF("h")
    val agg = udaf(new graft.functions.BloomFilterAgg(100L, 0.01),
      org.apache.spark.sql.Encoders.scalaLong)
    val bytes = values.filter(col("h") < 100)
      .agg(agg(col("h"))).head().getAs[Array[Byte]](0)
    graft.functions.BloomMightContainLong.register(spark, bytes)
    val got = values.filter(expr("graft_bloom_mc(h)"))
      .collect().map(_.getLong(0)).toSet
    val bf = graft.functions.BloomFilterAgg.deserialize(bytes)
    val expected = (0L until 200L).filter(bf.mightContainLong).toSet
    assert(got === expected)
    assert((0L until 100L).toSet.subsetOf(got)) // no false negatives
  }

  test("lengthBuckets: hand-computed waste accounting") {
    import spark.implicits._
    // tokens: 3, 5, 7 (bucket 0); 70 (bucket 64); buckets of width 64
    val tiny = Seq("a b c", "a b c d e", "a b c d e f g",
        Seq.fill(70)("w").mkString(" "))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = CorpusPipeline.lengthBuckets(tiny, bucketTokens = 64L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))).toMap
    // bucket 0: 3 docs, sum 15, max 7 → waste 3*7-15=6, share 6/21
    assert(out(0L) === ((3L, 15L, 7L, 6L, 6.0 / 21.0)))
    // bucket 64: single doc → zero waste
    assert(out(64L) === ((1L, 70L, 70L, 0L, 0.0)))
  }

  test("lengthBuckets: per-bucket waste never exceeds uniform-padding waste") {
    val out = CorpusPipeline.lengthBuckets(docs).agg(
        sum(col("padding_waste")).as("bucketed"),
        (count(lit(1)) * lit(0)).as("z")) // placeholder agg shape
      .collect()(0).getLong(0)
    val uni = docs.select(
        size(expr(raw"regexp_extract_all(text, '\\S+', 0)")).cast("long")
          .as("n"))
      .agg((count(lit(1)) * max(col("n")) - sum(col("n"))).as("w"))
      .collect()(0).getLong(0)
    assert(out <= uni)
  }

  test("packWholeDocs: docs never split, bins never overflow, offsets stack") {
    import org.apache.spark.sql.functions._
    val packed = CorpusPipeline.packWholeDocs(docs, budgetTokens = 256L)
    // every doc appears exactly once
    assert(packed.count() === docs.count())
    assert(packed.select("doc_id").distinct().count() === docs.count())
    // bins only exceed budget when they hold a single oversize doc
    val bad = packed.groupBy("lang", "bin_id")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("k"))
      .where(col("t") > 256L && col("k") > 1L).count()
    assert(bad === 0L)
    // offsets are the running sum within each bin (docs in id order)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "bin_id").orderBy("doc_id")
    val misplaced = packed
      .withColumn("expected_off",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .where(col("offset_in_bin") =!= col("expected_off")).count()
    assert(misplaced === 0L)
    // next-fit is "greedy forward": a doc goes in a NEW bin only if it
    // did not fit in the previous one
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
    val lazyClose = packed
      .withColumn("prev_bin", lag(col("bin_id"), 1).over(wl))
      .withColumn("prev_used",
        lag(col("offset_in_bin") + col("n_tokens"), 1).over(wl))
      .where(col("prev_bin").isNotNull && col("bin_id") === col("prev_bin") + 1 &&
        col("prev_used") + col("n_tokens") <= 256L)
      .count()
    assert(lazyClose === 0L)
  }
}
