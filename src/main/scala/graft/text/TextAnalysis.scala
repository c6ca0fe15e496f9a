package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: token
  * counting, quality scoring, language-ID heuristic, and document
  * fingerprinting. All are pure column expressions (whole-stage
  * codegen; no UDFs), each with an exact DuckDB mirror.
  */
object TextAnalysis {

  /** Token statistics: whitespace tokens, BPE-ish subword count
    * (runs of letters / digits / single punctuation — a common
    * pre-tokenizer regex), distinct words, char count. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(expr(raw"regexp_extract_all(text, '\\S+', 0)")).as("n_tokens"),
      size(expr(raw"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)"))
        .as("n_subwords"),
      size(array_distinct(split(col("text"), " "))).as("n_distinct_words"),
      length(col("text")).as("n_chars"))

  val tokenStatsSql: String =
    raw"""SELECT doc_id,
         |CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens,
         |CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_subwords,
         |CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_words,
         |CAST(length(text) AS INT) AS n_chars FROM documents""".stripMargin

  /** Quality scoring: structural ratios + a bucketed verdict, in the
    * style of pretraining-corpus quality filters (length, alpha ratio,
    * mean word length, type-token ratio). */
  /** Compression-ratio quality signal (the Gopher/RefinedWeb
    * heuristic): deflate the UTF-8 text at a FIXED level and report
    * compressed/raw bytes — boilerplate and n-gram loops compress far
    * below prose, random junk compresses above it. Per-row JVM kernel
    * (zlib output for fixed input+settings is deterministic), so the
    * gate is rows-only with the discrimination spec as the anchor;
    * narrow scan, no shuffle. */
  def compressionRatio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](8192)
        it.map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished())
            compressed += deflater.deflate(buf)
          (id, raw.length.toLong, compressed,
            if (raw.length > 0) compressed.toDouble / raw.length else 1.0)
        }
      }
      .toDF("doc_id", "raw_bytes", "deflate_bytes", "compression_ratio")
  }

  def qualityScore(docs: DataFrame): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val alphaChars = length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double")
    val nTokens = size(split(col("text"), " ")).cast("double")
    val nDistinct = size(array_distinct(split(col("text"), " "))).cast("double")
    docs.select(
      col("doc_id"),
      nChars.as("n_chars_d"),
      (alphaChars / nChars).as("alpha_ratio"),
      ((nChars - alphaChars) / nChars).as("non_alpha_ratio"),
      (alphaChars / nTokens).as("mean_word_len"),
      (nDistinct / nTokens).as("type_token_ratio"))
      .withColumn("quality_bucket",
        when(col("n_chars_d") < 100, "too_short")
          .when(col("type_token_ratio") < 0.3, "repetitive")
          .when(col("mean_word_len") < 2.0 || col("mean_word_len") > 12.0, "suspicious")
          .otherwise("ok"))
  }

  val qualityScoreSql: String =
    """SELECT doc_id, n_chars_d, alpha_ratio, non_alpha_ratio, mean_word_len,
      |  type_token_ratio,
      |  CASE WHEN n_chars_d < 100 THEN 'too_short'
      |       WHEN type_token_ratio < 0.3 THEN 'repetitive'
      |       WHEN mean_word_len < 2.0 OR mean_word_len > 12.0 THEN 'suspicious'
      |       ELSE 'ok' END AS quality_bucket
      |FROM (SELECT doc_id,
      |  CAST(length(text) AS DOUBLE) AS n_chars_d,
      |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
      |    / CAST(length(text) AS DOUBLE) AS alpha_ratio,
      |  (CAST(length(text) AS DOUBLE) - CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE))
      |    / CAST(length(text) AS DOUBLE) AS non_alpha_ratio,
      |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
      |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS type_token_ratio
      |FROM documents) t""".stripMargin

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "mit"),
    "es" -> Seq("el", "los", "las", "y", "para"))

  private def markerCount(lang: String): Column = {
    val words = markers.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
    expr(s"size(filter(split(lower(text), ' '), w -> w in ($words)))")
  }

  /** Language-ID heuristic: CJK codepoint presence → zh, else argmax of
    * per-language stopword-marker counts with a fixed tie order
    * (en > fr > de > es). */
  def langId(docs: DataFrame): DataFrame = {
    val cjk = size(expr(raw"regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]', 0)"))
    val Seq(en, fr, de, es) = Seq("en", "fr", "de", "es").map(markerCount)
    docs.select(col("doc_id"), col("lang").as("labeled_lang"),
      cjk.as("cjk"), en.as("s_en"), fr.as("s_fr"), de.as("s_de"), es.as("s_es"))
      .withColumn("predicted_lang",
        when(col("cjk") > 0, "zh")
          .when(col("s_en") >= col("s_fr") && col("s_en") >= col("s_de") &&
            col("s_en") >= col("s_es"), "en")
          .when(col("s_fr") >= col("s_de") && col("s_fr") >= col("s_es"), "fr")
          .when(col("s_de") >= col("s_es"), "de")
          .otherwise("es"))
      .drop("cjk")
  }

  val langIdSql: String = {
    def mc(lang: String): String = {
      val words = markers.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(string_split(lower(text), ' '), w -> w in ($words))) AS INT)"
    }
    raw"""SELECT doc_id, labeled_lang, s_en, s_fr, s_de, s_es,
         |  CASE WHEN cjk > 0 THEN 'zh'
         |       WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
         |       WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
         |       WHEN s_de >= s_es THEN 'de'
         |       ELSE 'es' END AS predicted_lang
         |FROM (SELECT doc_id, lang AS labeled_lang,
         |  CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS INT) AS cjk,
         |  ${mc("en")} AS s_en, ${mc("fr")} AS s_fr,
         |  ${mc("de")} AS s_de, ${mc("es")} AS s_es
         |FROM documents) t""".stripMargin
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    * rolling Rabin-Karp hashes over character k-grams, keeping the
    * minimum hash of each sliding window of size w — guarantees any
    * shared substring of length ≥ w+k−1 produces a shared fingerprint.
    * One narrow mapPartitions pass; output (doc_id, fingerprint) rows
    * feed the same inverted-index join as the shingle pipelines. */
  /** Spread a narrow kernel's input across the cluster when the source
    * arrived in fewer splits than there are cores (a single small
    * parquet file = one partition = one busy core). At real scale
    * inputs come in thousands of splits and this is a no-op. */
  private[text] def balanced(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def winnowingFingerprints(docs: DataFrame, k: Int = 8, w: Int = 16,
      useMd5Grams: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    balanced(docs.select(col("doc_id"), col("text"))).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val hashes =
          if (useMd5Grams) md5GramHashes(text, k) else rkGramHashes(text, k)
        selectWindowMins(hashes, w).iterator.map(h => (id, h))
      })
      .toDF("doc_id", "fingerprint")
      .distinct()
  }

  /** Rabin-Karp base-257 rolling hash over k-grams — the production
    * gram hash (O(n) per doc, no allocation). */
  private[text] def rkGramHashes(text: String, k: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array.emptyLongArray
    val B = 257L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + text.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - text.charAt(i - 1) * pow) * B + text.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    hashes
  }

  /** md5-60-bit hash of each k-gram — the cross-engine verification
    * gram hash (matches DuckDB's md5 on the same substring, so the
    * fingerprint set can be oracle-checked; see winnowingMd5Sql). */
  private[text] def md5GramHashes(text: String, k: Int): Array[Long] = {
    val n = text.length
    if (n < k) return Array.emptyLongArray
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      hashes(i) = MinHashLsh.md5Hash60(text.substring(i, i + k))
      i += 1
    }
    hashes
  }

  /** Winnowing selection: minimum of each sliding window of w hashes
    * (rightmost min on ties, per the original robust-winnowing
    * variant). The returned SET equals { min(h[s..s+w-1]) : s } — the
    * tie rule affects selected positions, never the value set, which
    * is what makes the md5 variant expressible as window SQL. */
  private[text] def selectWindowMins(hashes: Array[Long], w: Int): Set[Long] = {
    val m = hashes.length
    if (m == 0) return Set.empty
    if (m <= w) return Set(hashes.min)
    val out = scala.collection.mutable.Set.empty[Long]
    var start = 0
    while (start + w <= m) {
      var minIdx = start
      var j = start + 1
      while (j < start + w) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      out += hashes(minIdx)
      start += 1
    }
    out.toSet
  }

  /** Back-compat alias for the production kernel. */
  private[text] def winnow(text: String, k: Int, w: Int): Set[Long] =
    selectWindowMins(rkGramHashes(text, k), w)

  /** DuckDB oracle for `winnowingFingerprints(_, k, w, useMd5Grams =
    * true)`: per-position md5-60 k-gram hashes, then the distinct
    * min-of-each-w-window via a window frame. Positions beyond
    * m−w+1 are excluded so windows are always full; for docs with
    * m ≤ w the single pos-1 frame covers the whole doc (= the
    * kernel's global-min case). Text is ASCII (measured), so
    * character and UTF-16 substring semantics agree. */
  def winnowingMd5Sql(k: Int = 8, w: Int = 16): String =
    s"""WITH pos AS (
       |  SELECT doc_id, unnest(generate_series(1, len(text) - $k + 1)) AS p
       |  FROM documents
       |), grams AS (
       |  SELECT d.doc_id, pos.p,
       |         CAST('0x' || substr(md5(substr(d.text, pos.p, $k)), 1, 15)
       |              AS BIGINT) AS h,
       |         len(d.text) - $k + 1 AS m
       |  FROM documents d JOIN pos ON d.doc_id = pos.doc_id
       |), wmins AS (
       |  SELECT doc_id, p, m,
       |         min(h) OVER (PARTITION BY doc_id ORDER BY p
       |                      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING)
       |           AS fp
       |  FROM grams
       |)
       |SELECT DISTINCT doc_id, fp AS fingerprint FROM wmins
       |WHERE p <= greatest(m - $w + 1, 1)""".stripMargin

  /** DuckDB oracle for the PRODUCTION winnowing gate (r11): the
    * Rabin–Karp base-257 gram hash is a fixed polynomial
    * Σ char·257^i with Java-long wraparound — spelled exactly in u64
    * HUGEINT arithmetic (graft.util.DuckHash.rk257Gram), converted to
    * the signed domain BEFORE the window min (the engine's
    * `hashes.min` compares signed longs). Same window-min-set
    * structure as [[winnowingMd5Sql]]. */
  def winnowingRkSql(k: Int = 8, w: Int = 16): String = {
    import graft.util.DuckHash._
    val h = toSigned(rk257Gram("d.text", "pos.p", k))
    s"""WITH pos AS (
       |  SELECT doc_id, unnest(generate_series(1, len(text) - $k + 1)) AS p
       |  FROM documents
       |), grams AS (
       |  SELECT d.doc_id, pos.p,
       |         $h AS h,
       |         len(d.text) - $k + 1 AS m
       |  FROM documents d JOIN pos ON d.doc_id = pos.doc_id
       |), wmins AS (
       |  SELECT doc_id, p, m,
       |         min(h) OVER (PARTITION BY doc_id ORDER BY p
       |                      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING)
       |           AS fp
       |  FROM grams
       |)
       |SELECT DISTINCT doc_id, fp AS fingerprint FROM wmins
       |WHERE p <= greatest(m - $w + 1, 1)""".stripMargin
  }

  /** Intra-document repetition score (pretraining-corpus filter in the
    * style of the Gopher/MassiveText rules): duplicate word-, 2-gram-
    * and 3-gram fractions, all pure column expressions (one pass, full
    * codegen, no shuffle — at 100 TB this is a map over the scan). */
  def repetitionScore(docs: DataFrame): DataFrame = {
    def ngrams(n: Int): Column =
      if (n == 1) col("words")
      else expr(s"transform(sequence(0, size(words)-$n), i -> " +
        (0 until n).map(j => s"words[i+$j]").mkString("concat_ws(' ', ", ", ", ")") + ")")
    def dupFrac(n: Int): Column =
      // CASE guards evaluation: ANSI array indexing would throw on
      // docs shorter than n words (degenerate rows score 0)
      when(size(col("words")) >= n,
        lit(1.0) - size(array_distinct(ngrams(n))).cast("double") /
          size(ngrams(n)).cast("double"))
        .otherwise(0.0)
    docs.withColumn("words", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("words")).as("n_words"),
        dupFrac(1).as("dup_word_frac"),
        dupFrac(2).as("dup_2gram_frac"),
        dupFrac(3).as("dup_3gram_frac"))
  }

  val repetitionScoreSql: String = {
    def ngramsSql(n: Int): String =
      if (n == 1) "words"
      else s"list_transform(generate_series(1, len(words)-${n - 1}), i -> " +
        (0 until n).map(j => s"words[CAST(i AS INT)+$j]").mkString(" || ' ' || ") + ")"
    def dupFracSql(n: Int): String =
      s"CASE WHEN len(words) >= $n THEN 1.0 - " +
        s"CAST(len(list_distinct(${ngramsSql(n)})) AS DOUBLE) / " +
        s"CAST(len(${ngramsSql(n)}) AS DOUBLE) ELSE 0.0 END"
    s"""SELECT doc_id, CAST(len(words) AS INT) AS n_words,
       |  ${dupFracSql(1)} AS dup_word_frac,
       |  ${dupFracSql(2)} AS dup_2gram_frac,
       |  ${dupFracSql(3)} AS dup_3gram_frac
       |FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents) t""".stripMargin
  }

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val UrlRe = "https?://[^ ]+"

  /** Deterministic "dirty" corpus for gating the scrubber: the synthetic
    * documents contain no PII-shaped tokens at all (measured), so docs
    * with id % 7 == 0 get an appended email and id % 11 == 0 a URL —
    * pure string concat, bit-identical in DuckDB. */
  def dirtyDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"))).otherwise(""),
      when(col("doc_id") % 11 === 0,
        concat(lit(" see https://docs.example.org/p/"),
          col("doc_id").cast("string"))).otherwise("")).as("text"))

  /** PII-style scrub: count and redact email/URL tokens (regex kept to
    * the Java-regex ∩ RE2 common dialect so the DuckDB oracle matches).
    * One projection pass — the 100 TB shape is a map over the scan. */
  def piiScrub(docs: DataFrame): DataFrame = {
    // Spark SQL string literals process backslash escapes; the Java
    // regex needs its backslashes doubled there (the column-function
    // calls below take the raw pattern unchanged)
    def sqlLit(re: String): String = re.replace("\\", "\\\\")
    docs.select(
      col("doc_id"),
      size(expr(s"regexp_extract_all(text, '${sqlLit(EmailRe)}', 0)")).as("n_emails"),
      size(expr(s"regexp_extract_all(text, '${sqlLit(UrlRe)}', 0)")).as("n_urls"),
      regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        UrlRe, "<URL>").as("clean_text"))
  }

  val piiScrubSql: String = {
    val dirty =
      """SELECT doc_id, text ||
        |  CASE WHEN doc_id % 7 = 0
        |    THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |    ELSE '' END ||
        |  CASE WHEN doc_id % 11 = 0
        |    THEN ' see https://docs.example.org/p/' || CAST(doc_id AS VARCHAR)
        |    ELSE '' END AS text
        |FROM documents""".stripMargin
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$UrlRe')) AS INT) AS n_urls,
       |  regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
       |    '$UrlRe', '<URL>', 'g') AS clean_text
       |FROM ($dirty) t""".stripMargin
  }

  /** Deterministic URL-variant corpus for the canonicalization gate:
    * the same logical page appears as (a) uppercase host + trailing
    * slash, (b) lowercase + tracking query + fragment, (c) plain http —
    * the three spellings a crawler actually sees. Paths collapse mod 50
    * so distinct docs genuinely collide after canonicalization. */
  def urlDirtyDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" see https://WWW.Example.COM/Docs/"),
          (col("doc_id") % 50).cast("string"), lit("/")))
        .when(col("doc_id") % 3 === 1,
          concat(lit(" see https://www.example.com/Docs/"),
            (col("doc_id") % 50).cast("string"), lit("?utm_source=feed#sec")))
        .otherwise(concat(lit(" see http://www.example.com/Docs/"),
          (col("doc_id") % 50).cast("string")))).as("text"))

  /** URL canonicalization + URL-level dedup — the crawl-pipeline step
    * before any content dedup: lowercase scheme+host, drop query and
    * fragment, strip trailing slashes, then group pages by canonical
    * URL (keep-min doc id). One projection pass + one groupBy on the
    * canonical string — the 100 TB shape is scan → hash-agg. The
    * regexes stay in the Java-regex ∩ RE2 common dialect so the DuckDB
    * oracle computes the identical canonical form. */
  def urlCanonicalDedup(docs: DataFrame): DataFrame = {
    val url = regexp_extract(col("text"), UrlRe, 0)
    val scheme = lower(regexp_extract(col("url"), "^(https?)://", 1))
    val host = lower(regexp_extract(col("url"), "^https?://([^/?#]+)", 1))
    val path = regexp_replace(
      regexp_extract(col("url"), "^https?://[^/?#]+([^?#]*)", 1), "/+$", "")
    docs
      .filter(col("text").rlike(UrlRe))
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"),
        concat(scheme, lit("://"), host, path).as("url_canonical"))
      .groupBy("url_canonical")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc"))
  }

  val urlCanonicalDedupSql: String = {
    val dirty =
      """SELECT doc_id, text ||
        |  CASE WHEN doc_id % 3 = 0
        |    THEN ' see https://WWW.Example.COM/Docs/' ||
        |         CAST(doc_id % 50 AS VARCHAR) || '/'
        |  WHEN doc_id % 3 = 1
        |    THEN ' see https://www.example.com/Docs/' ||
        |         CAST(doc_id % 50 AS VARCHAR) || '?utm_source=feed#sec'
        |  ELSE ' see http://www.example.com/Docs/' ||
        |       CAST(doc_id % 50 AS VARCHAR) END AS text
        |FROM documents""".stripMargin
    s"""WITH urls AS (
       |  SELECT doc_id, regexp_extract(text, '$UrlRe', 0) AS url
       |  FROM ($dirty) t WHERE regexp_matches(text, '$UrlRe')
       |), canon AS (
       |  SELECT doc_id,
       |    lower(regexp_extract(url, '^(https?)://', 1)) || '://' ||
       |    lower(regexp_extract(url, '^https?://([^/?#]+)', 1)) ||
       |    regexp_replace(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1),
       |      '/+$$', '', 'g') AS url_canonical
       |  FROM urls
       |)
       |SELECT url_canonical, CAST(count(*) AS BIGINT) AS n_docs,
       |       MIN(doc_id) AS keep_doc
       |FROM canon GROUP BY 1""".stripMargin
  }

  /** Decomposed Unicode tail planted on every doc (the raw corpus is
    * pure ASCII — measured), so the NFC op has real combining sequences
    * to compose: "e" + U+0301 → é, "A" + U+030A → Å. The same literal
    * bytes go into the DuckDB oracle, so both engines normalize
    * identical input. */
  private val DirtyUnicodeTail = " cafe\u0301 A\u030Angstro\u0308m"

  /** Unicode NFC normalization over the planted-decomposition corpus:
    * the native [[graft.functions.NormalizeNfc]] expression (codegen,
    * UAX #15), with before/after codepoint counts proving composition
    * actually happened. */
  def nfcNormalize(docs: DataFrame): DataFrame = {
    graft.functions.NormalizeNfc.register(docs.sparkSession)
    docs.select(col("doc_id"),
      concat(col("text"), lit(DirtyUnicodeTail)).as("dirty"))
      .select(col("doc_id"),
        expr("nfc_normalize(dirty)").as("norm_text"),
        length(col("dirty")).as("n_before"),
        length(expr("nfc_normalize(dirty)")).as("n_after"))
  }

  val nfcNormalizeSql: String =
    s"""SELECT doc_id,
       |  nfc_normalize(text || '$DirtyUnicodeTail') AS norm_text,
       |  CAST(length(text || '$DirtyUnicodeTail') AS INT) AS n_before,
       |  CAST(length(nfc_normalize(text || '$DirtyUnicodeTail')) AS INT) AS n_after
       |FROM documents""".stripMargin

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key (S-normalized variant of hash-groupBy dedup). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(regexp_replace(lower(trim(col("text"))), raw"\s+", " ")
        .cast("binary")).as("fp"))

  val fingerprintSql: String =
    raw"SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp FROM documents"

  /** Zipf-law fit over the word-frequency spectrum: OLS slope of
    * ln(freq) vs ln(rank) over the top-`topN` words — the corpus-health
    * number (natural text ≈ −1; a slope collapsing toward 0 flags
    * template/boilerplate floods, steeper flags vocabulary collapse).
    *
    * Scale shape: one token-count aggregate (vocab-sized output), rank
    * via the bucketed [[graft.ops.GlobalRank]] (no single-partition
    * window), then a 5-sum OLS fold. Oracle-exactness: each ln term is
    * rounded to the 6-dp grid BEFORE the decimal-exact sums (libm ln is
    * not correctly-rounded cross-engine; the grid absorbs last-ulp
    * wobble — the entropy-kernel precedent), and slope/intercept are a
    * fixed IEEE op sequence on the exact fold results.
    *
    * @return one row: (n, slope, intercept) */
  def zipfSlope(docs: DataFrame, topN: Int = 1000): DataFrame = {
    import graft.queries.QueryDsl.dsum
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val ranked = graft.ops.GlobalRank.withGlobalRank(
      words.withColumn("_negf", -col("freq").cast("double")), "_negf", "w",
      "rank")
      .filter(col("rank") <= topN)
      .select(round(log(col("rank").cast("double")), 6).as("x"),
        round(log(col("freq").cast("double")), 6).as("y"))
    ranked.agg(
      count(lit(1)).as("n"),
      dsum(col("x")).as("_sx"), dsum(col("y")).as("_sy"),
      dsum(col("x") * col("x")).as("_sxx"),
      dsum(col("x") * col("y")).as("_sxy"))
      .withColumn("slope",
        (col("n") * col("_sxy") - col("_sx") * col("_sy")) /
          (col("n") * col("_sxx") - col("_sx") * col("_sx")))
      .withColumn("intercept",
        (col("_sy") - col("slope") * col("_sx")) / col("n").cast("double"))
      .select(col("n"), col("slope"), col("intercept"))
  }

  /** DuckDB mirror of [[zipfSlope]] (plain global window — GlobalRank
    * recreates it distributively; ties broken identically on word). */
  def zipfSlopeSql(topN: Int = 1000): String = {
    import graft.queries.QueryDsl.dsumSql
    s"""WITH w AS (
       |  SELECT word, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
       |  WHERE word <> '' GROUP BY 1),
       |r AS (
       |  SELECT ROUND(ln(CAST(row_number() OVER
       |      (ORDER BY -CAST(freq AS DOUBLE), word) AS DOUBLE)), 6) AS x,
       |    ROUND(ln(CAST(freq AS DOUBLE)), 6) AS y,
       |    row_number() OVER (ORDER BY -CAST(freq AS DOUBLE), word) AS rnk
       |  FROM w),
       |f AS (SELECT * FROM r WHERE rnk <= $topN),
       |g AS (
       |  SELECT COUNT(*) AS n, ${dsumSql("x")} AS sx, ${dsumSql("y")} AS sy,
       |    ${dsumSql("x * x")} AS sxx, ${dsumSql("x * y")} AS sxy
       |  FROM f)
       |SELECT n,
       |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       |  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
       |    / CAST(n AS DOUBLE) AS intercept
       |FROM g""".stripMargin
  }
}
