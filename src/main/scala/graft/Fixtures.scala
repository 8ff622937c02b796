package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FIXTURE AUGMENTATION — deterministic "dirty data" planted FROM the
  * fixture parquet itself, so both the Spark engine and the DuckDB oracle
  * re-derive the identical augmented corpus from the same files (the
  * `ev_props_nested` / `dedup_lsh_*_prod` device, promoted to a shared
  * home so each new dirty-data contract stops re-implementing its plant
  * inline).
  *
  * Contract for every plant in this object:
  *   - the plant is a PURE function of fixture rows (no RNG state, no
  *     timestamps) — same parquet in, same augmented corpus out, in either
  *     engine;
  *   - planted ids live in a reserved offset band, asserted disjoint from
  *     the base id range by `tools/TenXGen`'s guards (doc_id base < 10^6;
  *     vec_id base < 10^5);
  *   - each Spark-side frame has a same-named `...Sql` CTE-fragment twin
  *     here, interpolated into the oracle so the re-derivation shares one
  *     definition site.
  */
object Fixtures {

  // ---- normalization-variant documents (dedup_normalized) ----

  /** Documents ∪ deterministic formatting variants: every doc_id ≡ 0
    * (mod 40) gains an UPPERCASED copy at id + 10,000,000 and every
    * doc_id ≡ 20 (mod 40) gains a copy with trailing junk punctuation at
    * id + 20,000,000. Both variants are byte-distinct from their source
    * (distinct raw md5) but identical under casefold + non-alphanumeric
    * collapse — exactly the near-miss class an exact-hash dedup run over a
    * real crawl must catch (mirrored-with-different-markup pages), and the
    * base fixture cannot supply (0 exact-dup groups at any sf). */
  def caseVariantDocs(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
    val upperVariant = base.filter(col("doc_id") % 40 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        upper(col("text")).as("text"), col("source"))
    val punctVariant = base.filter(col("doc_id") % 40 === 20)
      .select((col("doc_id") + 20000000L).as("doc_id"),
        concat(col("text"), lit("  ?!")).as("text"), col("source"))
    base.unionAll(upperVariant).unionAll(punctVariant)
  }

  /** [[caseVariantDocs]] as a DuckDB CTE body (`SELECT doc_id, text,
    * source`) — same offsets, same variant expressions. */
  def caseVariantDocsSql: String =
    """SELECT doc_id, text, source FROM documents
      |UNION ALL SELECT doc_id + 10000000, upper(text), source
      |  FROM documents WHERE doc_id % 40 = 0
      |UNION ALL SELECT doc_id + 20000000, text || '  ?!', source
      |  FROM documents WHERE doc_id % 40 = 20""".stripMargin

  // ---- contaminated train vectors (decontam_semantic) ----

  /** ±1 perturbation signs under seed 47 (the LSH plant uses 43, the
    * planes 42 — a distinct stream keeps this plant uncorrelated with
    * both). LCG recipe identical to [[graft.dedup.EmbeddingLsh]]'s. */
  private[graft] val contamSigns: Array[Double] = {
    var s = 47L
    Array.fill(graft.dedup.EmbeddingLsh.Dims) {
      s = (s * 1103515245L + 12345L) & 0x7FFFFFFFL
      if (((s >> 16) & 1L) == 1L) 1.0 else -1.0
    }
  }

  /** The eval split: every vec_id ≡ 0 (mod 50) — the held-out benchmark
    * vectors a decontamination run protects. */
  def evalVecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))

  /** The train split WITH planted contamination: fixture vectors with
    * vec_id ≢ 0 (mod 50), plus a perturbed copy of every eval vector at
    * id + 2,000,000 — coordinates scaled by (1 + 0.3·s_j), s the seed-47
    * ±1 vector, landing each plant at cosine ≈ 0.95-0.96 to its source
    * eval vector while the fixture's own train↔eval cosines top out at
    * ≈ 0.45 (measured at sf0.01/sf0.1). A τ = 0.9 flag therefore isolates
    * exactly the planted leak — the regime a real decontamination run
    * hunts (an eval document that slipped into the crawl, lightly
    * reformatted), which the clean fixture cannot exhibit. */
  def contaminatedTrainVecs(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
    val planted = all.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 2000000L).as("vec_id"),
        zip_with(col("embedding"), typedLit(contamSigns),
          (x, sj) => x * (lit(1.0) + lit(0.3) * sj)).as("embedding"))
    all.filter(col("vec_id") % 50 =!= 0).unionAll(planted)
  }

  // ---- raw-HTML documents (text_html_extract) ----

  /** Documents wrapped in deterministic page chrome — the raw-crawl shape
    * a web-corpus pipeline starts from, which the clean fixture cannot
    * supply. Every page gets a nav bar (3 words, all anchor text), the
    * doc's text as two `<p>` content blocks (split at the word midpoint),
    * and a footer (5 words, ~half anchor text — the block that word-count
    * alone would keep and link density must kill); every doc_id ≡ 0
    * (mod 3) also gets a mid-page ad block. Both engines build the page
    * from the same fixture bytes, so the extractor's input is identical
    * byte-for-byte. */
  def htmlDocs(spark: SparkSession, dir: String): DataFrame =
    htmlDocsFrom(Tables.documents(spark, dir))

  /** [[htmlDocs]] over any (doc_id, text, …) frame — batch or readStream
    * (the page construction is stateless column algebra), so the crawl
    * pipeline's streaming twin can synthesize pages on arrival. */
  def htmlDocsFrom(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val n = size(words)
    val h = ((n + lit(1)) / lit(2)).cast("int")
    val first = array_join(slice(words, lit(1), h), " ")
    val second = array_join(slice(words, h + lit(1), n - h), " ")
    docs.select(col("doc_id"),
      concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title></head><body>"),
        lit("""<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>"""),
        lit("<p>"), first, lit("</p>"),
        when(col("doc_id") % 3 === 0,
          lit("""<div class="ads">Sponsored <a href="/buy">Buy now</a> <a href="/deal">Deal</a></div>"""))
          .otherwise(lit("")),
        lit("<p>"), second, lit("</p>"),
        lit("""<div class="footer"><a href="/tos">Terms</a> <a href="/priv">Privacy</a> (c) 2026 Graft</div>"""),
        lit("</body></html>")).as("html"))
  }

  /** [[htmlDocs]] as a DuckDB CTE body (`SELECT doc_id, html`) — same
    * literals, same midpoint split. */
  def htmlDocsSql: String =
    // operators sit at line ENDS: this fragment is re-interpolated into a
    // stripMargin'd oracle, and a leading `||` would lose a pipe there
    """SELECT doc_id,
      |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title></head><body>' ||
      |  '<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>' ||
      |  '<p>' || array_to_string(words[1:h], ' ') || '</p>' ||
      |  CASE WHEN doc_id % 3 = 0
      |       THEN '<div class="ads">Sponsored <a href="/buy">Buy now</a> <a href="/deal">Deal</a></div>'
      |       ELSE '' END ||
      |  '<p>' || array_to_string(words[h+1:n], ' ') || '</p>' ||
      |  '<div class="footer"><a href="/tos">Terms</a> <a href="/priv">Privacy</a> (c) 2026 Graft</div>' ||
      |  '</body></html>' AS html
      |FROM (SELECT doc_id, words, len(words) AS n, (len(words) + 1) // 2 AS h
      |      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents))""".stripMargin

  // ---- crawl URLs (dedup_url) ----

  /** One raw URL per document, planted so every 5-doc band points at the
    * SAME page through the five aliasing channels a real crawl produces:
    * the plain form, scheme+host case noise with a trailing slash, a
    * `www.` prefix with the explicit default port, tracking parameters
    * (utm_*), and — the deliberate NON-dup — a variant whose query
    * carries a real `id` parameter (plus a tracking param and a
    * fragment): canonicalization must strip the noise AND preserve the
    * meaningful parameter, or it either misses dups or merges distinct
    * pages. */
  def urlDocs(spark: SparkSession, dir: String): DataFrame =
    urlDocsFrom(Tables.documents(spark, dir))

  /** [[urlDocs]] over any (doc_id, …) frame — stateless column algebra,
    * usable on a readStream for the crawl pipeline's streaming twin. */
  def urlDocsFrom(docs: DataFrame): DataFrame = {
    val g = expr("doc_id DIV 5")
    val h = concat(lit("ex-"), (g % 7).cast("string"), lit(".org"))
    val p = concat(lit("/docs/"), g.cast("string"))
    docs.select(col("doc_id"),
      when(col("doc_id") % 5 === 0, concat(lit("https://"), h, p))
        .when(col("doc_id") % 5 === 1, concat(lit("HTTPS://"), upper(h), p, lit("/")))
        .when(col("doc_id") % 5 === 2, concat(lit("https://www."), h, lit(":443"), p))
        .when(col("doc_id") % 5 === 3,
          concat(lit("https://"), h, p, lit("?utm_source=feed&utm_campaign=x")))
        .otherwise(concat(lit("https://"), h, p, lit("?id=7&utm_medium=a#frag")))
        .as("url"))
  }

  /** [[urlDocs]] as a DuckDB CTE body (`SELECT doc_id, url`). */
  def urlDocsSql: String =
    """SELECT doc_id,
      |  CASE doc_id % 5
      |    WHEN 0 THEN 'https://' || h || p
      |    WHEN 1 THEN 'HTTPS://' || upper(h) || p || '/'
      |    WHEN 2 THEN 'https://www.' || h || ':443' || p
      |    WHEN 3 THEN 'https://' || h || p || '?utm_source=feed&utm_campaign=x'
      |    ELSE 'https://' || h || p || '?id=7&utm_medium=a#frag' END AS url
      |FROM (SELECT doc_id,
      |        'ex-' || CAST((doc_id // 5) % 7 AS VARCHAR) || '.org' AS h,
      |        '/docs/' || CAST(doc_id // 5 AS VARCHAR) AS p
      |      FROM documents)""".stripMargin

  /** [[evalVecs]] + [[contaminatedTrainVecs]] as DuckDB CTEs `ev(eval_id,
    * ee)` and `tr(train_id, te)` — same sign literals, same operand
    * order (`emb[j] * (1 + 0.3 * s[j])`). */
  def contamCtesSql: String = {
    val s = contamSigns.map(v => s"$v").mkString("[", ",", "]")
    val dims = graft.dedup.EmbeddingLsh.Dims
    s"""b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |ev AS (SELECT vec_id AS eval_id, emb AS ee FROM b WHERE vec_id % 50 = 0),
       |pl AS (SELECT vec_id + 2000000 AS train_id,
       |         list_transform(generate_series(1, $dims),
       |           j -> emb[j] * (CAST(1.0 AS DOUBLE) + CAST(0.3 AS DOUBLE) * ($s)[j])) AS te
       |       FROM b WHERE vec_id % 50 = 0),
       |tr AS (SELECT vec_id AS train_id, emb AS te FROM b WHERE vec_id % 50 <> 0
       |       UNION ALL SELECT train_id, te FROM pl)""".stripMargin
  }
}
