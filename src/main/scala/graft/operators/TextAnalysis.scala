package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text-analysis operators for the training-data pipeline: quality scoring,
  * language ID (marker-word heuristic), token counting (whitespace + a
  * BPE-ish regex), document fingerprinting, and the binary-column
  * (multimodal) metadata path.
  *
  * All per-document map-side work — no shuffle at all except the final
  * presentation sort; at 100 TB these run at scan speed with full
  * whole-stage codegen (plain string/regexp builtins, no UDFs).
  */
object TextAnalysis {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")
  private val stopListSql = stopwords.map(w => s"'$w'").mkString("(", ",", ")")

  val queries: Seq[GraftQuery] = Seq(

    // BM25 retrieval scoring (Robertson idf, k1=1.2, b=0.75) for a fixed
    // query term set — the retrieval primitive behind corpus search and
    // RAG-style training-data selection. Scale shape: tokens are filtered
    // to the query terms BEFORE the tf aggregate (the explode never
    // shuffles non-matching words), df and the corpus stats are tiny
    // broadcast sides, so the only full-width shuffle is the tf groupBy
    // keyed by (doc, term). Per-term contributions are combined by
    // FIXED-ORDER addition (one conditional max per term, then an explicit
    // sum) — a float sum over an unordered group would be
    // accumulation-order-dependent and could not hash-match any oracle.
    GraftQuery(
      "q_bm25",
      (s, dir) => {
        val terms = Seq("spark", "join", "window")
        val docs = Tables(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .withColumn("dl", size(col("ws")).cast(LongType))
        val stats = docs.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
        val tf = docs.select(col("doc_id"), col("dl"), explode(col("ws")).as("w"))
          .filter(col("w").isInCollection(terms))
          .groupBy("doc_id", "dl", "w").agg(count(lit(1)).as("tf"))
        val df_ = tf.groupBy("w").agg(count(lit(1)).as("df"))
        val contrib = tf.join(broadcast(df_), "w")
          .crossJoin(broadcast(stats))
          .withColumn("avgdl",
            col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .withColumn("idf",
            log(lit(1.0) + (col("n_docs").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
          .withColumn("contrib",
            (col("idf") * (col("tf") * lit(2.2))) /
              (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        val perTerm = terms.map(t =>
          coalesce(max(when(col("w") === t, col("contrib"))), lit(0.0)))
        contrib.groupBy("doc_id")
          .agg((floor(perTerm.reduce(_ + _) * lit(1e6) + lit(0.5)) / lit(1e6)).as("bm25"))
          .orderBy("doc_id")
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
             |  FROM documents
             |),
             |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM docs),
             |tok AS (SELECT doc_id, dl, unnest(ws) AS w FROM docs),
             |tf AS (
             |  SELECT doc_id, dl, w, count(*) AS tf FROM tok
             |  WHERE w IN ('spark', 'join', 'window') GROUP BY 1, 2, 3
             |),
             |dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
             |c AS (
             |  SELECT tf.doc_id, tf.w,
             |    (ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) * (tf * 2.2)) /
             |      (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS contrib
             |  FROM tf JOIN dfq USING (w) CROSS JOIN stats
             |)
             |SELECT doc_id,
             |  floor((coalesce(max(CASE WHEN w = 'spark' THEN contrib END), 0.0)
             |       + coalesce(max(CASE WHEN w = 'join' THEN contrib END), 0.0)
             |       + coalesce(max(CASE WHEN w = 'window' THEN contrib END), 0.0)) * 1e6 + 0.5) / 1e6 AS bm25
             |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),

    // Gopher-style quality rules (Rae et al. 2021 §A1.1, re-expressed for
    // this corpus's lowercase-ASCII text): word count bounds, mean word
    // length in [3,10], >=2 distinct stopwords, >=80% words containing a
    // letter, <=10% symbol characters. Pure map-side metrics (scan-speed,
    // fully codegen'd); the keep flag is evaluated on EXACT integer-ratio
    // doubles (one division of exact ints per ratio), so the boolean can
    // never disagree between engines even though displayed ratios are
    // rounded for the hash.
    GraftQuery(
      "q_gopher_rules",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
          .withColumn("ws", split(col("text"), " "))
          .withColumn("n_words", size(col("ws")).cast(LongType))
          .withColumn("sum_wlen",
            aggregate(col("ws"), lit(0L), (acc, w) => acc + length(w)))
          .withColumn("n_alpha",
            size(filter(col("ws"), w => w.rlike("[a-z]"))).cast(LongType))
          .withColumn("n_stop",
            size(filter(array_distinct(col("ws")), w => w.isInCollection(stopwords))).cast(LongType))
          .withColumn("mean_wlen", col("sum_wlen").cast("double") / col("n_words"))
          .withColumn("alpha_frac", col("n_alpha").cast("double") / col("n_words"))
          .withColumn("symbol_ratio",
            (length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9 ]", ""))).cast("double")
              / length(col("text")))
        d.select(
          col("doc_id"), col("n_words"), col("n_stop"),
          (floor(col("mean_wlen") * lit(1e6) + lit(0.5)) / lit(1e6)).as("mean_wlen"),
          (floor(col("alpha_frac") * lit(1e6) + lit(0.5)) / lit(1e6)).as("alpha_frac"),
          (floor(col("symbol_ratio") * lit(1e6) + lit(0.5)) / lit(1e6)).as("symbol_ratio"),
          (col("n_words").between(50L, 100000L) &&
            col("mean_wlen").between(3.0, 10.0) &&
            col("n_stop") >= 2L &&
            col("alpha_frac") >= 0.8 &&
            col("symbol_ratio") <= 0.1).as("keep"),
        ).orderBy("doc_id")
      },
      Some(s"""WITH m AS (
              |  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
              |),
              |r AS (
              |  SELECT doc_id,
              |    CAST(len(ws) AS BIGINT) AS n_words,
              |    CAST(len(list_filter(list_distinct(ws), w -> w IN $stopListSql)) AS BIGINT) AS n_stop,
              |    CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / len(ws) AS mean_wlen,
              |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len(ws) AS alpha_frac,
              |    CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text) AS symbol_ratio
              |  FROM m
              |)
              |SELECT doc_id, n_words, n_stop,
              |  floor(mean_wlen * 1e6 + 0.5) / 1e6 AS mean_wlen,
              |  floor(alpha_frac * 1e6 + 0.5) / 1e6 AS alpha_frac,
              |  floor(symbol_ratio * 1e6 + 0.5) / 1e6 AS symbol_ratio,
              |  (n_words BETWEEN 50 AND 100000 AND mean_wlen BETWEEN 3.0 AND 10.0
              |    AND n_stop >= 2 AND alpha_frac >= 0.8 AND symbol_ratio <= 0.1) AS keep
              |FROM r ORDER BY doc_id""".stripMargin),
    ),

    // Quality scoring: length/punctuation/stopword signals → a composite
    // score; the standard pre-training corpus filters.
    GraftQuery(
      "q_text_quality",
      (s, dir) => {
        val d = Tables(s, dir, "documents")
          .withColumn("ws", split(col("text"), " "))
          .withColumn("n_words", size(col("ws")).cast("long"))
          .withColumn("n_stop",
            size(filter(col("ws"), w => w.isInCollection(stopwords))).cast("long"))
          .withColumn("n_punct",
            (length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9 ]", ""))).cast("long"))
          .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_words"))
          .withColumn("punct_ratio", col("n_punct").cast("double") / length(col("text")))
        d.select(
          col("doc_id"), col("n_words"), col("n_stop"), col("n_punct"),
          (floor(col("stop_ratio") * lit(1e6) + lit(0.5)) / lit(1e6)).as("stop_ratio"),
          (floor(col("punct_ratio") * lit(1e6) + lit(0.5)) / lit(1e6)).as("punct_ratio"),
          (floor(
            least(lit(1.0), col("n_words").cast("double") / lit(100.0)) *
              (lit(1.0) - col("stop_ratio")) * (lit(1.0) - col("punct_ratio")) * lit(1e6)
              + lit(0.5)) / lit(1e6)).as("quality"),
        ).orderBy("doc_id")
      },
      Some(s"""WITH d AS (
              |  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
              |),
              |m AS (
              |  SELECT doc_id,
              |    CAST(len(ws) AS BIGINT) AS n_words,
              |    CAST(len(list_filter(ws, w -> w IN $stopListSql)) AS BIGINT) AS n_stop,
              |    CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
              |    CAST(len(list_filter(ws, w -> w IN $stopListSql)) AS DOUBLE) / len(ws) AS stop_ratio,
              |    CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio
              |  FROM d
              |)
              |SELECT doc_id, n_words, n_stop, n_punct,
              |  floor(stop_ratio * 1e6 + 0.5) / 1e6 AS stop_ratio,
              |  floor(punct_ratio * 1e6 + 0.5) / 1e6 AS punct_ratio,
              |  floor(least(1.0, CAST(n_words AS DOUBLE) / 100.0) * (1.0 - stop_ratio) * (1.0 - punct_ratio) * 1e6 + 0.5) / 1e6 AS quality
              |FROM m ORDER BY doc_id""".stripMargin),
    ),

    // Language ID: marker-word n-gram heuristic — per-language marker hits,
    // argmax with deterministic tie order, 'und' when nothing matches.
    GraftQuery(
      "q_lang_id",
      (s, dir) => {
        val en = Seq("the", "a", "and", "of")
        val markers = Seq("en" -> en,
          "fr" -> Seq("le", "la", "et", "de"),
          "de" -> Seq("der", "die", "und", "das"))
        var d = Tables(s, dir, "documents").withColumn("ws", split(col("text"), " "))
        markers.foreach { case (lang, ms) =>
          d = d.withColumn(s"hits_$lang",
            size(filter(col("ws"), w => w.isInCollection(ms))).cast("long"))
        }
        d.select(
          col("doc_id"), col("lang").as("declared_lang"),
          col("hits_en"), col("hits_fr"), col("hits_de"),
          when(col("hits_en") >= col("hits_fr") && col("hits_en") >= col("hits_de") && col("hits_en") > 0, "en")
            .when(col("hits_fr") >= col("hits_de") && col("hits_fr") > 0, "fr")
            .when(col("hits_de") > 0, "de")
            .otherwise("und").as("predicted_lang"),
        ).orderBy("doc_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id, lang,
             |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','and','of'))) AS BIGINT) AS hits_en,
             |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','et','de'))) AS BIGINT) AS hits_fr,
             |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','und','das'))) AS BIGINT) AS hits_de
             |  FROM documents
             |)
             |SELECT doc_id, lang AS declared_lang, hits_en, hits_fr, hits_de,
             |  CASE WHEN hits_en >= hits_fr AND hits_en >= hits_de AND hits_en > 0 THEN 'en'
             |       WHEN hits_fr >= hits_de AND hits_fr > 0 THEN 'fr'
             |       WHEN hits_de > 0 THEN 'de'
             |       ELSE 'und' END AS predicted_lang
             |FROM m ORDER BY doc_id""".stripMargin),
    ),

    // Token counting: whitespace tokens + a BPE-ish regex segmentation
    // (letter runs / digit runs / single symbols).
    GraftQuery(
      "q_token_count",
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("ws_tokens"),
            size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
              .cast("long").as("bpeish_tokens"),
            col("n_chars"),
          ).orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpeish_tokens,
             |  n_chars
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // Fingerprinting: content hash of the normalized token set (the md5 of
    // the sorted distinct words) + a short prefix fingerprint.
    GraftQuery(
      "q_fingerprint",
      (s, dir) => {
        Tables(s, dir, "documents")
          .withColumn("fp",
            md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " "))))))
          .select(col("doc_id"), col("fp"), substring(col("fp"), 1, 16).as("fp16"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, fp, substr(fp, 1, 16) AS fp16 FROM (
             |  SELECT doc_id,
             |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
             |  FROM documents
             |) ORDER BY doc_id""".stripMargin),
    ),

    // Order-SENSITIVE document fingerprint: Karp–Rabin rolling hash folded
    // over the word sequence (q_fingerprint's sorted-set md5 is the
    // order-insensitive twin). Word values come from the first 8 md5 hex
    // chars so both engines fold identical integers; base/mod sized so
    // h·base + w stays under 2^51 (no 64-bit wrap, which the engines
    // handle differently).
    GraftQuery(
      "q_rolling_hash",
      (s, dir) => {
        val mod = 2147483647L
        val base = 1000003L
        val words = split(col("text"), " ")
        Tables(s, dir, "documents")
          .withColumn("rh",
            aggregate(
              transform(words, w => conv(substring(md5(w), 1, 8), 16, 10).cast(LongType)),
              lit(0L),
              (h, wv) => (h * lit(base) + wv) % lit(mod),
            ))
          .select(col("doc_id"), col("rh"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ' '),
             |      w -> list_reduce(
             |        list_transform(string_split_regex(substr(md5(w), 1, 8), ''),
             |          c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
             |        (a, b) -> a * 16 + b))),
             |    (h, wv) -> (h * 1000003 + wv) % 2147483647
             |  ) AS rh
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // TF-IDF-style term scoring, exact-ratio variant: score = tf·N/df with
    // integer tf/df/N so the only float op is one IEEE division (identical
    // bits in both engines; ln-based idf would risk 1-ulp libm divergence).
    // Top-3 terms per doc by (score desc, term) — the canonical
    // tokenize → aggregate → join → window keyword-extraction pipeline.
    GraftQuery(
      "q_tfidf",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables(s, dir, "documents")
        val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        // df(w) = #docs containing w = #tf rows with that w: derived from
        // the already-aggregated tf relation (no second explode over the
        // corpus, and the exchange under tf is reused for both sides). No
        // explicit broadcast hint: vocabulary is unbounded in the corpus, so
        // a forced broadcast could exceed the driver/broadcast limit at
        // scale — AQE picks broadcast at runtime whenever df_ is small.
        val df_ = tf.groupBy("w").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val win = Window.partitionBy("doc_id").orderBy(col("score").desc, col("w"))
        tf.join(df_, "w")
          .crossJoin(broadcast(n))
          .withColumn("score",
            (col("tf") * col("n_docs")).cast("double") / col("df"))
          .withColumn("rn", row_number().over(win))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("w").as("term"), col("rn"), col("score"))
          .orderBy("doc_id", "rn")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
             |),
             |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
             |df AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY w),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.w, CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
             |  FROM tf JOIN df ON tf.w = df.w CROSS JOIN n
             |),
             |ranked AS (
             |  SELECT doc_id, w, score,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rn
             |  FROM scored
             |)
             |SELECT doc_id, w AS term, rn, score FROM ranked WHERE rn <= 3
             |ORDER BY doc_id, rn""".stripMargin),
    ),

    // Character-distribution entropy: a corpus-statistics quality signal
    // (low entropy ⇒ repetitive/degenerate text). Transcendental sums are
    // safe under primitive rounding (no exact half-boundaries).
    GraftQuery(
      "q_char_entropy",
      (s, dir) => {
        val counts = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(regexp_extract_all(col("text"), lit("."), lit(0))).as("ch"))
          .groupBy("doc_id", "ch").agg(count(lit(1)).as("n"))
        val withLen = counts
          .withColumn("len", sum("n").over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
          .withColumn("p", col("n").cast("double") / col("len"))
        withLen.groupBy("doc_id")
          .agg((floor(-sum(col("p") * log(col("p"))) * lit(1e4) + lit(0.5)) / lit(1e4)).as("entropy"))
          .orderBy("doc_id")
      },
      Some("""WITH counts AS (
             |  SELECT doc_id, ch, count(*) AS n FROM (
             |    SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch FROM documents
             |  ) GROUP BY doc_id, ch
             |),
             |p AS (
             |  SELECT doc_id, CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY doc_id) AS p
             |  FROM counts
             |)
             |SELECT doc_id, floor(-sum(p * ln(p)) * 1e4 + 0.5) / 1e4 AS entropy
             |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),

    // Multimodal binary-column plumbing: opaque bytes + typed metadata —
    // byte length, content hash, head bytes in base64. The decode /
    // feature-extract stage for real media lives in graft.multimodal
    // (deterministic stub — no media libs in this container).
    GraftQuery(
      "q_multimodal_meta",
      (s, dir) => {
        Tables(s, dir, "documents")
          .withColumn("blob", col("text").cast("binary"))
          .select(
            col("doc_id"),
            expr("octet_length(blob)").cast("long").as("n_bytes"),
            md5(col("blob")).as("content_md5"),
            base64(substring(col("text"), 1, 8).cast("binary")).as("head_b64"),
          ).orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |  md5(text) AS content_md5,
             |  to_base64(encode(substr(text, 1, 8))) AS head_b64
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // Repetition signals (the Gopher/MassiveText quality rules): duplicate
    // word / bigram fractions are map-side; the top-word fraction needs the
    // per-(doc, word) counts — one explode + two partial-aggregated
    // shuffles, the same shape as TF-IDF's tf stage.
    GraftQuery(
      "q_repetition",
      (s, dir) => repetitionStats(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH base AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
             |),
             |b2 AS (
             |  SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS words,
             |    list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS bigrams
             |  FROM base
             |),
             |tf AS (
             |  SELECT doc_id, w, count(*) AS c
             |  FROM base, unnest(ws) AS t(w) GROUP BY doc_id, w
             |),
             |top AS (SELECT doc_id, max(c) AS top_c FROM tf GROUP BY doc_id)
             |SELECT b.doc_id, b.words,
             |  floor((1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / words) * 1e6 + 0.5) / 1e6 AS dup_word_frac,
             |  floor((CASE WHEN len(bigrams) > 0
             |    THEN 1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams)
             |    ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS dup_bigram_frac,
             |  floor((CAST(top_c AS DOUBLE) / words) * 1e6 + 0.5) / 1e6 AS top_word_frac
             |FROM b2 b JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin),
    ),

    // Token-budget shard packing, per source (the training-shard builder).
    GraftQuery(
      "q_shard_pack",
      (s, dir) => shardPack(Tables(s, dir, "documents"), "doc_id", "text", "source", 2000L)
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
             |  FROM documents
             |),
             |c AS (
             |  SELECT *, CAST(coalesce(sum(tokens) OVER (
             |    PARTITION BY source ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
             |  FROM t
             |)
             |SELECT doc_id, source, tokens,
             |  cum_before // 2000 AS shard_id,
             |  cum_before - (cum_before // 2000) * 2000 AS shard_offset
             |FROM c ORDER BY doc_id""".stripMargin),
    ),

    // Per-source KL divergence from the corpus unigram mix (see sourceKl).
    GraftQuery(
      "q_kl_source",
      (s, dir) => sourceKl(Tables(s, dir, "documents"), "text", "source")
        .orderBy("source"),
      Some("""WITH tok AS (
             |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
             |sw AS (SELECT source, w, count(*) AS csw FROM tok GROUP BY 1, 2),
             |cw AS (SELECT w, count(*) AS cw FROM tok GROUP BY 1),
             |ns AS (
             |  SELECT source, CAST(sum(csw) AS BIGINT) AS n,
             |    count(*) AS types
             |  FROM sw GROUP BY 1),
             |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS nn FROM cw),
             |lp AS (
             |  SELECT s.source, s.csw, ns.n, ns.types,
             |    CAST(floor((ln(CAST(s.csw AS DOUBLE) / CAST(ns.n AS DOUBLE)) -
             |      ln(CAST(c.cw AS DOUBLE) / CAST(t.nn AS DOUBLE))) * 1e6 + 0.5) AS BIGINT) AS lp
             |  FROM sw s JOIN cw c USING (w) JOIN ns ON ns.source = s.source
             |  CROSS JOIN tot t)
             |SELECT source, max(n) AS n_tokens, CAST(max(types) AS BIGINT) AS n_types,
             |  CAST(CAST(floor(CAST(sum(csw * lp) AS DOUBLE) / CAST(max(n) AS DOUBLE)) AS BIGINT) AS DOUBLE) / 1e6 AS kl
             |FROM lp GROUP BY source ORDER BY source""".stripMargin),
    ),

    // ROUGE-1/ROUGE-2 overlap scoring between adjacent same-source doc
    // pairs — the generation-eval row (clipped-count ROUGE, integer
    // micros end-to-end; see rougePairs).
    GraftQuery(
      "q_rouge",
      (s, dir) => rougePairs(Tables(s, dir, "documents"), "doc_id", "text", "source")
        .orderBy("doc_id"),
      Some("""WITH base AS (
             |  SELECT CAST(doc_id AS BIGINT) AS doc_id, source, text,
             |    string_split(text, ' ') AS ws
             |  FROM documents),
             |rk AS (
             |  SELECT doc_id, source,
             |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
             |  FROM base),
             |pairs AS (
             |  SELECT x.doc_id AS a, y.doc_id AS b
             |  FROM rk x JOIN rk y ON y.source = x.source AND y.rn = x.rn + 1),
             |tf1 AS (
             |  SELECT doc_id, g, count(*) AS c
             |  FROM (SELECT doc_id, unnest(ws) AS g FROM base) GROUP BY 1, 2),
             |t1 AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS t FROM base),
             |b2 AS (
             |  SELECT doc_id,
             |    list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS gs
             |  FROM base),
             |tf2 AS (
             |  SELECT doc_id, g, count(*) AS c
             |  FROM (SELECT doc_id, unnest(gs) AS g FROM b2) GROUP BY 1, 2),
             |t2 AS (SELECT doc_id, CAST(len(gs) AS BIGINT) AS t FROM b2),
             |o1 AS (
             |  SELECT p.a, p.b, CAST(sum(least(x.c, y.c)) AS BIGINT) AS ov
             |  FROM pairs p JOIN tf1 x ON x.doc_id = p.a
             |    JOIN tf1 y ON y.doc_id = p.b AND y.g = x.g
             |  GROUP BY 1, 2),
             |o2 AS (
             |  SELECT p.a, p.b, CAST(sum(least(x.c, y.c)) AS BIGINT) AS ov
             |  FROM pairs p JOIN tf2 x ON x.doc_id = p.a
             |    JOIN tf2 y ON y.doc_id = p.b AND y.g = x.g
             |  GROUP BY 1, 2),
             |j AS (
             |  SELECT p.a, p.b, coalesce(o1.ov, 0) AS ov1, coalesce(o2.ov, 0) AS ov2,
             |    ta1.t AS ta1, tb1.t AS tb1, ta2.t AS ta2, tb2.t AS tb2
             |  FROM pairs p
             |  LEFT JOIN o1 ON o1.a = p.a AND o1.b = p.b
             |  LEFT JOIN o2 ON o2.a = p.a AND o2.b = p.b
             |  JOIN t1 ta1 ON ta1.doc_id = p.a JOIN t1 tb1 ON tb1.doc_id = p.b
             |  JOIN t2 ta2 ON ta2.doc_id = p.a JOIN t2 tb2 ON tb2.doc_id = p.b)
             |SELECT a AS doc_id, b AS ref_id, ov1, ov2,
             |  CAST(CASE WHEN ta1 > 0 THEN CAST(floor(CAST(ov1 * 1000000 AS DOUBLE) / ta1) AS BIGINT) ELSE 0 END AS DOUBLE) / 1e6 AS rouge1_p,
             |  CAST(CASE WHEN tb1 > 0 THEN CAST(floor(CAST(ov1 * 1000000 AS DOUBLE) / tb1) AS BIGINT) ELSE 0 END AS DOUBLE) / 1e6 AS rouge1_r,
             |  CAST(CASE WHEN ta1 + tb1 > 0 THEN CAST(floor(CAST(ov1 * 2 * 1000000 AS DOUBLE) / (ta1 + tb1)) AS BIGINT) ELSE 0 END AS DOUBLE) / 1e6 AS rouge1_f,
             |  CAST(CASE WHEN ta2 + tb2 > 0 THEN CAST(floor(CAST(ov2 * 2 * 1000000 AS DOUBLE) / (ta2 + tb2)) AS BIGINT) ELSE 0 END AS DOUBLE) / 1e6 AS rouge2_f
             |FROM j ORDER BY doc_id""".stripMargin),
    ),

    // BLEU-2/BLEU-4 between the same adjacent same-source pairs as
    // q_rouge — clipped precisions, brevity penalty, quantized-ln
    // product (see bleuPairs).
    GraftQuery(
      "q_bleu",
      (s, dir) => bleuPairs(Tables(s, dir, "documents"), "doc_id", "text", "source")
        .orderBy("doc_id"),
      Some {
        def gramsSql(n: Int) =
          s"list_transform(range(1, greatest(len(ws) - ${n - 2}, 1)), " +
            s"i -> array_to_string(list_slice(ws, i, i + ${n - 1}), ' '))"
        def tfB(n: Int) =
          if (n == 1)
            s"""tf1 AS (
               |  SELECT doc_id, g, count(*) AS c
               |  FROM (SELECT doc_id, unnest(ws) AS g FROM base) GROUP BY 1, 2),
               |t1 AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS t FROM base)""".stripMargin
          else
            s"""tf$n AS (
               |  SELECT doc_id, g, count(*) AS c
               |  FROM (SELECT doc_id, unnest(${gramsSql(n)}) AS g FROM base) GROUP BY 1, 2),
               |t$n AS (SELECT doc_id, CAST(len(${gramsSql(n)}) AS BIGINT) AS t FROM base)""".stripMargin
        def ovB(n: Int) =
          s"""o$n AS (
             |  SELECT p.a, p.b, CAST(sum(least(x.c, y.c)) AS BIGINT) AS ov
             |  FROM pairs p JOIN tf$n x ON x.doc_id = p.a
             |    JOIN tf$n y ON y.doc_id = p.b AND y.g = x.g
             |  GROUP BY 1, 2)""".stripMargin
        val lpSql = (1 to 4).map(n =>
          s"CASE WHEN ov$n > 0 THEN CAST(floor(ln(CAST(ov$n AS DOUBLE) / CAST(ta$n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) END AS lp$n").mkString(",\n    ")
        def bleuSql(upTo: Int) = {
          val s = (1 to upTo).map(n => s"lp$n").mkString(" + ")
          s"coalesce(floor(exp(CAST(($s) AS DOUBLE) / ${upTo}e6 + bp) * 1e6 + 0.5) / 1e6, 0.0)"
        }
        s"""WITH base AS (
           |  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           |    string_split(text, ' ') AS ws
           |  FROM documents),
           |rk AS (
           |  SELECT doc_id, source,
           |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
           |  FROM base),
           |pairs AS (
           |  SELECT x.doc_id AS a, y.doc_id AS b
           |  FROM rk x JOIN rk y ON y.source = x.source AND y.rn = x.rn + 1),
           |${(1 to 4).map(tfB).mkString(",\n")},
           |${(1 to 4).map(ovB).mkString(",\n")},
           |j AS (
           |  SELECT p.a, p.b,
           |    ${(1 to 4).map(n => s"coalesce(o$n.ov, 0) AS ov$n").mkString(", ")},
           |    ${(1 to 4).map(n => s"ta$n.t AS ta$n").mkString(", ")},
           |    tr.t AS r
           |  FROM pairs p
           |  ${(1 to 4).map(n => s"LEFT JOIN o$n ON o$n.a = p.a AND o$n.b = p.b").mkString("\n  ")}
           |  ${(1 to 4).map(n => s"JOIN t$n ta$n ON ta$n.doc_id = p.a").mkString("\n  ")}
           |  JOIN t1 tr ON tr.doc_id = p.b),
           |k AS (
           |  SELECT *,
           |    least(CAST(0 AS DOUBLE),
           |      CAST(ta1 - r AS DOUBLE) / CAST(ta1 AS DOUBLE)) AS bp,
           |    $lpSql
           |  FROM j)
           |SELECT a AS doc_id, b AS ref_id, ov1, ov2, ov3, ov4,
           |  ${bleuSql(2)} AS bleu2,
           |  ${bleuSql(4)} AS bleu4
           |FROM k ORDER BY doc_id""".stripMargin
      },
    ),

    // Best-fit-decreasing sequence packing (sample packing for training
    // sequences). Oracle: an independent DuckDB replay of the same
    // deterministic policy — a recursive CTE carrying each (source, chunk)
    // pack's open-sequence residuals as a BIGINT[] list column, one doc
    // placed per recursion step; best-fit-by-(capacity, id) is
    // list_sort(list_filter(list_zip(residuals, idx)))[1] (struct sort =
    // capacity then id, exactly the engine's tie-break).
    GraftQuery(
      "q_seq_pack",
      (s, dir) => seqPack(Tables(s, dir, "documents"), "doc_id", "text", "source", 512L, 256)
        .orderBy("doc_id"),
      Some("""WITH RECURSIVE d0 AS MATERIALIZED (
             |  SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
             |  FROM documents
             |),
             |d AS MATERIALIZED (
             |  SELECT *, CAST(row_number() OVER (
             |    PARTITION BY source ORDER BY tokens DESC, doc_id) - 1 AS BIGINT) AS rk
             |  FROM d0
             |),
             |dc AS MATERIALIZED (
             |  SELECT doc_id, source, tokens, rk // 256 AS chunk, rk % 256 AS step FROM d
             |),
             |step AS (
             |  SELECT source, chunk, CAST(-1 AS BIGINT) AS i, CAST([] AS BIGINT[]) AS residuals,
             |         CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS tokens,
             |         CAST(NULL AS BIGINT) AS bin, CAST(NULL AS BIGINT) AS seq_offset
             |  FROM (SELECT DISTINCT source, chunk FROM dc)
             |  UNION ALL
             |  SELECT source, chunk, i,
             |    CASE WHEN best_idx IS NULL THEN list_append(residuals, 512 - tokens)
             |         ELSE list_transform(list_zip(residuals, range(1, len(residuals)+1)),
             |                z -> CASE WHEN z[2] = best_idx THEN z[1] - tokens ELSE z[1] END)
             |    END AS residuals,
             |    doc_id, tokens,
             |    COALESCE(best_idx, len(residuals)+1) - 1 AS bin,
             |    CASE WHEN best_idx IS NULL THEN CAST(0 AS BIGINT)
             |         ELSE 512 - residuals[CAST(best_idx AS INT)] END AS seq_offset
             |  FROM (
             |    SELECT s.source, s.chunk, s.i + 1 AS i, s.residuals, c.doc_id, c.tokens,
             |      list_sort(list_filter(list_zip(s.residuals, range(1, len(s.residuals)+1)),
             |        z -> z[1] >= c.tokens))[1][2] AS best_idx
             |    FROM step s JOIN dc c
             |      ON c.source = s.source AND c.chunk = s.chunk AND c.step = s.i + 1
             |  )
             |)
             |SELECT doc_id, source, tokens, chunk * 256 + bin AS seq_id, seq_offset
             |FROM step WHERE doc_id IS NOT NULL ORDER BY doc_id""".stripMargin),
    ),

    // Corpus balancing: per-source quality quota (top-k per domain).
    GraftQuery(
      "q_domain_quota",
      (s, dir) => domainQuota(Tables(s, dir, "documents"), "doc_id", "source", "n_chars", 20)
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS quality,
             |  CAST(row_number() OVER (
             |    PARTITION BY source ORDER BY n_chars DESC, doc_id) AS BIGINT) AS src_rank,
             |  row_number() OVER (
             |    PARTITION BY source ORDER BY n_chars DESC, doc_id) <= 20 AS kept
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // Inverted index: term → document frequency + bounded posting list.
    // One explode of per-doc DISTINCT terms, one partial-aggregated
    // groupBy; postings sort deterministically (numeric sort BEFORE the
    // string render) and CAP at 20 ids (a hot term's full posting list is
    // unbounded — the real layout shards postings across files; the capped
    // prefix is the join-able summary). The posting list is emitted as a
    // comma-joined STRING, not an array: same information, and a scalar
    // column hashes in any downstream comparator/exchange format.
    GraftQuery(
      "q_inverted_index",
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("term"))
          .groupBy("term")
          .agg(count(lit(1)).as("df"),
            concat_ws(",", transform(
              slice(array_sort(collect_list(col("doc_id"))), 1, 20),
              _.cast("string"))).as("postings"))
          .orderBy("term")
      },
      Some("""SELECT term, count(*) AS df,
             |  array_to_string(list_slice(list_sort(list(doc_id)), 1, 20), ',') AS postings
             |FROM (
             |  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
             |  FROM documents
             |)
             |GROUP BY term ORDER BY term""".stripMargin),
    ),

    // Privacy pass: email / long-digit-run redaction with match counts.
    GraftQuery(
      "q_scrub_pii",
      (s, dir) => scrubPii(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH e AS (
             |  SELECT doc_id, text,
             |    regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+\.[a-z]+', '<EMAIL>', 'g') AS es
             |  FROM documents
             |)
             |SELECT doc_id,
             |  regexp_replace(es, '[0-9]{6,}', '<NUM>', 'g') AS scrubbed,
             |  CAST(len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+\.[a-z]+')) AS BIGINT) AS n_emails,
             |  CAST(len(regexp_extract_all(es, '[0-9]{6,}')) AS BIGINT) AS n_digit_runs
             |FROM e ORDER BY doc_id""".stripMargin),
    ),

    // Corpus-LM fluency proxy: average corpus-wide bigram frequency per
    // document — the CCNet-style LM quality signal with the corpus itself
    // as the language model (no external wiki LM in this container).
    GraftQuery(
      "q_lm_score",
      (s, dir) => lmScore(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |occ AS (
             |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws), 1)),
             |    i -> array_to_string(list_slice(ws, i, i + 1), ' '))) AS g
             |  FROM base
             |),
             |c AS (SELECT g, count(*) AS c FROM occ GROUP BY g),
             |s AS (
             |  SELECT doc_id, count(*) AS n_bigrams, sum(c.c) AS sc
             |  FROM occ JOIN c USING (g) GROUP BY doc_id
             |)
             |SELECT b.doc_id, CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             |  floor(coalesce(CAST(s.sc AS DOUBLE) / s.n_bigrams, 0) * 1e6 + 0.5) / 1e6
             |    AS avg_gram_freq
             |FROM base b LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin),
    ),

    // Collocation mining: pointwise mutual information over adjacent word
    // pairs — PMI = ln(p(w1,w2) / (p(w1)·p(w2))) with pair probability over
    // bigram occurrences and word probabilities over unigram occurrences.
    // Shape: two partial-aggregated counts (unigram, bigram), the totals as
    // 1-row broadcast cross joins, the vocab-sized unigram table broadcast
    // onto the pair table twice. Probabilities divide exact integer counts
    // in a FIXED operation order so both engines produce bit-identical
    // doubles into ln (the raw numerator c12·Nu² would overflow 2^53 at
    // corpus scale — the ratio-of-ratios form never leaves double range);
    // ln itself is quantized at 1e4 (same libm-divergence guard as
    // q_char_entropy). Pairs below 5 occurrences are noise-floored out.
    GraftQuery(
      "q_pmi",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val words = docs.select(explode(split(col("text"), " ")).as("w"))
        val uni = words.groupBy("w").agg(count(lit(1)).as("c"))
        val nu = words.agg(count(lit(1)).as("nu"))
        val big = docs.select(explode(Curation.gramsOf(col("text"), 2)).as("g"))
          .select(split(col("g"), " ").getItem(0).as("w1"),
            split(col("g"), " ").getItem(1).as("w2"))
        val nb = big.agg(count(lit(1)).as("nb"))
        val c12 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val pmi = log(
          col("c12").cast("double") / col("nb").cast("double") /
            (col("c1").cast("double") / col("nu").cast("double")) /
            (col("c2").cast("double") / col("nu").cast("double")))
        c12.filter(col("c12") >= 5)
          .join(broadcast(uni.select(col("w").as("w1"), col("c").as("c1"))), "w1")
          .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c2"))), "w2")
          .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
          .select(col("w1"), col("w2"), col("c12"),
            (floor(pmi * lit(1e4) + lit(0.5)) / lit(1e4)).as("pmi"))
          .orderBy("w1", "w2")
      },
      Some("""WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
             |uni AS (SELECT w, count(*) AS c FROM words GROUP BY w),
             |nu AS (SELECT count(*) AS nu FROM words),
             |base AS (SELECT string_split(text, ' ') AS ws FROM documents),
             |big AS (
             |  SELECT ws[i] AS w1, ws[i + 1] AS w2
             |  FROM base, unnest(range(1, greatest(len(ws), 1))) AS t(i)
             |),
             |nb AS (SELECT count(*) AS nb FROM big),
             |c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2)
             |SELECT p.w1, p.w2, p.c12,
             |  floor(ln(CAST(p.c12 AS DOUBLE) / CAST(nb.nb AS DOUBLE)
             |      / (CAST(a.c AS DOUBLE) / CAST(nu.nu AS DOUBLE))
             |      / (CAST(b.c AS DOUBLE) / CAST(nu.nu AS DOUBLE)))
             |    * 1e4 + 0.5) / 1e4 AS pmi
             |FROM c12 p
             |JOIN uni a ON a.w = p.w1
             |JOIN uni b ON b.w = p.w2
             |CROSS JOIN nu CROSS JOIN nb
             |WHERE p.c12 >= 5
             |ORDER BY p.w1, p.w2""".stripMargin),
    ),

    // Trigram-prefiltered substring search (the pg_trgm recipe): docs can
    // only contain the pattern if they contain every one of its character
    // trigrams, so the prefilter prunes the corpus BEFORE the exact
    // contains() verify. The oracle is the naive LIKE: the prefilter must
    // be result-invisible (the q_bloom_prune contract).
    GraftQuery(
      "q_like_prefilter",
      (s, dir) => {
        val pattern = "slow query"
        val grams = pattern.sliding(3).toSeq.distinct
        // the prefilter is ONE map-side conjunction: the doc must contain
        // every pattern trigram — codegen'd substring probes, no explode,
        // no shuffle, no per-doc gram materialization (short docs simply
        // fail the probes). On an indexed lake the same predicate becomes
        // a posting-list intersection over a precomputed trigram index and
        // the full-text scan disappears; here it demonstrates the pruning
        // semantics at scan speed.
        Tables(s, dir, "documents")
          .filter(grams.map(g => col("text").contains(g)).reduce(_ && _))
          .filter(col("text").contains(pattern))
          .select("doc_id", "n_chars")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, n_chars FROM documents
             |WHERE text LIKE '%slow query%'
             |ORDER BY doc_id""".stripMargin),
    ),

    // Vocabulary coverage: per-doc out-of-vocabulary token rate against
    // the corpus's own top-100 words — the tokenizer-fit metric run before
    // committing a vocab. The vocab derives from one word-count aggregate;
    // top-100 with deterministic ties is orderBy+limit (Spark plans
    // TakeOrderedAndProject: a per-partition k-heap + driver merge of 100
    // rows — NOT a single-partition window over the full vocabulary, which
    // at corpus scale is billions of distinct words through one task). The
    // 100-word vocab broadcasts back; the per-doc rate is then a map-side
    // semi-membership count via the same left-semi shape as
    // q_decontaminate, aggregated per doc.
    GraftQuery(
      "q_oov_rate",
      (s, dir) => {
        val doc = Tables(s, dir, "documents")
        val words = doc.select(col("doc_id"),
          explode(split(col("text"), " ")).as("w")).filter(col("w") =!= "")
        val vocab = words.groupBy("w").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("w")).limit(100).select("w")
        val perDoc = words
          .join(broadcast(vocab.withColumn("__in", lit(1L))), Seq("w"), "left")
          .groupBy("doc_id").agg(
            count(lit(1)).as("n_tokens"),
            sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
        perDoc.select(col("doc_id"), col("n_tokens"), col("n_oov"),
            (floor(col("n_oov").cast("double") / col("n_tokens").cast("double")
              * lit(1e6) + lit(0.5)) / lit(1e6)).as("oov_rate"))
          .orderBy("doc_id")
      },
      Some("""WITH words AS (
             |  SELECT doc_id, w FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
             |  WHERE w <> ''),
             |vocab AS (
             |  SELECT w FROM (
             |    SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rk
             |    FROM words GROUP BY w)
             |  WHERE rk <= 100)
             |SELECT doc_id, count(*) AS n_tokens,
             |  CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             |  floor(CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS oov_rate
             |FROM words LEFT JOIN vocab v USING (w)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),

    // Zipf-law fit of the corpus token distribution: OLS slope of
    // ln(freq) on ln(rank) over the top-1000 terms — the tokenizer/corpus
    // health diagnostic (natural corpora sit near −1; a flat slope marks
    // synthetic or template text). Scale shape: one word-count aggregate,
    // top-k via TakeOrderedAndProject (never a global sort), the rank
    // window runs POST-LIMIT over ≤ 1000 rows (the q_oov_rate precedent).
    // Determinism: ln values quantize to 1e-4 ticks (exact longs), all
    // regression sums are exact integer arithmetic (bounded: Σx² ≤
    // 4.8e12·k, n·Σxy ≤ 9.5e15 — inside long), one double division at
    // the end; regr_slope's order-dependent double accumulators never
    // appear.
    GraftQuery(
      "q_zipf",
      (s, dir) => {
        val top = Tables(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("w")).limit(1000)
        val ranked = top.withColumn("rk",
          row_number().over(Window.orderBy(col("c").desc, col("w"))).cast(LongType))
        val q = ranked.select(
          floor(log(col("rk")) * lit(1e4) + lit(0.5)).cast(LongType).as("x"),
          floor(log(col("c")) * lit(1e4) + lit(0.5)).cast(LongType).as("y"))
        val sums = q.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        val num = col("n") * col("sxy") - col("sx") * col("sy")
        val den = col("n") * col("sxx") - col("sx") * col("sx")
        val slope = num.cast("double") / den.cast("double")
        val intercept = (col("sy").cast("double") / col("n").cast("double") -
          slope * (col("sx").cast("double") / col("n").cast("double"))) / lit(1e4)
        sums.select(col("n").as("n_terms"),
          (floor(slope * lit(1e6) + lit(0.5)) / lit(1e6)).as("zipf_slope"),
          (floor(intercept * lit(1e6) + lit(0.5)) / lit(1e6)).as("zipf_intercept"))
      },
      Some("""WITH wc AS (
             |  SELECT w, count(*) AS c FROM (
             |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
             |  WHERE w <> '' GROUP BY w ORDER BY c DESC, w LIMIT 1000
             |),
             |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk FROM wc),
             |q AS (
             |  SELECT CAST(floor(ln(rk) * 1e4 + 0.5) AS BIGINT) AS x,
             |    CAST(floor(ln(c) * 1e4 + 0.5) AS BIGINT) AS y
             |  FROM r
             |),
             |s AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx
             |  FROM q
             |)
             |SELECT n AS n_terms,
             |  floor(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
             |    * 1e6 + 0.5) / 1e6 AS zipf_slope,
             |  floor((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
             |      - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
             |        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 1e4
             |    * 1e6 + 0.5) / 1e6 AS zipf_intercept
             |FROM s""".stripMargin),
    ),

    // fastText-style hashed-feature quality classifier: word unigrams +
    // bigram shingles hash (portable md5-48) into a 64-bucket FROZEN
    // weight table (integer micros, generated from a fixed formula and
    // embedded as literals in BOTH engines — the q_ml_score frozen-model
    // discipline applied to text); per-doc score = sigmoid of the mean
    // bucket weight. Scale shape: the whole feature pipeline is ONE
    // map-side array fold per document — no explode, no join, no shuffle
    // (the weight table rides the plan as a literal) — so the classifier
    // runs at scan speed on 100 TB; integer-micro sums keep the fold
    // order-free, one exp + one division at the end.
    GraftQuery(
      "q_quality_classifier",
      (s, dir) => {
        val wts = (0 until 64).map(b => ((b * 2654435761L) % 2000001L) - 1000000L)
        val wArr = array(wts.map(lit): _*)
        def bucketW(c: org.apache.spark.sql.Column) = element_at(wArr,
          (conv(substring(md5(c), 1, 12), 16, 10).cast(LongType) % 64).cast("int") + 1)
        val d = Tables(s, dir, "documents")
          .withColumn("ws", split(col("text"), " "))
          .withColumn("gs", expr(
            "filter(zip_with(ws, slice(ws, 2, size(ws)), (a, b) -> concat(a, ' ', b)), g -> g IS NOT NULL)"))
          .withColumn("n_feats", (size(col("ws")) + size(col("gs"))).cast(LongType))
          .withColumn("s_micros",
            aggregate(col("ws"), lit(0L), (acc, w) => acc + bucketW(w)) +
              aggregate(col("gs"), lit(0L), (acc, g) => acc + bucketW(g)))
          .withColumn("meanw",
            col("s_micros").cast("double") / col("n_feats").cast("double") / lit(1e6))
          .withColumn("prob", lit(1.0) / (lit(1.0) + exp(-col("meanw"))))
        d.select(col("doc_id"), col("n_feats"),
            (floor(col("prob") * lit(1e6) + lit(0.5)) / lit(1e6)).as("score"),
            (col("prob") >= 0.5).as("keep"))
          .orderBy("doc_id")
      },
      Some {
        val wts = (0 until 64).map(b => ((b * 2654435761L) % 2000001L) - 1000000L)
        val h = (x: String) => graft.operators.Sketches.hash48Sql(x)
        s"""WITH w AS (SELECT [${wts.mkString(", ")}] AS wt),
           |m AS (
           |  SELECT doc_id, ws,
           |    [ws[i] || ' ' || ws[i + 1] FOR i IN range(1, greatest(len(ws), 1))] AS gs
           |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
           |),
           |f AS (
           |  SELECT doc_id,
           |    CAST(len(ws) + len(gs) AS BIGINT) AS n_feats,
           |    CAST(coalesce(list_sum(list_transform(ws,
           |        x -> wt[CAST(${h("x")} % 64 AS INT) + 1])), 0) AS BIGINT)
           |    + CAST(coalesce(list_sum(list_transform(gs,
           |        x -> wt[CAST(${h("x")} % 64 AS INT) + 1])), 0) AS BIGINT) AS s_micros
           |  FROM m CROSS JOIN w
           |),
           |p AS (
           |  SELECT doc_id, n_feats,
           |    1.0 / (1.0 + exp(-(CAST(s_micros AS DOUBLE) / CAST(n_feats AS DOUBLE) / 1e6))) AS prob
           |  FROM f
           |)
           |SELECT doc_id, n_feats,
           |  floor(prob * 1e6 + 0.5) / 1e6 AS score,
           |  prob >= 0.5 AS keep
           |FROM p ORDER BY doc_id""".stripMargin
      },
    ),

    // Interpolated Kneser–Ney bigram LM perplexity scoring + CCNet-style
    // perplexity terciles (head/middle/tail) — the perplexity-filter pass
    // of a pretraining pipeline (CCNet scores crawl text under a LM
    // trained on a clean reference corpus and keeps the low-perplexity
    // head). Train slice = 80% of docs (doc_id % 5 <> 0) standing in for
    // the reference corpus; EVERY doc is scored, so the held-out 20%
    // exercises the unseen-bigram backoff paths. See [[knScore]] for the
    // formula, the determinism discipline, and the 100 TB shape.
    GraftQuery(
      "q_kn_score",
      (s, dir) => knScore(Tables(s, dir, "documents"), "doc_id", "text",
        col("doc_id") % 5 =!= 0),
      Some("""WITH tdocs AS (
             |  SELECT string_split(text, ' ') AS ws FROM documents WHERE doc_id % 5 <> 0),
             |tb AS (SELECT ws[i] AS w1, ws[i + 1] AS w2
             |       FROM tdocs, unnest(range(1, greatest(len(ws), 1))) AS t(i)),
             |c12 AS (SELECT w1, w2, count(*) AS c12 FROM tb GROUP BY w1, w2),
             |hist AS (SELECT w1, sum(c12) AS c1, count(*) AS n1f FROM c12 GROUP BY w1),
             |cont AS (SELECT w2, count(*) AS n1b FROM c12 GROUP BY w2),
             |sc AS (SELECT (SELECT count(*) FROM c12) AS tt,
             |       (SELECT count(DISTINCT w) + 1 FROM (
             |          SELECT w1 AS w FROM c12 UNION ALL SELECT w2 FROM c12)) AS v),
             |model AS (
             |  SELECT c.w1, c.w2, CAST(floor(-ln((c.c12 - 0.75) / h.c1
             |      + 0.75 * h.n1f / h.c1 * ((o.n1b + 1) / (sc.tt + sc.v)))
             |      * 1e6 + 0.5) AS BIGINT) AS lp
             |  FROM c12 c JOIN hist h USING (w1) JOIN cont o USING (w2) CROSS JOIN sc),
             |ab AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
             |       FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |            unnest(range(1, greatest(len(ws), 1))) AS t(i)),
             |tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM ab GROUP BY doc_id, w1, w2),
             |scored AS (
             |  SELECT t.doc_id, t.tf, coalesce(m.lp, CAST(floor(-ln(
             |      CASE WHEN h.c1 IS NOT NULL
             |        THEN 0.75 * h.n1f / h.c1 * ((coalesce(o.n1b, 0) + 1) / (sc.tt + sc.v))
             |        ELSE (coalesce(o.n1b, 0) + 1) / (sc.tt + sc.v) END)
             |      * 1e6 + 0.5) AS BIGINT)) AS lp
             |  FROM tf t LEFT JOIN model m ON m.w1 = t.w1 AND m.w2 = t.w2
             |  LEFT JOIN hist h ON h.w1 = t.w1
             |  LEFT JOIN cont o ON o.w2 = t.w2
             |  CROSS JOIN sc),
             |perdoc AS (
             |  SELECT doc_id, sum(tf * lp) AS nll_micros,
             |    CAST(sum(tf) AS BIGINT) AS n_bigrams
             |  FROM scored GROUP BY doc_id),
             |final AS (
             |  SELECT doc_id, n_bigrams,
             |    floor(CAST(nll_micros AS DOUBLE) / CAST(n_bigrams AS DOUBLE) + 0.5) / 1e6
             |      AS avg_nll
             |  FROM perdoc)
             |SELECT doc_id, n_bigrams, avg_nll,
             |  CAST(ntile(3) OVER (ORDER BY avg_nll, doc_id) AS BIGINT) AS ppl_bucket
             |FROM final ORDER BY doc_id""".stripMargin),
    ),

    // Hashing-trick featurizer (Weinberger et al. 2009): tokens hashed
    // into a fixed 64-bucket count vector per document — the
    // vocabulary-free featurization that feeds linear quality
    // classifiers at corpus scale (no dictionary to build, broadcast, or
    // grow; collisions are the accepted trade). Bucket = first 8 hex
    // chars of md5(token) mod 64, the same engine-shared hash
    // q_rolling_hash folds (Spark conv() vs DuckDB's hex fold produce
    // identical integers), so the vectors are engine-exact. Output is
    // the sparse form (doc_id, bucket, cnt) — the layout a trainer
    // ingests directly; one explode + one map-side-combinable count
    // aggregate, at scan speed.
    GraftQuery(
      "q_feature_hash",
      (s, dir) => {
        Tables(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .select(col("doc_id"),
            (conv(substring(md5(col("w")), 1, 8), 16, 10).cast(LongType)
              % 64).as("bucket"))
          .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
          .orderBy("doc_id", "bucket")
      },
      Some("""SELECT doc_id, wv % 64 AS bucket, count(*) AS cnt FROM (
             |  SELECT doc_id,
             |    list_reduce(
             |      list_transform(string_split_regex(substr(md5(w), 1, 8), ''),
             |        c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
             |      (a, b) -> a * 16 + b) AS wv
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |        FROM documents))
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    ),

    // Multinomial Naive Bayes language classifier, trained and scored on
    // the corpus itself (the classic bootstrapped labeler a curation
    // pipeline runs when it has a seed labeling — here the lang column —
    // and wants a scorer it can apply to unlabeled text at scan speed).
    // Laplace-smoothed log-likelihoods ⌊1e6·ln((c+1)/(ntok+V))⌋ and
    // priors are quantized to integer micros from bit-identical double
    // ratios (the q_kn_score/q_lm_score ln discipline), unseen words
    // fall to the per-class smoothing floor via a left join, and the
    // per-doc argmax breaks ties on class name. Scale shape: the model
    // is a (word, class) table joined to per-doc term frequencies on the
    // word key — the vocabulary-sized dim join AQE broadcasts when it
    // fits and hash-partitions when it doesn't; scoring itself is one
    // sum aggregate, map-side combinable.
    GraftQuery(
      "q_naive_bayes",
      (s, dir) => {
        val docs = Tables(s, dir, "documents").localCheckpoint(false)
        val tok = docs.select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("w")).localCheckpoint(false)
        val cls = tok.groupBy("lang")
          .agg(countDistinct("doc_id").as("ndocs"), count(lit(1)).as("ntok"))
        val tot = docs.agg(count(lit(1)).as("nd"))
        val voc = tok.agg(countDistinct("w").as("v"))
        val wc = tok.groupBy("w", "lang").agg(count(lit(1)).as("c"))
        val micro = (x: Column) => floor(log(x) * lit(1e6) + lit(0.5)).cast(LongType)
        val model = wc.join(broadcast(cls), Seq("lang")).crossJoin(broadcast(voc))
          .select(col("w"), col("lang"),
            micro((col("c") + 1).cast("double") /
              (col("ntok") + col("v")).cast("double")).as("lp"))
        val prior = cls.crossJoin(broadcast(tot)).crossJoin(broadcast(voc))
          .select(col("lang"),
            micro(col("ndocs").cast("double") / col("nd").cast("double")).as("lp0"),
            micro(lit(1.0) / (col("ntok") + col("v")).cast("double")).as("lpu"))
        val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val scored = tf.crossJoin(broadcast(prior))
          .join(model, Seq("w", "lang"), "left")
          .groupBy("doc_id", "lang", "lp0")
          .agg(sum(col("tf") * coalesce(col("lp"), col("lpu"))).as("s"))
          .select(col("doc_id"), col("lang"), (col("lp0") + col("s")).as("score"))
        scored
          .withColumn("rn", row_number().over(
            Window.partitionBy("doc_id").orderBy(col("score").desc, col("lang"))))
          .filter(col("rn") === 1)
          .join(docs.select(col("doc_id"), col("lang").as("actual")), Seq("doc_id"))
          .select(col("doc_id"), col("lang").as("pred_lang"),
            col("score").as("score_micros"), col("actual"),
            (col("lang") === col("actual")).as("correct"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
             |cls AS (
             |  SELECT lang, count(DISTINCT doc_id) AS ndocs, count(*) AS ntok
             |  FROM tok GROUP BY lang),
             |tot AS (SELECT count(*) AS nd FROM documents),
             |voc AS (SELECT count(DISTINCT w) AS v FROM tok),
             |wc AS (SELECT w, lang, count(*) AS c FROM tok GROUP BY 1, 2),
             |model AS (
             |  SELECT wc.w, wc.lang,
             |    CAST(floor(ln(CAST(wc.c + 1 AS DOUBLE)
             |      / CAST(cls.ntok + voc.v AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lp
             |  FROM wc JOIN cls ON cls.lang = wc.lang CROSS JOIN voc),
             |prior AS (
             |  SELECT cls.lang,
             |    CAST(floor(ln(CAST(cls.ndocs AS DOUBLE) / CAST(tot.nd AS DOUBLE))
             |      * 1e6 + 0.5) AS BIGINT) AS lp0,
             |    CAST(floor(ln(CAST(1 AS DOUBLE) / CAST(cls.ntok + voc.v AS DOUBLE))
             |      * 1e6 + 0.5) AS BIGINT) AS lpu
             |  FROM cls CROSS JOIN tot CROSS JOIN voc),
             |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
             |scored AS (
             |  SELECT t.doc_id, p.lang,
             |    CAST(p.lp0 + sum(t.tf * coalesce(m.lp, p.lpu)) AS BIGINT) AS score
             |  FROM tf t CROSS JOIN prior p
             |  LEFT JOIN model m ON m.w = t.w AND m.lang = p.lang
             |  GROUP BY t.doc_id, p.lang, p.lp0),
             |pred AS (
             |  SELECT doc_id, lang, score,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
             |  FROM scored)
             |SELECT p.doc_id, p.lang AS pred_lang, p.score AS score_micros,
             |  d.lang AS actual, (p.lang = d.lang) AS correct
             |FROM pred p JOIN documents d ON d.doc_id = p.doc_id
             |WHERE p.rn = 1 ORDER BY p.doc_id""".stripMargin),
    ),

    // TextRank (Mihalcea & Tarau 2004): keyword ranking = PageRank over
    // the word co-occurrence graph. Adjacent-word bigrams (the same
    // tokenization as q_pmi) become undirected weighted edges (count ≥ 2
    // noise floor — singleton co-occurrences are the bulk of the edge
    // list and carry no signal), each fed both directions into the
    // SAME scaled-integer weighted PageRank the purchase graph uses —
    // node keys are words (the operator is key-type-generic), so rank
    // is engine-exact and the oracle replays the identical unrolled
    // rounds over an identically-built edge CTE. The graph-based twin
    // of q_rake_keywords' frequency-based scoring: RAKE favors words in
    // long phrases, TextRank words central to the co-occurrence
    // topology. Top 50 by (rank, word) — deterministic total order.
    GraftQuery(
      "q_textrank",
      (s, dir) => {
        val big = Tables(s, dir, "documents")
          .select(explode(Curation.gramsOf(col("text"), 2)).as("g"))
          .select(split(col("g"), " ").getItem(0).as("w1"),
            split(col("g"), " ").getItem(1).as("w2"))
          .filter(col("w1") =!= col("w2"))
        val und = big
          .select(least(col("w1"), col("w2")).as("a"),
            greatest(col("w1"), col("w2")).as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2)
        val e = und.select(col("a").as("src"), col("b").as("dst"), col("w"))
          .unionByName(und.select(col("b").as("src"), col("a").as("dst"), col("w")))
        Graph.weightedPageRank(e, iters = 4)
          .orderBy(col("rank").desc, col("node"))
          .limit(50)
          .select(col("node").as("word"), col("rank"))
      },
      Some((Seq(
        s"""WITH base AS (SELECT string_split(text, ' ') AS ws FROM documents),
           |big AS (
           |  SELECT ws[i] AS w1, ws[i + 1] AS w2
           |  FROM base, unnest(range(1, greatest(len(ws), 1))) AS t(i)
           |  WHERE ws[i] <> ws[i + 1]),
           |und AS (
           |  SELECT least(w1, w2) AS a, greatest(w1, w2) AS b, count(*) AS w
           |  FROM big GROUP BY 1, 2 HAVING count(*) >= 2),
           |e AS (SELECT a AS src, b AS dst, w FROM und
           |      UNION ALL SELECT b, a, w FROM und),
           |ew AS (
           |  SELECT e.src, e.dst, e.w, t.tw
           |  FROM e JOIN (SELECT src, sum(w) AS tw FROM e GROUP BY src) t
           |    ON t.src = e.src),
           |nodes AS (SELECT DISTINCT src AS node FROM e),
           |pr0 AS (SELECT node, CAST(${Graph.Scale} AS BIGINT) AS r FROM nodes)""".stripMargin) ++
        (1 to 4).map(Graph.wprRoundSql(_, Graph.Scale))).mkString(",\n") +
        "\nSELECT node AS word, r AS rank FROM pr4 ORDER BY r DESC, node LIMIT 50"),
    ),

    // RAKE keyword extraction (Rose et al. 2010), made engine-exact:
    // stopwords = the corpus's nStop most frequent tokens (data-derived,
    // deterministic tie-break), candidate phrases = stopword-delimited
    // runs of ≤ maxLen words (the gaps-and-islands trick on token
    // positions), word score = ⌊1e6·deg(w)/freq(w)⌋ in DECIMAL/HUGEINT
    // (deg ≤ maxLen·freq, so the per-word score is ≤ maxLen·1e6 and the
    // phrase sum fits easily; the NUMERATOR is what needed widening —
    // 1e6·deg wraps BIGINT on a 1e13-token corpus), phrase score = Σ
    // word scores, top-k per document. The keyword/tag generator a
    // curation pipeline runs for faceting and topic routing.
    GraftQuery(
      "q_rake_keywords",
      (s, dir) => rakeKeywords(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id", "rk"),
      Some("""WITH tok AS MATERIALIZED (
             |  SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos, ws[i] AS w
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |    unnest(range(1, len(ws) + 1)) AS t(i)
             |  WHERE len(ws[i]) > 0),
             |stop AS (
             |  SELECT w FROM (
             |    SELECT w, count(*) AS c FROM tok GROUP BY w
             |    ORDER BY c DESC, w LIMIT 5)),
             |isl AS (
             |  SELECT t.doc_id, t.pos, t.w,
             |    t.pos - row_number() OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS grp
             |  FROM tok t LEFT JOIN stop s ON s.w = t.w
             |  WHERE s.w IS NULL),
             |phr AS MATERIALIZED (
             |  SELECT doc_id, grp, count(*) AS n_words,
             |    string_agg(w, ' ' ORDER BY pos) AS phrase
             |  FROM isl GROUP BY 1, 2 HAVING count(*) <= 3),
             |occ AS MATERIALIZED (
             |  SELECT doc_id, grp, n_words, unnest(string_split(phrase, ' ')) AS w
             |  FROM phr),
             |stats AS (
             |  SELECT w, count(*) AS freq, sum(n_words) AS deg
             |  FROM occ GROUP BY w),
             |scored AS (
             |  SELECT o.doc_id, o.grp,
             |    CAST(sum((CAST(1000000 AS HUGEINT) * st.deg) // st.freq) AS BIGINT)
             |      AS score_micros
             |  FROM occ o JOIN stats st ON st.w = o.w GROUP BY 1, 2),
             |cand AS (
             |  SELECT p.doc_id, p.phrase, p.n_words, sc.score_micros,
             |    count(*) AS n_occur
             |  FROM phr p JOIN scored sc ON sc.doc_id = p.doc_id AND sc.grp = p.grp
             |  GROUP BY 1, 2, 3, 4),
             |rk AS (
             |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             |    ORDER BY score_micros DESC, phrase) AS INT) AS rk
             |  FROM cand)
             |SELECT doc_id, phrase, n_words, score_micros, n_occur, rk
             |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin),
    ),
  )

  /** RAKE keywords: see the q_rake_keywords doc. `nStop` most frequent
    * tokens act as phrase delimiters; candidate runs longer than
    * `maxLen` are dropped (the boundedness contract — a run is never
    * split, because a truncated phrase is not a phrase the document
    * contains). Returns (doc_id, phrase, n_words, score_micros,
    * n_occur, rk ≤ k).
    */
  def rakeKeywords(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, nStop: Int = 5, maxLen: Int = 3, k: Int = 3): org.apache.spark.sql.DataFrame = {
    require(nStop >= 0 && maxLen >= 1 && k >= 1, s"bad params ($nStop, $maxLen, $k)")
    val tok = docs.select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
      .filter(length(col("w")) > 0).localCheckpoint(false)
    val stop = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(nStop)
      .select(col("w"))
    val rn = Window.partitionBy("doc_id").orderBy("pos")
    val isl = tok.join(broadcast(stop), Seq("w"), "left_anti")
      .withColumn("grp", col("pos") - row_number().over(rn))
    val phr = isl.groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("n_words"),
        array_join(expr("transform(array_sort(collect_list(struct(pos, w))), x -> x.w)"),
          " ").as("phrase"))
      .filter(col("n_words") <= maxLen)
      .localCheckpoint(false)
    val occ = phr.select(col("doc_id"), col("grp"), col("n_words"),
      explode(split(col("phrase"), " ")).as("w"))
    val stats = occ.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("n_words").as("deg"))
    val scored = occ.join(stats, Seq("w"))
      .groupBy("doc_id", "grp")
      .agg(sum(expr("(CAST(1000000 AS DECIMAL(38,0)) * deg) div CAST(freq AS DECIMAL(38,0))"))
        .as("score_micros"))
    val cand = phr.join(scored, Seq("doc_id", "grp"))
      .groupBy("doc_id", "phrase", "n_words", "score_micros")
      .agg(count(lit(1)).as("n_occur"))
    val wk = Window.partitionBy("doc_id").orderBy(col("score_micros").desc, col("phrase"))
    cand.withColumn("rk", row_number().over(wk)).filter(col("rk") <= k)
  }

  /** Per-source quality quota: keep the top `quota` documents of each
    * source by (quality desc, doc_id) — corpus balancing so no domain
    * dominates the training mix. One partitioned window pass (same
    * WindowGroupLimit-eligible shape as top-k-per-key).
    * Output: (doc_id, source, quality, src_rank, kept).
    */
  def domainQuota(df: org.apache.spark.sql.DataFrame, idCol: String, partCol: String,
      qualityCol: String, quota: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    // quality ranks as DOUBLE: a long cast would truncate fractional scores
    // (model quality in [0,1]) and collapse the ordering to doc_id
    df.select(col(idCol).cast(LongType).as("doc_id"), col(partCol).as("source"),
        col(qualityCol).cast("double").as("quality"))
      .withColumn("src_rank", row_number().over(w).cast(LongType))
      .withColumn("kept", col("src_rank") <= quota)
  }

  /** PII scrubbing: redact email-shaped tokens and long digit runs (the
    * pre-training privacy pass). Pure map-side regexp_replace — scan-speed,
    * fully codegen'd. Output: (doc_id, scrubbed, n_emails, n_digit_runs).
    */
  def scrubPii(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val email = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"
    val digits = "[0-9]{6,}"
    // counts must equal the placeholders in `scrubbed` (the audit contract),
    // so digit runs are counted AFTER email redaction — a digit run inside
    // an email is swallowed by <EMAIL>, not double-counted
    val emailScrubbed = regexp_replace(col(textCol), email, "<EMAIL>")
    df.select(
      col(idCol).cast(LongType).as("doc_id"),
      regexp_replace(emailScrubbed, digits, "<NUM>").as("scrubbed"),
      size(regexp_extract_all(col(textCol), lit(email), lit(0))).cast(LongType).as("n_emails"),
      size(regexp_extract_all(emailScrubbed, lit(digits), lit(0))).cast(LongType).as("n_digit_runs"),
    )
  }

  /** Per-document repetition fractions (Gopher-style filters): duplicate
    * word fraction, duplicate bigram fraction, most-frequent-word fraction.
    * Output: (doc_id, words, dup_word_frac, dup_bigram_frac, top_word_frac),
    * fractions rounded half-up at 1e-6.
    */
  def repetitionStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val r6 = (c: org.apache.spark.sql.Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val base = df.select(col(idCol).cast(LongType).as("doc_id"),
        split(col(textCol), " ").as("ws"))
      .withColumn("words", size(col("ws")).cast(LongType))
      // bigrams via the total zip_with form (sequence(1, size-1) reverses on
      // single-word docs — same trap as Dedup.ngramJaccardPairs)
      .withColumn("bigrams", expr(
        "filter(zip_with(ws, slice(ws, 2, size(ws)), (a, b) -> concat(a, ' ', b)), g -> g IS NOT NULL)"))
    val top = base.select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_c"))
    base.join(top, "doc_id")
      .select(
        col("doc_id"), col("words"),
        r6(lit(1.0) - size(array_distinct(col("ws"))).cast("double") / col("words"))
          .as("dup_word_frac"),
        r6(when(size(col("bigrams")) > 0,
            lit(1.0) - size(array_distinct(col("bigrams"))).cast("double") / size(col("bigrams")))
          .otherwise(lit(0.0))).as("dup_bigram_frac"),
        r6(col("top_c").cast("double") / col("words")).as("top_word_frac"),
      )
  }

  /** Deterministic token-budget shard packing per `partCol` (build training
    * shards of ~`budget` whitespace tokens each, in id order within each
    * source/domain). The window is PARTITIONED — a global pack would funnel
    * 100 TB through one task; per-source packing is both the realistic
    * layout (shards don't mix domains) and the scalable one.
    * Output: (doc_id, source, tokens, shard_id, shard_offset) — shard ids
    * are per-source, offset = tokens already packed into the doc's shard.
    */
  def shardPack(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      partCol: String, budget: Long): org.apache.spark.sql.DataFrame = {
    df.select(col(idCol).cast(LongType).as("doc_id"), col(partCol).as("source"),
        size(split(col(textCol), " ")).cast(LongType).as("tokens"))
      .withColumn("cum_before", coalesce(sum("tokens").over(
        org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .select(
        col("doc_id"), col("source"), col("tokens"),
        expr(s"cum_before div $budget").as("shard_id"),
        (col("cum_before") - expr(s"cum_before div $budget") * lit(budget)).as("shard_offset"),
      )
  }

  /** Best-fit-decreasing sequence packing (the LLM sample-packing operator):
    * pack variable-length documents into fixed `budget`-token training
    * sequences, minimizing the padding fragmentation [[shardPack]]'s
    * running-sum split leaves behind. Deterministic policy: within each
    * (source, chunk), docs are placed in (tokens DESC, doc_id ASC) order;
    * each goes to the open sequence with the SMALLEST residual capacity
    * that still fits (ties → smallest sequence id); no fit → a new
    * sequence (a doc larger than `budget` gets a dedicated overflow
    * sequence — its negative residual never fits again).
    *
    * Scale shape: packing is chunked — docs are ranked per source and cut
    * into `chunkDocs`-doc chunks, each packed independently in one task
    * (`flatMapGroups`, state = O(chunkDocs)); no global single-task pack
    * and no driver collect. Chunking costs at most one under-filled
    * sequence per chunk boundary vs an unbounded per-source BFD, and is
    * what makes a 10 TB source packable on 1000 executors. The per-source
    * rank window is the one sequential structure; at extreme per-source
    * cardinality swap it for [[Scale.distributedNtile]]'s value-bucketed
    * two-phase rank (same total order, no single-partition sort).
    *
    * Output: (doc_id, source, tokens, seq_id, seq_offset) — seq_id unique
    * per source (chunk * chunkDocs + local bin), seq_offset = tokens
    * already packed into the doc's sequence at placement time.
    */
  def seqPack(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      partCol: String, budget: Long, chunkDocs: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("doc_id"), col(partCol).as("source"),
        size(split(col(textCol), " ")).cast(LongType).as("tokens"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("tokens").desc, col("doc_id")))
        .cast(LongType) - 1)
      .select(col("doc_id"), col("source"), col("tokens"),
        expr(s"rk div $chunkDocs").as("chunk"))
      .as[(Long, String, Long, Long)]
      .groupByKey(r => (r._2, r._4))
      .flatMapGroups { (key: (String, Long), it: Iterator[(Long, String, Long, Long)]) =>
        val (source, chunk) = key
        val docs = it.toArray.sortBy(r => (-r._3, r._1))
        val residuals = scala.collection.mutable.ArrayBuffer.empty[Long]
        docs.map { case (docId, _, tokens, _) =>
          var best = -1
          var i = 0
          while (i < residuals.length) {
            if (residuals(i) >= tokens && (best < 0 || residuals(i) < residuals(best)))
              best = i
            i += 1
          }
          val (bin, offset) =
            if (best < 0) { residuals += (budget - tokens); (residuals.length - 1, 0L) }
            else { val off = budget - residuals(best); residuals(best) -= tokens; (best, off) }
          (docId, source, tokens, chunk * chunkDocs + bin, offset)
        }.iterator
      }
      .toDF("doc_id", "source", "tokens", "seq_id", "seq_offset")
  }

  /** Per-source KL divergence from the corpus unigram distribution —
    * the mixture diagnostic a curation pipeline reads before reweighting
    * sources (a source with high KL is lexically unlike the blend it
    * feeds). KL(P_s ‖ P_c) = Σ_{w∈s} p_s(w)·ln(p_s(w)/p_c(w)) with MLE
    * estimates — the sum needs only OBSERVED (source, word) pairs
    * (p_s = 0 elsewhere), and p_c(w) ≥ c_w/N > 0 whenever w ∈ s, so no
    * smoothing term is required and the frame stays tf-aggregate-shaped
    * (no source × vocabulary cross join).
    *
    * Determinism (the q_naive_bayes ln discipline): the per-type log
    * ratio is evaluated once as ln(c_sw/n_s) − ln(c_w/N) (two lns of
    * double divisions — each operand an exact-int double, both engines
    * evaluate the identical IEEE expression; the single-ln product form
    * would overflow 2^53 at corpus scale), quantized half-up to integer
    * micros; the per-source total Σ c_sw·lp is an exact BIGINT sum
    * (order-free), with ONE double division by n_s at the end, floored
    * to a micro. Scale shape: two partial-aggregated tf shuffles (the
    * (source, word) and corpus word counts), a vocabulary-keyed
    * equi-join, one per-source sum.
    * Output: (source, n_tokens, n_types, kl).
    */
  def sourceKl(df: org.apache.spark.sql.DataFrame, textCol: String,
      partCol: String): org.apache.spark.sql.DataFrame = {
    val tok = df.select(col(partCol).as("source"),
      explode(split(col(textCol), " ")).as("w"))
    val sw = tok.groupBy("source", "w").agg(count(lit(1)).as("csw"))
    val cw = tok.groupBy("w").agg(count(lit(1)).as("cw"))
    val ns = sw.groupBy("source")
      .agg(sum("csw").as("n"), count(lit(1)).as("types"))
    val tot = cw.agg(sum("cw").as("nn"))
    sw.join(cw, "w")
      .join(ns, "source")
      .crossJoin(broadcast(tot))
      .withColumn("lp", floor(
        (log(col("csw").cast("double") / col("n").cast("double")) -
          log(col("cw").cast("double") / col("nn").cast("double"))) * lit(1e6) + lit(0.5))
        .cast(LongType))
      .groupBy("source")
      .agg(max("n").as("n_tokens"), max("types").as("n_types"),
        sum(col("csw") * col("lp")).as("s"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        (floor(col("s").cast("double") / col("n_tokens").cast("double"))
          .cast(LongType).cast("double") / lit(1e6)).as("kl"))
  }

  /** ROUGE-style n-gram overlap scoring between deterministic document
    * pairs (each doc vs the next doc_id in its source) — the
    * generation-eval counterpart of [[Retrieval.rankingMetrics]]: ROUGE-1
    * precision/recall/F1 and ROUGE-2 F1 from CLIPPED (multiset-min)
    * n-gram counts, the standard ROUGE definition.
    *
    * Everything stays integer until the display division: overlap =
    * Σ min(tf_a, tf_b) per shared gram (exact longs), and each metric is
    * one integer floor-division to micros — F1 = 2·ov·10⁶ div (ta+tb)
    * uses the identity 2PR/(P+R) = 2·ov/(ta+tb), so no intermediate
    * float P, R exists to diverge. Scale shape: pairing is one
    * per-source window on ids; the overlap is two gram-keyed equi-joins
    * (tf frames are partial-aggregated, AQE handles the gram-key skew)
    * and one pair-keyed sum — no all-pairs product anywhere.
    * Output: (doc_id, ref_id, ov1, ov2, rouge1_p, rouge1_r, rouge1_f,
    * rouge2_f), metrics rounded down at 1e-6.
    */
  def rougePairs(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      partCol: String): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(idCol).cast(LongType).as("doc_id"),
      col(partCol).as("source"), col(textCol).as("text"))
    val w = Window.partitionBy("source").orderBy("doc_id")
    val ranked = base.withColumn("rn", row_number().over(w))
    val pairs = ranked.select(col("source"), col("doc_id").as("a"), col("rn"))
      .join(ranked.select(col("source"), col("doc_id").as("b"),
        (col("rn") - 1).as("rn")), Seq("source", "rn"))
      .select(col("a"), col("b"))
    def grams(n: Int) =
      if (n == 1) split(col("text"), " ") else Curation.gramsOf(col("text"), n)
    def tf(n: Int) = base
      .select(col("doc_id"), explode(grams(n)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    def tot(n: Int) = base
      .select(col("doc_id"), size(grams(n)).cast(LongType).as("t"))
    def ov(n: Int) = pairs
      .join(tf(n).select(col("doc_id").as("a"), col("g"), col("c").as("ca")), Seq("a"))
      .join(tf(n).select(col("doc_id").as("b"), col("g"), col("c").as("cb")), Seq("b", "g"))
      .groupBy("a", "b").agg(sum(least(col("ca"), col("cb"))).as("ov"))
    val joined = pairs
      .join(ov(1).select(col("a"), col("b"), col("ov").as("ov1")), Seq("a", "b"), "left")
      .join(ov(2).select(col("a"), col("b"), col("ov").as("ov2")), Seq("a", "b"), "left")
      .join(tot(1).select(col("doc_id").as("a"), col("t").as("ta1")), Seq("a"))
      .join(tot(1).select(col("doc_id").as("b"), col("t").as("tb1")), Seq("b"))
      .join(tot(2).select(col("doc_id").as("a"), col("t").as("ta2")), Seq("a"))
      .join(tot(2).select(col("doc_id").as("b"), col("t").as("tb2")), Seq("b"))
      .withColumn("ov1", coalesce(col("ov1"), lit(0L)))
      .withColumn("ov2", coalesce(col("ov2"), lit(0L)))
    // floor((num·10⁶)/den) over exact-int doubles: num·10⁶ ≤ ~2e8 and the
    // quotient sits ≥ 1/den away from any integer unless exact, so the
    // correctly-rounded double division can never cross a floor boundary —
    // bit-identical to integer division, written identically in the oracle
    val micro = (num: Column, den: Column) =>
      when(den > 0,
        floor((num * lit(1000000L)).cast("double") / den.cast("double")).cast(LongType))
        .otherwise(lit(0L)).cast("double") / lit(1e6)
    joined.select(col("a").as("doc_id"), col("b").as("ref_id"),
      col("ov1"), col("ov2"),
      micro(col("ov1"), col("ta1")).as("rouge1_p"),
      micro(col("ov1"), col("tb1")).as("rouge1_r"),
      micro(col("ov1") * 2, col("ta1") + col("tb1")).as("rouge1_f"),
      micro(col("ov2") * 2, col("ta2") + col("tb2")).as("rouge2_f"))
  }

  /** BLEU (Papineni et al. 2002) over the same deterministic pairs as
    * [[rougePairs]] (candidate = each doc, reference = the next doc_id in
    * its source): modified (clipped) n-gram precisions p_n = ov_n/t_n for
    * n ≤ 4, brevity penalty exp(min(0, (c−r)/c)), BLEU-N =
    * BP·exp(Σ_{n≤N} ln p_n / N) — reported at N = 2 and N = 4, zero when
    * any constituent overlap is zero (no smoothing; the honest sentence
    * score for short docs is 0, and q_rouge carries the graded signal).
    *
    * Float discipline (the q_naive_bayes/q_kl_source ln rule): each
    * ln p_n is quantized to integer micros immediately (half-up), summed
    * exactly as BIGINTs; the exp argument is ONE double expression —
    * sum/(N·10⁶) + min(0,(c−r)/c), every operand an exact-int double —
    * evaluated identically in both engines, and the final score is
    * floor(exp(arg)·10⁶+0.5)/10⁶ (the Ml.scala sigmoid precedent).
    * Scale shape: identical to ROUGE — per-source id windows for the
    * pairing, gram-keyed equi-joins on partial-aggregated tf frames,
    * never an all-pairs product. Output: (doc_id, ref_id, ov1..ov4,
    * bleu2, bleu4).
    */
  def bleuPairs(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      partCol: String): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(idCol).cast(LongType).as("doc_id"),
      col(partCol).as("source"), col(textCol).as("text"))
    val w = Window.partitionBy("source").orderBy("doc_id")
    val ranked = base.withColumn("rn", row_number().over(w))
    val pairs = ranked.select(col("source"), col("doc_id").as("a"), col("rn"))
      .join(ranked.select(col("source"), col("doc_id").as("b"),
        (col("rn") - 1).as("rn")), Seq("source", "rn"))
      .select(col("a"), col("b"))
    def grams(n: Int) =
      if (n == 1) split(col("text"), " ") else Curation.gramsOf(col("text"), n)
    def tf(n: Int) = base
      .select(col("doc_id"), explode(grams(n)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    def tot(n: Int) = base
      .select(col("doc_id"), size(grams(n)).cast(LongType).as("t"))
    def ov(n: Int) = pairs
      .join(tf(n).select(col("doc_id").as("a"), col("g"), col("c").as("ca")), Seq("a"))
      .join(tf(n).select(col("doc_id").as("b"), col("g"), col("c").as("cb")), Seq("b", "g"))
      .groupBy("a", "b").agg(sum(least(col("ca"), col("cb"))).as("ov"))
    val joined = (1 to 4).foldLeft(pairs) { (acc, n) =>
      acc
        .join(ov(n).select(col("a"), col("b"), col("ov").as(s"ov$n")), Seq("a", "b"), "left")
        .join(tot(n).select(col("doc_id").as("a"), col("t").as(s"ta$n")), Seq("a"))
        .withColumn(s"ov$n", coalesce(col(s"ov$n"), lit(0L)))
    }.join(tot(1).select(col("doc_id").as("b"), col("t").as("r")), Seq("b"))
    // ln p_n in integer micros, half-up — null marks "precision undefined
    // or zero" and poisons the whole product, which IS the BLEU-0 rule
    def lp(n: Int) =
      when(col(s"ov$n") > 0,
        floor(log(col(s"ov$n").cast("double") / col(s"ta$n").cast("double"))
          * lit(1e6) + lit(0.5)).cast(LongType))
    val bp = least(lit(0.0),
      (col("ta1") - col("r")).cast("double") / col("ta1").cast("double"))
    def bleu(upTo: Int) = {
      val s = (1 to upTo).map(lp).reduce(_ + _)
      coalesce(
        floor(exp(s.cast("double") / lit(upTo * 1e6) + bp) * lit(1e6) + lit(0.5)) / lit(1e6),
        lit(0.0))
    }
    joined.select(col("a").as("doc_id"), col("b").as("ref_id"),
      col("ov1"), col("ov2"), col("ov3"), col("ov4"),
      bleu(2).as("bleu2"), bleu(4).as("bleu4"))
  }

  /** Corpus-LM fluency score: each document's average corpus-wide bigram
    * frequency — the CCNet-style "LM quality" signal with the corpus
    * itself standing in for the external language model. Low scores mark
    * unusual/gibberish word sequences; very high scores mark boilerplate.
    * Scale shape: bigrams are generated map-side ([[Curation.gramsOf]]'s
    * one-pass zip_with path), the frequency table is one
    * partial-aggregated groupBy on the gram, and the score join shuffles
    * occurrences on that same gram key (exchange reused) before
    * collapsing per doc. Sum-of-counts stays integer until one exact
    * double division — order-insensitive, engine-exact.
    * Output: (doc_id, n_bigrams, avg_gram_freq).
    */
  def lmScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(idCol).cast(LongType).as("doc_id"),
      Curation.gramsOf(col(textCol), 2).as("grams"))
    val occ = base.select(col("doc_id"), explode(col("grams")).as("g"))
    val counts = occ.groupBy("g").agg(count(lit(1)).as("c"))
    val scored = occ.join(counts, "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_bigrams"), sum("c").as("sc"))
    base.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (floor(coalesce(col("sc").cast("double") / col("n_bigrams"), lit(0.0))
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("avg_gram_freq"))
  }

  /** Interpolated Kneser–Ney bigram LM document scoring (the CCNet
    * perplexity filter): train bigram statistics on the `trainPred` slice
    * of the corpus (the "clean reference corpus" — CCNet uses Wikipedia),
    * score EVERY document by its mean per-bigram negative log-likelihood
    * under the smoothed LM, and bucket documents into `buckets` perplexity
    * bands (CCNet keeps the low-perplexity head, flags the tail).
    *
    * Formula (discount d = 0.75, add-1-smoothed continuation so unseen
    * words stay finite):
    *   P(w2|w1) = max(c(w1,w2) − d, 0)/c(w1) + d·N1+(w1,·)/c(w1) · Pc(w2)
    *   Pc(w2)   = (N1+(·,w2) + 1) / (T + V)
    * with T = distinct train bigram types, V = distinct train words + 1
    * (an OOV slot). Unseen (w1,w2) with seen history w1 drops the first
    * term; an unseen history backs off to Pc(w2) alone.
    *
    * Determinism discipline (hash-matches the DuckDB oracle): all counts
    * are exact integers; −ln P is evaluated ONCE per bigram TYPE (the
    * model frame), quantized half-up to integer micros; per-doc totals are
    * Σ tf·lp over exact longs — order-free — with one double division at
    * the end, rounded to a micro. The tercile assignment avoids a global
    * window via [[Scale.distributedNtile]] (value-bucketed two-phase rank).
    *
    * 100 TB shape: two corpus-wide shuffles (the train-bigram aggregate
    * and the per-doc (doc,w1,w2) tf aggregate — both partial-aggregated
    * map-side); the seen-bigram model join is a bigram-type-bounded
    * equi-join (AQE picks broadcast when it fits); the unigram backoff
    * tables (hist/cont) and the two scalars broadcast. In production the
    * train slice is a fixed reference corpus, so the model frame is
    * reference-bounded, independent of the scored corpus's size.
    *
    * Output: (doc_id, n_bigrams, avg_nll, ppl_bucket) for every doc with
    * at least one bigram (single-word docs have no bigram evidence and
    * are excluded by contract); ppl_bucket 1 = head … `buckets` = tail.
    */
  def knScore(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      trainPred: org.apache.spark.sql.Column, buckets: Int = 3,
      maxDriverTypes: Long = 1L << 20): org.apache.spark.sql.DataFrame = {
    val d = 0.75
    val base = df.select(col(idCol).cast(LongType).as("doc_id"),
      col(textCol).as("__text"), trainPred.as("__train"))
    // bigram pairs as STRUCTS straight off the zip (not gramsOf's joined
    // string, which every consumer would have to re-split per gram row)
    def pairsOf(ws: org.apache.spark.sql.Column) = filter(
      zip_with(ws, slice(ws, lit(2), size(ws)),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w2").isNotNull)
    val trainGrams = base.filter(col("__train"))
      .select(explode(pairsOf(split(col("__text"), " "))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    // c12 is the LM's sufficient statistic — EVERY downstream frame (model,
    // hist, cont, T) derives from it. Unpersisted, Catalyst re-plans each
    // leg from the raw corpus (measured: 5 separate gram-explode subtrees,
    // no exchange reuse). Persisting turns the pipeline into ONE train-gram
    // pass + four aggregates over the bigram-type-bounded cache —
    // MEMORY_AND_DISK for the same contract as q_rfm's entity aggregate.
    // Bench/Verify clearCache() between queries.
    val c12 = trainGrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materializes the cache; also drives the model-join strategy below
    val nTypes = c12.count()
    val hist = c12.groupBy("w1").agg(sum("c12").as("c1"), count(lit(1)).as("n1f"))
    val cont = c12.groupBy("w2").agg(count(lit(1)).as("n1b"))
    // V = train BIGRAM vocabulary + 1 OOV slot, derived from the cached
    // bigram stats — a separate token scan would cost a third corpus pass
    // just to include words that never enter any bigram (single-word
    // docs), an immaterial difference to a smoothing denominator
    val scalars = c12.agg(count(lit(1)).as("tt")).crossJoin(
      c12.select(col("w1").as("w")).union(c12.select(col("w2").as("w")))
        .agg((countDistinct("w") + lit(1L)).as("v")))
    // −ln P once per SEEN bigram type, micro-quantized — the same
    // hoisting discipline as q_hybrid_rrf's idf (evaluate per type, not
    // per occurrence row)
    //
    // Three scoring tiers, picked from the MEASURED type count (free
    // from the cache materialization above):
    //   1. model fits the DRIVER (≤ maxDriverTypes): collect the cached
    //      c12 once, score each doc with the frozen [[KnModel]] in ONE
    //      narrow pass — no gram explode, no joins, no broadcast-build
    //      jobs (the scores are bit-identical to the join path: the
    //      serial formula ≡ the column expressions, pinned by
    //      KnScoreSpec both-paths and KnStreamSpec);
    //   2. model fits a BROADCAST: join gram occurrences map-side — the
    //      per-doc partial aggregate collapses to one row per doc before
    //      any exchange, so the corpus never shuffles;
    //   3. web-scale bigram table: collapse occurrences to per-doc tf
    //      FIRST (fewer rows per join key), then the shuffle equi-join.
    // (Without the broadcast hint Catalyst picked a sort-merge join even
    // for a 916-row model — the scalar crossJoin resets sizeInBytes.)
    val pcSeen = (col("n1b") + lit(1L)) / (col("tt") + col("v"))
    val pknSeen = (col("c12") - lit(d)) / col("c1") +
      lit(d) * col("n1f") / col("c1") * pcSeen
    val model = c12.join(hist, "w1").join(cont, "w2")
      .crossJoin(broadcast(scalars))
      .select(col("w1"), col("w2"),
        floor(-log(pknSeen) * lit(1e6) + lit(0.5)).cast(LongType).as("lp"))
    val tfOcc = base
      .select(col("doc_id"), explode(pairsOf(split(col("__text"), " "))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val pcBack = (coalesce(col("n1b"), lit(0L)) + lit(1L)) / (col("tt") + col("v"))
    val lpBack = floor(-log(
      when(col("c1").isNotNull, lit(d) * col("n1f") / col("c1") * pcBack)
        .otherwise(pcBack)) * lit(1e6) + lit(0.5)).cast(LongType)
    val weighted = if (nTypes <= 4000000L)
      tfOcc.withColumn("tf", lit(1L)).join(broadcast(model), Seq("w1", "w2"), "left")
    else
      tfOcc.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
        .join(model, Seq("w1", "w2"), "left")
    val scored = weighted
      .join(broadcast(hist), Seq("w1"), "left")
      .join(broadcast(cont), Seq("w2"), "left")
      .crossJoin(broadcast(scalars))
      .select(col("doc_id"), col("tf"), coalesce(col("lp"), lpBack).as("lp"))
    // persisted: distributedNtile drives three actions over the per-doc
    // aggregate (cutoff quantile job, total count, ranking job) — without
    // persistence each one re-runs BOTH corpus gram explodes and the model
    // joins. MEMORY_AND_DISK is the 100 TB contract (doc-bounded but
    // entity-sized; an evicted MEMORY_ONLY block would silently recompute
    // the whole LM pipeline mid-rank). Bench and Verify clearCache()
    // between queries; callers that reuse the session should unpersist
    // after the final action over the result.
    val perDocJoined = scored.groupBy("doc_id").agg(
        sum(col("tf") * col("lp")).as("nll_micros"),
        sum("tf").as("n_bigrams"))
      .withColumn("avg_nll",
        floor(col("nll_micros").cast("double") / col("n_bigrams").cast("double")
          + lit(0.5)) / lit(1e6))
      .select("doc_id", "n_bigrams", "avg_nll")
    val perDoc = (if (nTypes <= maxDriverTypes) {
        val m = buildKnModel(c12.collect())
        // broadcast, not closure-shipped: per-task closure deserialization
        // of a large model dominates small batches (see perplexityGate)
        val bc = df.sparkSession.sparkContext.broadcast(m)
        val scoreU = udf((text: String) => bc.value.avgNll(text))
        base.select(col("doc_id"),
            (size(split(col("__text"), " ")) - 1).cast(LongType).as("n_bigrams"),
            scoreU(col("__text")).as("avg_nll"))
          .filter(col("n_bigrams") >= 1L)
      } else perDocJoined)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Scale.distributedNtile(perDoc, Seq(col("avg_nll"), col("doc_id")),
        "avg_nll", descending = false, buckets, "ppl_bucket")
      .select(col("doc_id"), col("n_bigrams"), col("avg_nll"),
        col("ppl_bucket").cast(LongType).as("ppl_bucket"))
      .orderBy("doc_id")
  }

  /** Frozen interpolated-KN bigram model for map-side / streaming scoring
    * — the batch→speed-layer handoff: train once on the reference corpus
    * ([[knModel]]), broadcast the bounded statistics into a stream, score
    * each arriving document with zero joins and zero state.
    *
    * `bigramLp`/`avgNll` reproduce the batch column expressions BIT FOR
    * BIT (same float association, same micro rounding — the equality
    * KnScoreSpec pins between the serial formula and the distributed
    * plan, and KnStreamSpec pins end-to-end against [[knScore]] output).
    */
  final case class KnModel(
      c12: Map[(String, String), Long],
      hist: Map[String, (Long, Long)],
      cont: Map[String, Long],
      tt: Long,
      v: Long) {
    private val d = 0.75
    private def pc(w2: String): Double =
      (cont.getOrElse(w2, 0L) + 1).toDouble / (tt + v)
    /** Micro-quantized −ln P(w2|w1), all backoff tiers. */
    def bigramLp(w1: String, w2: String): Long = {
      val p = c12.get((w1, w2)) match {
        case Some(c) =>
          val (c1, n1f) = hist(w1)
          (c - d) / c1 + d * n1f / c1 * pc(w2)
        case None => hist.get(w1) match {
          case Some((c1, n1f)) => d * n1f / c1 * pc(w2)
          case None => pc(w2)
        }
      }
      math.floor(-math.log(p) * 1e6 + 0.5).toLong
    }
    /** Mean per-bigram −log P, micro-rounded like the batch path; None
      * when the doc has no bigram (no evidence → abstain). */
    def avgNll(text: String): Option[Double] = {
      val ws = text.split(" ", -1)
      if (ws.length < 2) None
      else {
        var s = 0L
        var i = 0
        while (i < ws.length - 1) { s += bigramLp(ws(i), ws(i + 1)); i += 1 }
        Some(math.floor(s.toDouble / (ws.length - 1) + 0.5) / 1e6)
      }
    }
  }

  /** Train and COLLECT the frozen KN model: one train-gram aggregate, one
    * collect of the bigram-type-bounded count table (every other statistic
    * derives from it serially — same derivations as the distributed
    * [[knScore]] frames). `maxTypes` bounds the driver state: a model past
    * the cap cannot ship in a closure/broadcast — use the distributed
    * [[knScore]] instead (require, not silent truncation).
    */
  def knModel(df: org.apache.spark.sql.DataFrame, textCol: String,
      trainPred: org.apache.spark.sql.Column, maxTypes: Long = 1L << 22): KnModel = {
    val ws = split(col(textCol), " ")
    val pairs = filter(
      zip_with(ws, slice(ws, lit(2), size(ws)),
        (a, b) => struct(a.as("w1"), b.as("w2"))),
      p => p.getField("w2").isNotNull)
    val rows = df.filter(trainPred).select(explode(pairs).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
      .collect()
    require(rows.length <= maxTypes,
      s"knModel: ${rows.length} bigram types exceed maxTypes=$maxTypes; " +
        "a model this size cannot ship driver-side — use knScore's distributed path")
    buildKnModel(rows)
  }

  /** Assemble a [[KnModel]] from collected (w1, w2, c12) rows — shared by
    * [[knModel]] and [[knScore]]'s driver-model fast path. */
  private def buildKnModel(rows: Array[org.apache.spark.sql.Row]): KnModel = {
    val c12 = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val hist = c12.groupBy(_._1._1)
      .map { case (w1, m) => w1 -> (m.values.sum, m.size.toLong) }
    val cont = c12.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val vocab = c12.keysIterator.flatMap(k => Iterator(k._1, k._2)).toSet
    KnModel(c12, hist, cont, c12.size.toLong, vocab.size.toLong + 1L)
  }
}
