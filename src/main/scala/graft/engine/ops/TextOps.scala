package graft.engine.ops

import org.apache.spark.sql.functions._

import graft.engine.{QueryDef, Tables}

/**
 * Text analysis for training-data pipelines (builder brief): language ID,
 * quality scoring, token counting, document fingerprinting — all over the
 * documents table, all as codegen-friendly built-ins (no UDFs), all
 * embarrassingly parallel per row (the 100 TB property: map-only until the
 * final bounded aggregation/sort).
 */
object TextOps {

  private val toks = split(col("text"), " ")

  // Fixed marker-token profiles for the n-gram/stopword language heuristic.
  // (The corpus vocabulary is synthetic; profiles are arbitrary but FIXED —
  // what matters is the operator shape: per-doc profile scores → argmax.)
  private val profiles = Seq(
    "en" -> Seq("the", "a", "fast", "data"),
    "de" -> Seq("table", "row", "group", "order"),
    "fr" -> Seq("query", "join", "filter", "stream"))

  // --- q43: language identification (profile-score argmax) ----------------
  // Output is the (actual lang × predicted lang) confusion matrix.
  private val q43 = QueryDef(
    "q43_text_langid", {
      val scores = profiles.map { case (l, ws) =>
        val inList = ws.map(w => s"'$w'").mkString("[", ",", "]")
        s"len(list_filter(string_split(text, ' '), t -> list_contains($inList, t))) AS s_$l"
      }.mkString(", ")
      s"""WITH scored AS (SELECT lang, $scores FROM documents)
         |SELECT lang, CASE
         |    WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
         |    WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred,
         |  COUNT(*) AS n_docs
         |FROM scored GROUP BY lang, pred ORDER BY lang, pred""".stripMargin
    }) { (s, dir) =>
    val scored = profiles.foldLeft(Tables.table(s, dir, "documents")) {
      case (df, (l, ws)) =>
        val inList = ws.map(w => s"'$w'").mkString("array(", ",", ")")
        df.withColumn(s"s_$l",
          expr(s"size(filter(split(text, ' '), t -> array_contains($inList, t)))"))
    }
    scored
      .withColumn("pred",
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_de") >= col("s_fr"), "de").otherwise("fr"))
      .groupBy("lang", "pred")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "pred")
  }

  // --- q44: per-document quality scoring ----------------------------------
  // Ratios are exact decimal divisions (never rounded doubles), so both
  // engines agree bit-for-bit; quality is a fixed linear combination.
  private val q44 = QueryDef(
    "q44_text_quality",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS l,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(list_distinct(string_split(text, ' '))) AS n_distinct,
      |    len(list_filter(string_split(text, ' '),
      |        t -> list_contains(['the','a','of','and'], t))) AS n_stop
      |  FROM documents)
      |SELECT doc_id, n_tokens,
      |  CAST(CAST(CAST(n_distinct AS DECIMAL(18,6)) / n_tokens AS DECIMAL(38,6)) AS DOUBLE) AS ttr,
      |  CAST(CAST(CAST(n_stop AS DECIMAL(18,6)) / n_tokens AS DECIMAL(38,6)) AS DOUBLE) AS stop_ratio,
      |  CAST(CAST(CAST(list_sum(list_transform(l, x -> length(x))) AS DECIMAL(18,6)) / n_tokens AS DECIMAL(38,6)) AS DOUBLE) AS avg_tok_len,
      |  CAST(CAST(CAST(CAST(n_distinct AS DECIMAL(18,6)) / n_tokens AS DECIMAL(38,6))
      |     - CAST(CAST(n_stop AS DECIMAL(18,6)) / n_tokens AS DECIMAL(38,6)) AS DECIMAL(38,6)) AS DOUBLE) AS quality
      |FROM t ORDER BY doc_id LIMIT 200""".stripMargin) { (s, dir) =>
    val nTokens = size(toks)
    val nDistinct = size(array_distinct(toks))
    val nStop = expr("size(filter(split(text, ' '), t -> array_contains(array('the','a','of','and'), t)))")
    val sumLen = expr("aggregate(transform(split(text, ' '), x -> length(x)), 0, (acc, x) -> acc + x)")
    def ratio(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      (a.cast("decimal(18,6)") / b).cast("decimal(38,6)")
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), nTokens.as("n_tokens"),
        ratio(nDistinct, nTokens).cast("double").as("ttr"),
        ratio(nStop, nTokens).cast("double").as("stop_ratio"),
        ratio(sumLen, nTokens).cast("double").as("avg_tok_len"),
        (ratio(nDistinct, nTokens) - ratio(nStop, nTokens))
          .cast("decimal(38,6)").cast("double").as("quality"))
      .orderBy("doc_id").limit(200)
  }

  // --- q45: token counting — whitespace vs BPE-ish regex ------------------
  // Regex stays in class/alternation territory shared by java.util.regex
  // and RE2 so both engines tokenize identically.
  private val q45 = QueryDef(
    "q45_text_tokencount",
    """SELECT lang,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
      |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS re_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "documents")
      .groupBy("lang")
      .agg(
        sum(size(toks)).as("ws_tokens"),
        sum(size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))).as("re_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang")
  }

  // --- q46: document fingerprint (rolling hash over tokens) ---------------
  // Polynomial fold with fixed base/modulus over per-token codes — pure
  // arithmetic, so the SAME fingerprint comes out of any engine (unlike
  // murmur/xxhash). The fold is a per-row O(tokens) map — no shuffle at all
  // until the output sort.
  private val q46 = QueryDef(
    "q46_text_fingerprint",
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ' '),
      |                     t -> CAST(ascii(substr(t, 1, 1)) * 31 + length(t) AS BIGINT))),
      |    (acc, v) -> (acc * 131 + v) % 1000000007) AS fingerprint
      |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin) { (s, dir) =>
    Tables.table(s, dir, "documents")
      .select(col("doc_id"),
        expr("""aggregate(
                |  transform(split(text, ' '),
                |            t -> cast(ascii(substr(t, 1, 1)) * 31 + length(t) AS BIGINT)),
                |  cast(0 AS BIGINT),
                |  (acc, v) -> (acc * 131 + v) % 1000000007)""".stripMargin).as("fingerprint"))
      .orderBy("doc_id").limit(200)
  }

  def defs: Seq[QueryDef] = Seq(q43, q44, q45, q46)
}
