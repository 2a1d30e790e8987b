package graft.queries

import graft.ops.{ChangeCapture, Contamination, Packing, QualitySignals, TextAnalysis, UrlOps}
import org.apache.spark.sql.functions._

/** Training-data pipeline surface, round 3: repetition quality
  * signals, benchmark decontamination, URL/domain provenance
  * filtering, sequence packing, and snapshot differencing (batch
  * CDC). Each query is oracle-checked against DuckDB on the same
  * fixtures; the URL fixture column is derived deterministically from
  * (lang, doc_id) since the corpus has no natural URL column.
  */
object PipelineQueries {

  /** SQL token-array expression shared by Spark `expr` fragments. */
  private val tkSql = "split(lower(trim(text)), '\\\\s+')"

  val queries: Map[String, Q] = Map(
    // Gopher-style repetition signals over 2-grams: repeated-gram
    // fraction + most-dominant-gram share, computed narrowly per row
    "q85_repetition_metrics" -> ((s, dir) => {
      QualitySignals.repetitionMetrics(t(s, dir, "documents"),
          "doc_id", "text", n = 2)
        .orderBy("doc_id")
    }),

    // decontamination: corpus docs sharing any verbatim 5-gram with
    // the benchmark set (every 50th doc); planted truncated copies of
    // the benchmark docs guarantee real hits. Benchmark side broadcast.
    "q86_contamination" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val bench = d.where(col("doc_id") % 50 === 0).select("doc_id", "text")
      val corpus = d.where(col("doc_id") % 50 =!= 0).select("doc_id", "text")
        .unionAll(bench.select((col("doc_id") + 1000000L).as("doc_id"),
          expr(s"concat_ws(' ', slice($tkSql, 1, greatest((size($tkSql) * 4) div 5, 1)))")
            .as("text")))
      Contamination.check(corpus, bench, "doc_id", "text", n = 5)
        .orderBy("doc_id")
    }),

    // URL provenance filter over a deterministic synthetic URL:
    // host + apex-domain extraction, apex blocklist drop
    "q87_url_filter" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("url", concat(lit("https://"), col("lang"), lit(".site-"),
          (col("doc_id") % 20).cast("string"), lit(".com/p/"),
          col("doc_id").cast("string")))
      UrlOps.filterBlocked(d, "url", Seq("site-3.com", "site-7.com", "site-13.com"))
        .select("doc_id", "url", "host", "apex")
        .orderBy("doc_id")
    }),

    // sequence packing: concat-then-chunk the per-language token
    // stream into 2048-token training blocks (start block + offset)
    "q88_sequence_packing" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      Packing.packTokenStream(d, "lang", "doc_id", "n_tokens", blockTokens = 2048L)
        .select("doc_id", "lang", "n_tokens", "start_block", "block_offset")
        .orderBy("lang", "doc_id")
    }),

    // snapshot diff (batch CDC): old = corpus; new drops every 13th
    // doc, revises every 11th, appends copies of every 17th (+3M ids)
    "q89_snapshot_diff" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val oldSnap = d.select("doc_id", "text")
      val newSnap = d.where(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")).as("text"))
        .unionAll(d.where(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(col("text"), lit(" [new]")).as("text")))
      ChangeCapture.snapshotDiff(oldSnap, newSnap, Seq("doc_id"), Seq("text"))
        .orderBy("doc_id")
    }))

  val oracles: Map[String, String] = Map(
    "q85_repetition_metrics" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
                     FROM documents),
         g AS (SELECT doc_id, array_to_string(tk[i:i+1], ' ') AS g
               FROM tk, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
               WHERE len(tk) >= 2),
         c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2),
         m AS (SELECT doc_id, g, c, MAX(c) OVER (PARTITION BY doc_id) AS mx FROM c),
         a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_c
               FROM c GROUP BY doc_id),
         top AS (SELECT doc_id, MIN(g) AS top_gram FROM m WHERE c = mx GROUP BY doc_id)
         SELECT a.doc_id, n_grams, n_distinct, top_gram, top_c,
           CAST((n_grams - n_distinct) * 1000 // n_grams AS BIGINT) AS dup_gram_milli,
           CAST(top_c * 1000 // n_grams AS BIGINT) AS top_gram_milli
         FROM a JOIN top ON top.doc_id = a.doc_id ORDER BY a.doc_id""",
    "q86_contamination" ->
      """WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
         corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
                    UNION ALL
                    SELECT doc_id + 1000000 AS doc_id,
                      array_to_string(tk[1:greatest((len(tk)*4)//5, 1)], ' ') AS text
                    FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
                          FROM documents WHERE doc_id % 50 = 0)),
         csh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+4], ' ') AS sh
                 FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
                       FROM corpus) tkc,
                      LATERAL (SELECT unnest(range(1, len(tk) - 3)) AS i) r
                 WHERE len(tk) >= 5),
         bsh AS (SELECT DISTINCT doc_id AS bench_id, array_to_string(tk[i:i+4], ' ') AS sh
                 FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
                       FROM bench) tkb,
                      LATERAL (SELECT unnest(range(1, len(tk) - 3)) AS i) r
                 WHERE len(tk) >= 5)
         SELECT c.doc_id, CAST(COUNT(DISTINCT c.sh) AS BIGINT) AS n_hit_grams,
           CAST(COUNT(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs,
           MIN(b.bench_id) AS first_bench_id
         FROM csh c JOIN bsh b ON b.sh = c.sh
         GROUP BY c.doc_id ORDER BY c.doc_id""",
    "q87_url_filter" ->
      """WITH u AS (SELECT doc_id,
           'https://' || lang || '.site-' || CAST(doc_id % 20 AS VARCHAR)
             || '.com/p/' || CAST(doc_id AS VARCHAR) AS url
           FROM documents),
         h AS (SELECT doc_id, url,
                 regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1) AS host
               FROM u),
         a AS (SELECT doc_id, url, host,
                 regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS apex FROM h)
         SELECT doc_id, url, host, apex FROM a
         WHERE apex NOT IN ('site-3.com', 'site-7.com', 'site-13.com')
         ORDER BY doc_id""",
    "q88_sequence_packing" ->
      """WITH d AS (SELECT doc_id, lang,
           CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
           FROM documents),
         c AS (SELECT doc_id, lang, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM d)
         SELECT doc_id, lang, n_tokens,
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS start_block,
           CAST((cum - n_tokens) % 2048 AS BIGINT) AS block_offset
         FROM c ORDER BY lang, doc_id""",
    "q89_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, text FROM documents),
         neu AS (SELECT doc_id,
                   CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]' ELSE text END AS text
                 FROM documents WHERE doc_id % 13 <> 0
                 UNION ALL
                 SELECT doc_id + 3000000 AS doc_id, text || ' [new]' AS text
                 FROM documents WHERE doc_id % 17 = 0),
         j AS (SELECT o.doc_id AS o_id, n.doc_id AS n_id, o.text AS ot, n.text AS nt
               FROM old o FULL OUTER JOIN neu n ON n.doc_id = o.doc_id)
         SELECT coalesce(o_id, n_id) AS doc_id,
           CASE WHEN n_id IS NULL THEN 'delete'
                WHEN o_id IS NULL THEN 'insert'
                WHEN ot IS DISTINCT FROM nt THEN 'update' END AS change_type
         FROM j
         WHERE n_id IS NULL OR o_id IS NULL OR ot IS DISTINCT FROM nt
         ORDER BY doc_id""")
}
