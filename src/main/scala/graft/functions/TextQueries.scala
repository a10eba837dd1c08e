package graft.functions

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operator queries over the `documents` table: token
  * counting, fingerprinting, language ID, quality scoring — the
  * text-pipeline half of the training-data operators, each with a DuckDB
  * oracle mirroring the exact heuristics.
  */
object TextQueries extends QueryModule {

  import Tables._
  import TextFunctions._

  /** DuckDB fragment: normalized text `t` for `documents`. */
  private val normSql =
    "SELECT doc_id, source, lang, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t FROM documents"

  private def occSql(expr: String, sub: String): String =
    s"CAST(length($expr) - length(replace($expr, '$sub', '')) AS DOUBLE) / ${sub.length}"

  override def queries: Map[String, QueryDef] = Map(
    // ----------------------------------------------------------------
    // Token count + char stats + md5 fingerprint per document.
    "q28_text_stats" -> QueryDef(
      fn = (s, d) =>
        documents(s, d)
          .select(
            col("doc_id"),
            col("source"),
            tokenCount(col("text")).as("n_tokens"),
            length(normalizeText(col("text"))).as("n_chars_norm"),
            fingerprint(col("text")).as("fp")
          ),
      oracle = Some(s"""
        SELECT doc_id, source,
               CAST(CASE WHEN length(t) = 0 THEN 0
                         ELSE len(string_split(t, ' ')) END AS INTEGER) AS n_tokens,
               CAST(length(t) AS INTEGER) AS n_chars_norm,
               md5(t) AS fp
        FROM ($normSql)""")
    ),

    // ----------------------------------------------------------------
    // Language ID: marker-word argmax heuristic + CJK check, counted per
    // (predicted, labeled) pair — the confusion matrix of the heuristic.
    "q29_lang_id" -> QueryDef(
      fn = (s, d) => {
        graft.plans.VectorFunctions.register(s)
        documents(s, d)
          .withColumn("predicted", langId(col("text")))
          .groupBy(col("predicted"), col("lang"))
          .agg(count(lit(1)).as("n"))
      },
      oracle = Some {
        val padded = "(' ' || t || ' ')"
        val cnts = TextFunctions.langMarkers.map { case (lang, ms) =>
          lang -> s"(len(regexp_split_to_array($padded, '${ms.mkString("|")}')) - 1)"
        }
        val best = cnts.map(_._2).reduceLeft((a, b) => s"GREATEST($a, $b)")
        // fold in declaration order: later whens win only on earlier langs,
        // mirroring the Scala foldLeft over reversed markers
        val caseExpr = cnts.reverse.foldLeft("'und'") { case (acc, (lang, c)) =>
          s"CASE WHEN $c = best_cnt AND best_cnt > 0 THEN '$lang' ELSE $acc END"
        }
        s"""
        SELECT predicted, lang, COUNT(*) AS n FROM (
          SELECT lang,
                 CASE WHEN length(regexp_replace(t, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) > 0
                      THEN 'zh' ELSE $caseExpr END AS predicted
          FROM (SELECT *, $best AS best_cnt FROM ($normSql))
        ) GROUP BY predicted, lang"""
      }
    ),

    // ----------------------------------------------------------------
    // Quality scoring: length/stopword/punct/digit components, averaged
    // per source bucket (the pipeline's per-shard quality report).
    "q30_text_quality" -> QueryDef(
      fn = (s, d) =>
        documents(s, d)
          .withColumn("q", qualityScore(col("text")))
          .groupBy(col("source"))
          .agg(
            sum(col("q").cast("long")).cast("double")./(count(lit(1))).as("avg_quality"),
            min(col("q")).as("min_quality"),
            max(col("q")).as("max_quality"),
            count(lit(1)).as("n_docs")
          ),
      oracle = Some {
        val padded = "(' ' || t || ' ')"
        val stops = TextFunctions.langMarkers
          .find(_._1 == "en").get._2
          .map(m => occSql(padded, m)).mkString("(", " + ", ")")
        s"""
        SELECT source,
               CAST(SUM(CAST(q AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_quality,
               CAST(MIN(q) AS INTEGER) AS min_quality,
               CAST(MAX(q) AS INTEGER) AS max_quality,
               COUNT(*) AS n_docs
        FROM (
          SELECT source,
            GREATEST(LEAST(
              (CASE WHEN length(t) BETWEEN 200 AND 4000 THEN 40
                    WHEN length(t) BETWEEN 50 AND 199 THEN 25 ELSE 10 END)
              + (CASE WHEN $stops >= 3 THEN 30 WHEN $stops >= 1 THEN 20 ELSE 5 END)
              + 30
              - LEAST(length(regexp_replace(t, '[^.!?,;:]', '', 'g')) * 2, 20)
              - LEAST(length(regexp_replace(t, '[^0-9]', '', 'g')), 10), 100), 0) AS q
          FROM ($normSql)
        ) GROUP BY source"""
      }
    )
  )
}
