package graft.text

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Instruction-tuning pair assembly: template a (prompt, completion)
  * pair out of every document — prompt = instruction + the first
  * `promptTok` tokens, completion = the next `completionTok` tokens —
  * with deterministic token-boundary truncation and a truncation flag.
  * The SFT-data formatting step between a cleaned corpus and a trainer.
  *
  * Scale shape: a pure narrow map (tokenize, slice, join) — no shuffle
  * at all; the output ordering is the only exchange and belongs to the
  * dump, not the operator.
  */
object SftPairs {

  val Instruction = "Summarize: "

  /** (doc_id, source, prompt, completion, completion_tok, truncated):
    * docs with ≤ promptTok tokens have nothing to complete and are
    * dropped (they'd train the model to emit EOS immediately);
    * truncated marks docs whose tail was cut at the completion budget.
    */
  def sftPairs(docs: DataFrame, promptTok: Int = 16,
               completionTok: Int = 48): DataFrame = {
    require(promptTok >= 1 && completionTok >= 1,
      s"token budgets must be >= 1, got ($promptTok, $completionTok)")
    val toks = TextAnalysis.tokens(col("text"))
    docs
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"),
        toks.as("toks"))
      .filter(col("n_tok") > promptTok)
      .select(
        col("doc_id"), col("source"),
        concat(lit(Instruction),
          array_join(slice(col("toks"), 1, promptTok), " ")).as("prompt"),
        array_join(slice(col("toks"), promptTok + 1, completionTok), " ")
          .as("completion"),
        least(col("n_tok") - promptTok, lit(completionTok.toLong))
          .as("completion_tok"),
        (col("n_tok") > promptTok + completionTok).as("truncated"))
      .orderBy(col("doc_id"))
  }

  // ---- queries -------------------------------------------------------------

  val qSftPairs = GraftQuery(
    "q173_sft_pairs",
    (s, dir) => sftPairs(Tables.documents(s, dir)),
    Some("""
      WITH t AS (
        SELECT doc_id, source,
               regexp_split_to_array(trim(text), '\s+') AS toks,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                 AS BIGINT) AS n_tok
        FROM documents)
      SELECT doc_id, source,
             'Summarize: ' || array_to_string(toks[1:16], ' ') AS prompt,
             array_to_string(toks[17:64], ' ') AS completion,
             least(n_tok - 16, 48) AS completion_tok,
             n_tok > 64 AS truncated
      FROM t WHERE n_tok > 16
      ORDER BY doc_id"""))

  val queries: Seq[GraftQuery] = Seq(qSftPairs)
}
