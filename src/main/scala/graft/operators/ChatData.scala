package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Post-training data operators: the integrity gates an SFT / preference
  * (DPO-style) dataset runs before a single gradient step — the
  * post-training counterpart of the pretraining gates
  * ([[CorpusOps.gopherRules]], dedup). Everything is higher-order array
  * functions over the parsed message structs — map-only, codegen'd, no
  * UDF; the JSONL intake side is the existing PERMISSIVE corpus reader
  * (q193).
  */
object ChatData {

  /** Per-conversation structural validation over an
    * `array<struct<role,content>>` column. The contract (spec-pinned,
    * the common-denominator chat schema):
    *   - an optional single leading `system` turn
    *   - then strict user/assistant alternation STARTING with user
    *   - the last turn is `assistant` (a trailing user turn trains
    *     nothing)
    *   - no empty/whitespace-only content anywhere
    * Emits per-rule booleans plus the conjunction — per-rule attrition
    * is the report, as everywhere else in the engine. */
  def validateChats(df: DataFrame, convIdCol: String,
      messagesCol: String): DataFrame = {
    val msgs = col(messagesCol)
    val roles = transform(msgs, m => m.getField("role"))
    val body = when(try_element_at(roles, lit(1)) === "system",
      slice(roles, lit(2), size(roles))).otherwise(roles)
    val alternates = forall(
      zip_with(body, sequence(lit(0), size(body) - 1),
        (r, i) => r === when(pmod(i, lit(2)) === 0, "user")
          .otherwise("assistant")),
      x => x)
    df.select(col(convIdCol), size(msgs).as("n_turns"),
        coalesce(try_element_at(roles, lit(1)).isin("system", "user"), lit(false))
          .as("ok_opening"),
        (size(body) >= 2 && coalesce(alternates, lit(false)))
          .as("ok_alternation"),
        coalesce(try_element_at(roles, lit(-1)) === "assistant", lit(false))
          .as("ok_ends_assistant"),
        // NULL content counts as empty (coalesce inner to true) and a
        // NULL/empty messages array fails the rule — exists() over an
        // EMPTY array is false (not NULL), so the size guard is what
        // actually fails the zero-message case; the outer coalesce
        // catches the NULL-array case. Every rule column is a concrete
        // boolean, so per-rule attrition counts stay exact
        coalesce(size(msgs) > 0 && !exists(msgs, m =>
          coalesce(length(trim(m.getField("content"))) === 0, lit(true))),
          lit(false)).as("ok_no_empty"))
      .withColumn("is_valid",
        col("ok_opening") && col("ok_alternation") &&
          col("ok_ends_assistant") && col("ok_no_empty"))
  }

  /** Preference-pair (chosen/rejected) integrity: prompt present and
    * non-blank, both sides present and non-empty, sides DISTINCT (an
    * identical pair carries zero preference signal), and the prompt's
    * copy count across the dataset (duplicate prompts leak preference
    * labels between epochs and between train/eval). One prompt-keyed
    * count join — the exact-dedup shuffle shape. The join is null-safe
    * (`<=>`): a NULL prompt (missing field in JSONL intake) stays in the
    * report flagged `ok_prompt = false` instead of silently vanishing
    * from the very gate meant to surface it. */
  def validatePreferencePairs(df: DataFrame, pairIdCol: String,
      promptCol: String, chosenCol: String,
      rejectedCol: String): DataFrame = {
    val copies = df.groupBy(col(promptCol).as("__p"))
      .agg(count(lit(1)).as("n_prompt_copies"))
    df.join(copies, col(promptCol) <=> col("__p"))
      .select(col(pairIdCol),
        (length(trim(coalesce(col(promptCol), lit("")))) > 0)
          .as("ok_prompt"),
        (length(trim(coalesce(col(chosenCol), lit("")))) > 0 &&
          length(trim(coalesce(col(rejectedCol), lit("")))) > 0)
          .as("ok_nonempty"),
        (!(col(chosenCol) <=> col(rejectedCol))).as("ok_distinct"),
        col("n_prompt_copies"))
      .withColumn("is_train_ready",
        col("ok_prompt") && col("ok_nonempty") && col("ok_distinct") &&
          col("n_prompt_copies") === 1L)
  }
}
