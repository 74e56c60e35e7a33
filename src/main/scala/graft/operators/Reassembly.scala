package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.{ConvDoc, Turn}

/**
 * Conversation reassembly — the window-over-turn_idx stage (SURVEY.md §2.1 S2
 * / §2.6 W1): rebuild each conversation document from its turns under the
 * stable-turn-ordering invariant, the Spark re-expression of the reference's
 * reading-order sort + sequential numbering
 * (/root/reference/duplicate_detector/core/panel_detector.py:184-205).
 *
 * Physical shape: ONE shuffle on conv_id (groupBy), with the in-group sort
 * done via array_sort on (turn_idx, text) structs — cheaper than a
 * Window sort + collect_list because it needs no second ordering pass and
 * stays fully inside whole-stage codegen. Tool payloads are masked before
 * assembly (text-masking analog, ai_...AUTO.py:2530-2593): the tool NAME is
 * kept as a stable token, the payload body is dropped from signature text.
 */
object Reassembly {

  /** turn_idx-stable document assembly: conv_id -> "\n"-joined turn texts. */
  def assemble(turns: Dataset[Turn], maskToolPayloads: Boolean = true): Dataset[ConvDoc] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val sigText =
      if (maskToolPayloads)
        when($"role" === "tool", concat(lit("[tool:"), coalesce($"tool", lit("?")), lit("]")))
          .otherwise($"text")
      else $"text"
    turns
      .select($"conv_id", struct($"turn_idx", sigText.as("text")).as("t"))
      .groupBy($"conv_id")
      .agg(count(lit(1)).cast("int").as("n_turns"),
           array_sort(collect_list($"t")).as("ts"))
      .select($"conv_id", $"n_turns",
              array_join(transform($"ts", x => x("text")), "\n").as("doc_text"))
      .as[ConvDoc]
  }

  /** Window-function variant kept for parity tests (W1 exactly as surveyed):
    * row_number over (conv_id, turn_idx) proves the stable-ordering invariant. */
  def turnOrdinals(turns: Dataset[Turn]) = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns.withColumn("ordinal", row_number().over(w))
  }
}
