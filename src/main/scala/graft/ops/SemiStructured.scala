package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured (JSON-string) column handling — every event pipeline
  * carries a `props` blob whose schema drifts faster than the table's:
  * new clients add fields, old clients send malformed payloads, and the
  * engine has to extract what it can WITHOUT failing the scan. Spark's
  * `get_json_object` returns null on malformed JSON and missing paths
  * (never throws), which is exactly the posture a 100 TB scan needs —
  * one bad row cannot kill a stage. Everything here is per-row
  * projection + partial-aggregable collapse; JSON text never rides a
  * shuffle.
  */
object SemiStructured {

  /** Extract a JSON path as a long (null on malformed JSON, missing
    * path, or a non-numeric value — the never-throw contract; under
    * ANSI mode a plain cast would FAIL THE STAGE on the first
    * non-numeric value, so this is `try_cast`). */
  def jsonLong(jsonCol: Column, path: String): Column =
    get_json_object(jsonCol, path).try_cast("long")

  /** Extract a JSON path as a string (null on malformed/missing). */
  def jsonString(jsonCol: Column, path: String): Column =
    get_json_object(jsonCol, path)

  /** Per-group health + stats of one numeric JSON field — the
    * "is this payload field usable?" audit run before anything trusts
    * it: row count, rows where the field did NOT extract (malformed
    * payload, missing path, or non-numeric — the consumer can't tell
    * the difference and shouldn't), and exact sum/min/max over the rows
    * that did. One partial-aggregable groupBy. */
  def fieldStats(df: DataFrame, groupCol: String, jsonCol: String,
      path: String): DataFrame = {
    val k = jsonLong(col(jsonCol), path)
    df.select(col(groupCol), k.as("__k__"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__k__").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(col("__k__")).as("k_sum"),
        min(col("__k__")).as("k_min"),
        max(col("__k__")).as("k_max"))
  }

  /** The `[{"role": …, "content": …}, …]` schema SFT/RLHF transcripts
    * ship in. `from_json` returns null on malformed payloads and on
    * valid JSON of the wrong shape — never throws (the [[jsonLong]]
    * posture). */
  private val turnsSchema = "array<struct<role:string,content:string>>"

  private def parsedTurns(jsonCol: Column): Column =
    // the leading-'[' guard: Spark's from_json helpfully wraps a lone
    // JSON OBJECT into a one-element array, which would make the two
    // engines disagree on wrong-shape payloads — only actual arrays
    // parse (the oracle's json_type(j) = 'ARRAY' twin)
    when(startswith(ltrim(jsonCol), lit("[")),
      from_json(jsonCol,
        org.apache.spark.sql.types.DataType.fromDDL(turnsSchema)))

  /** Explode a JSON chat transcript into one row per turn — the
    * normalized view every SFT-data transform (templating, masking,
    * per-turn filtering) starts from; [[graft.ops.TextAnalysis
    * .dialogueStats]] is the line-format sibling. Malformed payloads,
    * non-array payloads, AND well-formed arrays whose elements are not
    * objects (`["a","b"]` — from_json nulls the whole parse) contribute
    * ZERO rows — pair with a `json_valid`-style audit upstream to count
    * them; one bad blob cannot kill the scan. Per-row parse + explode,
    * no shuffle, streams unchanged. Returns
    * (idCol, turn_idx 1-based, role, content, n_chars). */
  def dialogueTurnsJson(df: DataFrame, idCol: String,
      jsonCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(parsedTurns(col(jsonCol))).as(Seq("__i__", "__t__")))
      .select(col(idCol), (col("__i__") + 1).as("turn_idx"),
        col("__t__").getField("role").as("role"),
        col("__t__").getField("content").as("content"),
        coalesce(length(col("__t__").getField("content")).cast("long"),
          lit(0L)).as("n_chars"))

  /** Loss-mask QA over JSON chat transcripts — what fraction of each
    * transcript's characters the loss will actually train on
    * (assistant turns), plus the structural red flags that poison the
    * mask: an assistant turn with EMPTY content (templating bug — the
    * model learns to say nothing), consecutive same-role turns
    * (alternation break), and an opening assistant turn. All per-row
    * lambda folds over the parsed array — no explode, no shuffle,
    * streams unchanged; malformed payloads yield n_turns = 0 rows that
    * a `WHERE n_turns = 0` audit catches. `trainable_ratio` is null on
    * zero total content. Returns (idCol, n_turns, n_assistant,
    * assistant_chars, total_chars, trainable_ratio,
    * has_empty_assistant, alternation_breaks, starts_with_assistant).
    */
  def sftMaskStats(df: DataFrame, idCol: String,
      jsonCol: String): DataFrame = {
    val t = parsedTurns(col(jsonCol))
    def chars(cond: Column => Column) =
      coalesce(aggregate(t, lit(0L), (acc, x) =>
        acc + when(cond(x),
          coalesce(length(x.getField("content")).cast("long"), lit(0L)))
          .otherwise(0L)), lit(0L))
    val isAsst = (x: Column) => x.getField("role") === "assistant"
    val nTurns = coalesce(size(t), lit(0)).cast("long")
    val roles = transform(t, x => x.getField("role"))
    val tailLen = greatest(size(roles) - 1, lit(0))
    val breaks = when(nTurns >= 2, coalesce(size(filter(
        zip_with(slice(roles, lit(1), tailLen),
          slice(roles, lit(2), tailLen),
          (a, b) => a <=> b),
        x => x)).cast("long"), lit(0L)))
      .otherwise(lit(0L))
    df.select(col(idCol),
      nTurns.as("n_turns"),
      coalesce(size(filter(t, isAsst)), lit(0)).cast("long")
        .as("n_assistant"),
      chars(isAsst).as("assistant_chars"),
      chars(_ => lit(true)).as("total_chars"),
      round(try_divide(chars(isAsst).cast("double"),
        chars(_ => lit(true)).cast("double")), 6).as("trainable_ratio"),
      coalesce(exists(t, x => isAsst(x) &&
          coalesce(length(x.getField("content")), lit(0)) === 0),
        lit(false)).as("has_empty_assistant"),
      breaks.as("alternation_breaks"),
      coalesce(element_at(roles, 1) === "assistant", lit(false))
        .as("starts_with_assistant"))
  }
}
