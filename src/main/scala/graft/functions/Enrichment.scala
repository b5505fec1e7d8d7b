package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's enrichment operators P1-P4 (SURVEY.md §2.3),
  * re-expressed as pure `Column` functions over Catalyst built-ins.
  *
  * In the reference each enricher is an async service call wrapped in
  * a latency/failure harness (Services.scala:40-65,116-121); the
  * functions themselves are pure `String => X`. On Spark the 3-way
  * fan-out/fan-in "join" (SURVEY.md §2.4 J1-J4) collapses to a single
  * `Project` evaluating all three expressions per row in one pass —
  * zero shuffle, whole-stage-codegen'd.
  */
object Enrichment {
  /** P1 `Reverser`: value.reverse (Services.scala:47-49). */
  def reverseValue(c: Column): Column = reverse(c)

  /** P2 `UpperCaser`: value.toUpperCase (Services.scala:51-53). */
  def upperValue(c: Column): Column = upper(c)

  /** P3 `Sorter`: the *characters* of the value sorted by code point
    * (Services.scala:56-59, `String.sorted`). Returned bare; wrap in
    * [[sortedWidget]] for the nested `Widget` struct shape. */
  def sortedChars(c: Column): Column =
    concat_ws("", array_sort(split(c, "")))

  /** P3 with the reference's nested `Widget(name)` shape. */
  def sortedWidget(c: Column): Column = struct(sortedChars(c).as("name"))

  /** P4 `DataTransformer`: `"transformed $id"` (Services.scala:62-65). */
  def transformedTag(id: Column): Column =
    concat(lit("transformed "), id.cast("string"))

  /** P6 struct assembly after fan-in: the `EnrichedData` shape. */
  def enriched(id: Column, value: Column): Column =
    struct(
      struct(id.as("id"), value.as("value")).as("input"),
      reverseValue(value).as("extra1"),
      upperValue(value).as("extra2"),
      sortedWidget(value).as("extra3"))

  /** Full `OutputData` assembly (P4+P6). */
  def outputData(id: Column, value: Column): Column =
    struct(enriched(id, value).as("data"), transformedTag(id).as("additional"))

  // ---- SQL (DuckDB) sides for oracle strings ----
  def sqlSortedChars(e: String): String =
    s"array_to_string(list_sort(string_split($e, '')), '')"
  def sqlTransformedTag(e: String): String =
    s"'transformed ' || CAST($e AS VARCHAR)"
}
