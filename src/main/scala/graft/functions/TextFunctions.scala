package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level scalar functions re-expressing the reference's string layer
  * (SURVEY.md §2.8) as pure Spark built-ins — everything stays inside
  * whole-stage codegen; no UDFs on the hot path.
  */
object TextFunctions {

  /** X1 `extractPhones` (`src/services/groupContact.js:2-9`): strip spaces,
    * split on `[,;/]+`, trim, drop empties. Pure higher-order built-ins.
    */
  def extractPhones(c: Column): Column =
    filter(
      transform(split(regexp_replace(c, " ", ""), "[,;/]+"), x => trim(x)),
      x => x =!= "")

  /** X7 `norm` (`groupContact.js:14-18`): trim, empty-string → null. */
  def normStr(c: Column): Column = nullif(trim(c), lit(""))

  /** X3 `stringifyValues` (`saveToPostgres.js:9-15`): cast to string,
    * null → "".
    */
  def stringify(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** X5 date truncation (`server.js:153` `birthdate.split("T")[0]`). */
  def isoDate(c: Column): Column = to_date(c)

  /** Order-preserving distinct (first occurrence wins) over an array —
    * the relational collapse of the reference's `used`/`seenNew` Set logic
    * (`groupContact.js:36-60`). `array_union(empty, a)` is specified to
    * keep first-occurrence order, but we build it explicitly so semantics
    * are locked: positions via transform+array_position.
    */
  def distinctOrdered(c: Column): Column =
    filter(c, (x, i) => array_position(c, x) === i + 1)
}
