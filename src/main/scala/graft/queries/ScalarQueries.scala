package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar-function breadth: string, math, date/time and null-handling
  * builtins, cross-checked against DuckDB. These are the everyday
  * expressions a user migrating from the reference's Postgres SQL
  * reaches for first; all codegen'd builtins, exercised over real
  * columns with deterministic output.
  */
object ScalarQueries {

  type Q = (SparkSession, String) => DataFrame

  def scalarStrings(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("u"),
        lower(col("p_type")).as("l"),
        length(col("p_name")).cast("long").as("len"),
        trim(col("p_name")).as("trimmed"),
        substring(col("p_name"), 1, 5).as("prefix"),
        regexp_replace(col("p_type"), " ", "_").as("snake"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        reverse(col("p_brand")).as("rev"),
        instr(col("p_type"), "ED").cast("long").as("pos"),
        element_at(split(col("p_name"), " "), 1).as("first_word"))
      .orderBy("p_partkey")

  def scalarMath(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        abs(col("c_acctbal")).as("abs_bal"),
        ceil(col("c_acctbal")).cast("double").as("ceil_bal"),
        floor(col("c_acctbal")).cast("double").as("floor_bal"),
        round(sqrt(abs(col("c_acctbal"))), 6).as("sqrt_bal"),
        round(log(abs(col("c_acctbal")) + 1), 6).as("ln_bal"),
        round(pow(col("c_acctbal") / 1000, 2), 6).as("pow_bal"),
        signum(col("c_acctbal")).as("sign_bal"),
        pmod(col("c_custkey"), lit(7)).cast("long").as("mod7"))
      .orderBy("c_custkey")

  def scalarDatetime(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        last_day(to_date(col("o_orderdate"))).as("month_end"),
        date_add(to_date(col("o_orderdate")), 7).as("plus7"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("epoch_us"))
      .orderBy("o_orderkey")

  def scalarNulls(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.select(
        col("event_id"),
        coalesce(nullif(col("event_type"), lit("error")), lit("err")).as("masked"),
        when(col("value") > 100, col("value")).as("big_or_null"),
        coalesce(when(col("value") > 100, col("value")), lit(-1.0)).as("big_or_default"),
        col("value").isNull.as("is_null"),
        (col("value") <=> lit(9.64)).as("null_safe_eq"))
      .orderBy("event_id")
  }

  val defs: Map[String, Q] = Map(
    "scalar_strings" -> (scalarStrings _),
    "scalar_math" -> (scalarMath _),
    "scalar_datetime" -> (scalarDatetime _),
    "scalar_nulls" -> (scalarNulls _))

  val oracles: Map[String, String] = Map(
    "scalar_strings" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS u,
        |  lower(p_type) AS l,
        |  CAST(length(p_name) AS BIGINT) AS len,
        |  trim(p_name) AS trimmed,
        |  substring(p_name, 1, 5) AS prefix,
        |  replace(p_type, ' ', '_') AS snake,
        |  concat_ws('|', p_brand, p_type) AS joined,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
        |  reverse(p_brand) AS rev,
        |  CAST(strpos(p_type, 'ED') AS BIGINT) AS pos,
        |  string_split(p_name, ' ')[1] AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_math" ->
      """SELECT c_custkey,
        |  abs(c_acctbal) AS abs_bal,
        |  CAST(ceil(c_acctbal) AS DOUBLE) AS ceil_bal,
        |  CAST(floor(c_acctbal) AS DOUBLE) AS floor_bal,
        |  round(sqrt(abs(c_acctbal)), 6) AS sqrt_bal,
        |  round(ln(abs(c_acctbal) + 1), 6) AS ln_bal,
        |  round(pow(c_acctbal / 1000, 2), 6) AS pow_bal,
        |  CAST(sign(c_acctbal) AS DOUBLE) AS sign_bal,
        |  CAST(c_custkey % 7 AS BIGINT) AS mod7
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "scalar_datetime" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(o_orderdate AS DATE) + 7 AS plus7,
        |  epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS epoch_us
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_nulls" ->
      """SELECT event_id,
        |  COALESCE(nullif(event_type, 'error'), 'err') AS masked,
        |  CASE WHEN value > 100 THEN value END AS big_or_null,
        |  COALESCE(CASE WHEN value > 100 THEN value END, -1.0) AS big_or_default,
        |  value IS NULL AS is_null,
        |  value IS NOT DISTINCT FROM 9.64 AS null_safe_eq
        |FROM events ORDER BY event_id""".stripMargin)
}
