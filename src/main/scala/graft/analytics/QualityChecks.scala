package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Declarative data-quality constraint report over the star schema — the
  * Deequ/dbt-tests shape: each rule evaluates to (violations, pass) and
  * the report is the union of all rules, so a pipeline gates promotion on
  * `WHERE NOT pass`. Every rule is a single aggregation or a keyed
  * anti-join — no rule ever costs more than one pass over its table, and
  * the FK checks broadcast the dimension side.
  */
object QualityChecks {

  def constraintReport(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val events = Tables.events(spark, dir)

    def row(table: String, check: String, violations: DataFrame): DataFrame =
      violations.select(
        lit(table).as("table_name"), lit(check).as("check_name"),
        col("v").as("violations"), (col("v") === 0).as("pass"))

    val notNullKey = row("orders", "o_orderkey_not_null",
      orders.agg(count(when(col("o_orderkey").isNull, 1)).as("v")))
    val uniqueKey = row("orders", "o_orderkey_unique",
      orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
        .agg(count(when(col("c") > 1, 1)).as("v")))
    val fkCust = row("orders", "o_custkey_fk_customer",
      orders.join(broadcast(customer.select(col("c_custkey"))),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("v")))
    val fkLine = row("lineitem", "l_orderkey_fk_orders",
      lineitem.join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("v")))
    val qtyRange = row("lineitem", "l_quantity_in_1_50",
      lineitem.agg(count(when(
        col("l_quantity") < 1 || col("l_quantity") > 50, 1)).as("v")))
    val priceNonNeg = row("orders", "o_totalprice_positive",
      orders.agg(count(when(col("o_totalprice") <= 0, 1)).as("v")))
    val evTypes = row("events", "event_type_in_domain",
      events.agg(count(when(!col("event_type").isin(
        "click", "error", "purchase", "signup", "view"), 1)).as("v")))
    val evIdUnique = row("events", "event_id_unique",
      events.groupBy(col("event_id")).agg(count(lit(1)).as("c"))
        .agg(count(when(col("c") > 1, 1)).as("v")))

    Seq(notNullKey, uniqueKey, fkCust, fkLine, qtyRange, priceNonNeg,
      evTypes, evIdUnique)
      .reduce(_.unionByName(_))
      .orderBy(col("table_name").asc, col("check_name").asc)
  }
}
