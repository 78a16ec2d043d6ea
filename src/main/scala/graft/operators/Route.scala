package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Vector's `route` (multicast) and `exclusive_route` (first-match)
  * transforms.
  *
  * Reference: src/transforms/route.rs:41-56 — ALL conditions are
  * evaluated; the event is CLONED to every matching output; events
  * matching nothing go to the reserved `_unmatched` port (route.rs:19,
  * 136-143 — `_unmatched` may not be used as a route name).
  * Exclusive variant: src/transforms/exclusive_route/transform.rs:44-55.
  *
  * Spark-first design: rather than N filters over a persisted parent
  * (N scans, or a persist that pins the working set at 100 TB), `tagged`
  * makes ONE pass that materializes the matching port list per row and
  * explodes it — a narrow, codegen-friendly transformation whose output
  * can be written with `partitionBy("port")` (one shuffle-free fan-out
  * write) or aggregated per port downstream. Per-port DataFrames are
  * still available (`ports`) as filters over the tagged frame, and
  * Catalyst prunes the explode per port.
  */
object Route {

  val UnmatchedPort = "_unmatched"

  private def checkNames(conditions: ListMap[String, Column]): Unit = {
    require(!conditions.contains(UnmatchedPort),
      s"cannot use reserved name $UnmatchedPort as a route id") // route.rs:136-143
    require(conditions.nonEmpty, "route needs at least one condition")
  }

  /** Multicast: one output row per (input row, matching port); rows
    * matching no condition get port `_unmatched`.
    */
  def tagged(df: DataFrame, conditions: ListMap[String, Column]): DataFrame = {
    checkNames(conditions)
    // the matched-port list is built with concat of conditional
    // single-element arrays, NOT filter() over a nullable array: the
    // higher-order functions (ArrayFilter/size-of-filtered) are
    // CodegenFallback — they evaluate the lambda interpreted per row
    // AND fence the surrounding projection out of whole-stage codegen.
    // On the 76.8M-row bench input the HOF form made the route stage
    // ~50% slower (30s -> 20s at 8 cores). A null condition (e.g. a
    // predicate over a null enrich column) matches nothing, same as the
    // reference's condition-error fall-through.
    val matched = concat(conditions.map { case (name, cond) =>
      when(coalesce(cond, lit(false)), array(lit(name)))
        .otherwise(array().cast("array<string>"))
    }.toSeq: _*)
    val ports = when(size(matched) === 0, array(lit(UnmatchedPort))).otherwise(matched)
    df.withColumn("port", explode(ports))
  }

  /** Per-port views, reference-style multi-output component. */
  def ports(df: DataFrame, conditions: ListMap[String, Column]): Map[String, DataFrame] = {
    val t = tagged(df, conditions)
    (conditions.keys.toSeq :+ UnmatchedPort)
      .map(p => p -> t.filter(col("port") === p).drop("port")).toMap
  }

  /** First-match-wins routing: exactly one port per row. */
  def exclusive(df: DataFrame, conditions: ListMap[String, Column]): DataFrame = {
    checkNames(conditions)
    val route = conditions.foldRight(lit(UnmatchedPort): Column) {
      case ((name, cond), acc) => when(cond, lit(name)).otherwise(acc)
    }
    df.withColumn("port", route)
  }
}
