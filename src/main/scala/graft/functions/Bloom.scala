package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge

/** Bloom-filter sketch surface over Spark's internal
  * BloomFilterAggregate / BloomFilterMightContain (the expressions
  * behind runtime-filter injection, not registered as public SQL
  * functions). A bloom built over a key set costs KILOBYTES and
  * ships to every task as a scalar subquery result, so membership
  * prefilters scale past the point where an exact broadcast set
  * would blow the broadcast limit — false positives only, never
  * false negatives, so an exact verify on the survivors restores
  * exactness.
  */
object Bloom {

  /** Aggregate a LONG column (xxhash64 your values first) into a
    * bloom-filter binary. `items`/`bits` size the sketch: ~8 bits
    * per item ≈ 2% FP. */
  def bloomAgg(hashed: Column, items: Long, bits: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(hashed), Literal(items), Literal(bits))
      .toAggregateExpression())

  /** Membership probe against a 1-row bloom frame (one binary
    * column), attached as a scalar subquery — the form
    * might_contain requires.
    *
    * CONTRACT — the returned Column is SINGLE-USE PER QUERY: it
    * embeds `bloomFrame`'s analyzed plan (with its original exprIds)
    * verbatim inside a ScalarSubquery. Using one returned Column in
    * two places of the same query, calling this twice with the same
    * bloomFrame into one query, or self-joining the probed frame
    * against the bloom's SOURCE frame can surface duplicate-exprId
    * analysis failures (the analyzer's relation dedup does not
    * rewrite through this hand-built subquery). For multiple probes
    * in one query, call bloomAgg again to derive an independent
    * bloomFrame per probe — the sketch build is a kilobyte-scale
    * aggregate, so the extra build is noise. Current call sites
    * (q160 + BloomSpec) are all single-use and spec-covered. */
  def mightContain(bloomFrame: DataFrame, hashed: Column): Column =
    Bridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomFrame
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.analyzed),
      Bridge.expression(hashed)))
}
