package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestSpark}

/** Pins the data contract the exact-integer-cent aggregates rely on.
  *
  * Five corpus queries (q1_agg, q_unpivot, q_pareto_share,
  * etl_union_conform, e_forward_fill) accumulate money/measure columns as
  * BIGINT cents and round means with the half-up identity
  * round(p/q) = (2p+q) div (2q). That identity assumes, silently, that
  *   (a) every summed value is exactly 2-dp (so cents is an integer, not a
  *       rounded approximation of a longer fraction),
  *   (b) values are NON-NEGATIVE (both Spark's `div` and DuckDB's `//`
  *       truncate toward zero, so the +q half-up nudge points the wrong
  *       way for negative p), and
  *   (c) values are NON-NULL (the rewrites divide by count(*) — a null
  *       would silently change semantics vs a null-skipping avg()).
  * The current generator satisfies all three; this spec makes a future
  * corpus change fail LOUDLY here instead of drifting the aggregates.
  *
  * Checked at two SFs so a generator change to either the base or the
  * scaled-up corpus trips it.
  */
class CentContractSpec extends SparkSpec {

  private val dirs = Seq(TestSpark.sf0001, TestSpark.sf001)

  /** Asserts non-null, >= 0, and exactly-2-dp for `column` of `table`. */
  private def assertCents(table: String, column: String): Unit =
    for (d <- dirs) {
      val r = Tables.t(spark, d, table)
        .agg(count(lit(1)).as("n"),
          count(col(column)).as("n_nonnull"),
          min(col(column)).as("mn"),
          // 2-dp iff the value round-trips through its cent integer: v is
          // the nearest double to cents/100 (v*100 itself is NOT integral
          // in binary floating point — 123.45*100 = 12344.999…)
          sum(when(col(column) =!= round(col(column) * 100) / 100.0, 1L)
            .otherwise(0L)).as("n_frac"))
        .collect().head
      assert(r.getLong(0) > 0,
        s"$table at $d is empty — every contract check would be vacuous")
      assert(r.getLong(0) === r.getLong(1),
        s"$table.$column has NULLs at $d — the cent rewrites divide by " +
          "count(*), which is only avg()-equivalent when no value is null")
      // min is null only on an all-null column (caught above); read it
      // type-tolerantly so a generator type change fails the >= 0
      // assertion with its message, not a ClassCastException/NPE
      assert(!r.isNullAt(2), s"$table.$column min is null at $d")
      assert(r.getAs[Number]("mn").doubleValue >= 0.0,
        s"$table.$column has negative values at $d — the (2p+q) div (2q) " +
          "half-up identity truncates toward zero and mis-rounds negatives")
      assert(r.getLong(3) === 0L,
        s"$table.$column has >2-dp values at $d — integer-cent sums would " +
          "silently round per row instead of accumulating exactly")
    }

  test("lineitem quantity/price/discount honor the 2-dp cent contract (q1_agg)") {
    assertCents("lineitem", "l_quantity")
    assertCents("lineitem", "l_extendedprice")
    assertCents("lineitem", "l_discount")
  }

  test("orders.o_totalprice honors the contract (q_unpivot, q_pareto_share, etl_union_conform)") {
    assertCents("orders", "o_totalprice")
  }

  test("events.value honors the contract (e_forward_fill)") {
    assertCents("events", "value")
  }
}
