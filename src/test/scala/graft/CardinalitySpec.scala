package graft

import org.apache.spark.sql.functions._

import graft.ops.Cardinality
import graft.sync.SlicePlanner

/** A6 parity: Catalyst-stats estimates feed slice planning the way the
  * reference's EXPLAIN-regex rowcount did (session.py:219-240). */
class CardinalitySpec extends SparkSpec {

  test("size estimate is always available and positive for a parquet scan") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    assert(Cardinality.estimateBytes(li) > 0)
  }

  test("estimates feed numSlices like the reference's EXPLAIN estimate") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val rows = Cardinality.estimateRows(li)
      .map(_.toLong)
      .getOrElse {
        // fall back the way the engine would: bytes / conservative row width
        (Cardinality.estimateBytes(li) / 100).toLong.max(1L)
      }
    val slices = SlicePlanner.numSlices(rows, targetRowsPerSlice = 1000L)
    assert(slices >= 1)
    // sf0.001 lineitem is ~6K rows; a 1K-row target must yield several slices
    assert(slices > 1, s"estimated rows=$rows gave $slices slice(s)")
  }

  test("filters shrink the size estimate") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val filtered = li.filter(col("l_quantity") < 2).select("l_orderkey")
    assert(Cardinality.estimateBytes(filtered) < Cardinality.estimateBytes(li))
  }
}
