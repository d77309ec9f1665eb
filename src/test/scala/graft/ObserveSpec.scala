package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** The flagship's observe() metrics: QC counters (slice rows, HR patches,
  * dark drops) must arrive with the MAIN aggregation pass — no second job —
  * and agree exactly with the query result. This is the zero-extra-scan
  * monitoring contract a 100 TB run relies on.
  */
class ObserveSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("flagship observed metrics equal the aggregated result") {
    @volatile var observed: Option[org.apache.spark.sql.Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("flagship_qc").foreach(r => observed = Some(r))
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val result = SparkEntry.entry(spark).collect()
      // listener delivery is async on the listener bus — poll briefly
      val deadline = System.nanoTime() + 30e9.toLong
      while (observed.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val m = observed.getOrElse(fail("observed metrics never arrived"))
      val wantSlices = result.map(_.getAs[Long]("n_slices")).sum
      val wantHr = result.map(_.getAs[Long]("n_hr_patches")).sum
      val wantDark = result.map(_.getAs[Long]("n_dark_discarded")).sum
      assert(m.getAs[Long]("n_slice_rows") == wantSlices)
      assert(m.getAs[Long]("n_hr_total") == wantHr)
      assert(m.getAs[Long]("n_dark_total") == wantDark)
      assert(wantSlices > 0, "flagship produced no slices — vacuous")
    } finally spark.listenerManager.unregister(listener)
  }
}
