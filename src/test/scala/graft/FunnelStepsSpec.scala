package graft

import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E8d conversion funnel: checked against an independent driver-side
  * walk of each user's event sequence (strictly-after semantics), plus
  * the monotonicity invariant.
  */
class FunnelStepsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("funnelSteps matches a driver-side per-user sequence walk") {
    val rows = Events.normalizeTs(
        Events.eventsSession(spark).read.parquet(s"$dir/events.parquet"))
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("sec"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    val byUser = rows.groupBy(_._1)
    def minSec(evts: Array[(Long, String, Long)], tpe: String, after: Long): Option[Long] = {
      val c = evts.collect { case (_, t, s) if t == tpe && s > after => s }
      if (c.isEmpty) None else Some(c.min)
    }
    var (nv, nc, np) = (0L, 0L, 0L)
    byUser.values.foreach { evts =>
      minSec(evts.toArray, "view", Long.MinValue).foreach { vs =>
        nv += 1
        minSec(evts.toArray, "click", vs).foreach { cs =>
          nc += 1
          minSec(evts.toArray, "purchase", cs).foreach { _ => np += 1 }
        }
      }
    }

    val got = Events.funnelSteps(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("1_view" -> nv, "2_click" -> nc, "3_purchase" -> np))
    assert(nv >= nc && nc >= np, "funnel must be monotone")
    assert(np > 0, "fixture should convert some users end to end")
  }
}
