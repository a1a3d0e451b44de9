package graft.adapter

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.core.ModelKind

/** Seeded randomized property test for SCD2-by-time: a random sequence of
  * full source snapshots (updates, no-ops, hard deletes, re-inserts) applied
  * through [[SparkMaterializer.scdType2ByTime]] must — after EVERY round —
  * satisfy the type-2 invariants and agree with a driver-side reference fold
  * of the same event sequence.
  *
  * Invariants checked each round:
  *  1. at most one OPEN row (valid_to IS NULL) per key;
  *  2. a key's version ranges never overlap (ordered by valid_from,
  *     prev.valid_to <= next.valid_from);
  *  3. the open rows equal the reference fold's live state (value and key
  *     set) — late/stale updated_at values must not create versions;
  *  4. history only grows — closed rows are immutable.
  */
class Scd2PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  lazy val m = new SparkMaterializer(spark)

  private def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("random update/delete/re-insert sequences hold the type-2 invariants") {
    val rnd = new scala.util.Random(42)
    val kind = ModelKind.ScdType2ByTime(uniqueKey = Seq("id"))
    val t = PhysicalTable("graft__test", "scd_prop", SparkTestSession.tmpDir("scd_prop"))
    val keys = 1 to 8

    // driver-side reference fold: key -> (value, updatedAtDay)
    var live = Map.empty[Int, (String, Int)]
    var closedBefore = Set.empty[(Int, String, java.sql.Timestamp)]

    for (round <- 1 to 6) {
      val day = round * 4 // execution day for this round
      // random full snapshot: each key present with ~75% probability;
      // present keys update with a random (possibly stale) updated_at
      val src = keys.flatMap { k =>
        if (rnd.nextDouble() < 0.75) {
          val updDay = math.max(1, day - rnd.nextInt(6)) // may be stale
          Some((k, s"v${round}_$k", ts(updDay), updDay))
        } else None
      }
      val srcDf = src.map { case (k, v, u, _) => (k, v, u) }.toDF("id", "v", "updated_at")
      m.scdType2ByTime(t, srcDf, kind, ts(day))

      // evolve the reference fold with the SAME semantics the reference
      // engine documents: newer updated_at ⇒ new version; absent ⇒ delete
      val present = src.map(s => s._1 -> ((s._2, s._4))).toMap
      live = live.flatMap { case (k, (v, u)) =>
        present.get(k) match {
          case Some((nv, nu)) if nu > u => Some(k -> (nv, nu)) // updated
          case Some(_)                  => Some(k -> (v, u))   // stale/no-op
          case None                     => None                // hard delete
        }
      } ++ present.collect { case (k, (nv, nu)) if !live.contains(k) => k -> (nv, nu) }

      val rows = m.read(t).select("id", "v", "valid_from", "valid_to").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2), r.getTimestamp(3)))

      // 1. one open row per key
      val open = rows.filter(_._4 == null)
      assert(open.groupBy(_._1).forall(_._2.length == 1),
        s"round $round: multiple open rows for a key\n${open.mkString("\n")}")

      // 2. no overlapping version ranges per key
      rows.groupBy(_._1).foreach { case (k, vs) =>
        val sorted = vs.sortBy(_._3.getTime)
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._4 != null && a._4.getTime <= b._3.getTime,
              s"round $round key $k: overlapping versions $a / $b")
          case _ => ()
        }
      }

      // 3. open state == reference fold (same key set, same current value)
      val openMap = open.map(r => r._1 -> r._2).toMap
      assert(openMap == live.map { case (k, (v, _)) => k -> v },
        s"round $round: open rows diverge from reference fold" +
          s"\n got: $openMap\n want: ${live.map { case (k, (v, _)) => k -> v }}")

      // 4. closed history is immutable (previously-closed rows persist)
      val closedNow = rows.filter(_._4 != null).map(r => (r._1, r._2, r._3)).toSet
      assert(closedBefore.subsetOf(closedNow),
        s"round $round: closed rows vanished: ${closedBefore -- closedNow}")
      closedBefore = closedNow
    }
  }
}
