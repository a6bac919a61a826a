package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence gate for e2's gap sessionization: random
  * event streams (with deliberate same-second ties, resolved by
  * event_id) written as synthetic `events.parquet`; the UNMODIFIED e2
  * gate query must equal a direct simulation of the contract — 30-min
  * inactivity closes a session, per-user rollup with HALF_UP round-4
  * averages. */
class SessionizeKernelPropertySpec extends AnyFunSuite {

  private lazy val spark = Spark.session(master = "local[4]",
    shufflePartitions = 4, appName = "graft-sess-prop")

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("e2 sessionization equals a direct gap-walk simulation") {
    import spark.implicits._
    for (seed <- Seq(91L, 92L, 93L)) {
      val rnd = new scala.util.Random(seed)
      val base = 1700000000L
      var eid = 0L
      val rows = (0 until 40).flatMap { u =>
        var t = base + rnd.nextInt(100000)
        (0 until 5 + rnd.nextInt(55)).map { _ =>
          // gaps: mostly short (inside a session), sometimes > 30 min,
          // sometimes ZERO (same-second tie — event_id breaks it)
          t += (rnd.nextInt(4) match {
            case 0 => 0
            case 1 => rnd.nextInt(1700)
            case _ => if (rnd.nextInt(5) == 0) 1801 + rnd.nextInt(5000)
                      else rnd.nextInt(1800)
          })
          eid += 1
          (u.toLong, eid, new Timestamp(t * 1000L))
        }
      }
      val dir = java.nio.file.Files.createTempDirectory("sess-prop").toString
      rows.toDF("user_id", "event_id", "ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("e2_sessionize")(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
        .toSeq
      val want = rows.groupBy(_._1).toSeq.map { case (u, es) =>
        val ordered = es.map(e => (e._3.getTime / 1000, e._2)).sorted
        val sessions = scala.collection.mutable.Buffer[Seq[Long]]()
        var cur = scala.collection.mutable.Buffer[Long]()
        var prev = Long.MinValue
        ordered.foreach { case (sec, _) =>
          if (cur.nonEmpty && sec - prev > 1800) {
            sessions += cur.toSeq; cur = scala.collection.mutable.Buffer[Long]()
          }
          cur += sec; prev = sec
        }
        sessions += cur.toSeq
        val nS = sessions.size.toLong
        val tot = ordered.size.toLong
        val avgN = r4(tot.toDouble / nS)
        val avgD = r4(sessions.map(s => s.max - s.min).sum.toDouble / nS)
        (u, nS, tot, avgN, avgD)
      }.sortBy(_._1)
      assert(got == want, s"seed=$seed:\n got=${got.take(3)}\n want=${want.take(3)}")
      assert(want.exists(_._2 > 1), s"seed=$seed no multi-session users")
    }
  }
}
