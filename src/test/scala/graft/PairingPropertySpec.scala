package graft

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.streaming.{EventPairing, PairEvent, PairState}

/** Property-based invariants (SURVEY.md §5.4) for the pairing function —
  * scalacheck generators sampled over fixed seeds, driven directly via
  * TestGroupState (no cluster) so hundreds of cases run fast. */
class PairingPropertySpec extends SparkSpec {

  private val genEvents: Gen[List[PairEvent]] = for {
    n <- Gen.choose(0, 40)
    evs <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 5L)
      typ <- Gen.oneOf("signup", "purchase", "click")
      ts <- Gen.choose(0L, 100000L)
    } yield PairEvent(user, typ, ts))
  } yield evs

  private def cases: Seq[List[PairEvent]] =
    (1 to 300).map(i => genEvents.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def runAll(events: List[PairEvent]): List[graft.streaming.PairResult] =
    events.groupBy(_.user_id).toList.flatMap { case (user, evs) =>
      val s = TestGroupState.create[PairState](Optional.empty(),
        GroupStateTimeout.NoTimeout, 0L, Optional.empty(), false)
      EventPairing.pairFn(EventPairing.MinWins, None)(user, evs.iterator, s).toList
    }

  test("#pairs per key ≤ min(#placed, #fulfilled); emits iff both halves present") {
    cases.foreach { events =>
      val out = runAll(events)
      events.groupBy(_.user_id).foreach { case (user, evs) =>
        val placed = evs.count(_.event_type == "signup")
        val fulfilled = evs.count(_.event_type == "purchase")
        val pairs = out.count(_.user_id == user)
        assert(pairs <= math.min(placed, fulfilled).min(1))
        assert((pairs == 1) == (placed > 0 && fulfilled > 0))
      }
    }
  }

  test("single-batch MinWins equals the batch-analog min aggregation") {
    cases.foreach { events =>
      val out = runAll(events).map(r => r.user_id -> r).toMap
      events.groupBy(_.user_id).foreach { case (user, evs) =>
        val p = evs.filter(_.event_type == "signup").map(_.ts_ms).minOption
        val f = evs.filter(_.event_type == "purchase").map(_.ts_ms).minOption
        (p, f) match {
          case (Some(pm), Some(fm)) =>
            val r = out(user)
            assert(r.placed_ms == pm && r.fulfilled_ms == fm &&
              r.processing_ms == fm - pm)
          case _ => assert(!out.contains(user))
        }
      }
    }
  }

  test("order-insensitivity: any permutation of one batch yields the same pair") {
    cases.foreach { events =>
      assert(runAll(events).toSet == runAll(events.reverse).toSet)
    }
  }
}
