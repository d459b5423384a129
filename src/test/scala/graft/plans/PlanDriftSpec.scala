package graft.plans

import graft.SparkSpec

/** Registry-wide plan-drift lint against the committed docs/PLANS.json
  * (round-8 item: wall time is a contention-noisy channel on this box;
  * the plan shape is the clean one — a silent broadcast→SMJ, a new
  * Exchange, or a dropped scan on ANY entry fails HERE, at planning
  * time, with a readable operator-level diff).
  *
  * Intentional plan changes re-snapshot in the same commit:
  *
  *   GRAFT_REGEN_PLANLOCK=1 sbt "testOnly graft.plans.PlanDriftSpec"
  *
  * Regeneration runs in THIS suite so the lock is always produced by
  * the exact session shape it is checked under.
  */
class PlanDriftSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val lockPath = java.nio.file.Paths.get("docs/PLANS.json")

  test("every registry entry's plan fingerprint matches docs/PLANS.json") {
    val live: Seq[(String, Map[String, Int])] = graft.Registry.all.map { q =>
      spark.sharedState.cacheManager.clearCache()
      q.name -> PlanFingerprint.of(q.fn(spark, dir))
    }
    if (sys.env.get("GRAFT_REGEN_PLANLOCK").contains("1")) {
      java.nio.file.Files.writeString(lockPath, PlanFingerprint.render(live))
      info(s"regenerated $lockPath with ${live.size} fingerprints")
    } else {
      assert(java.nio.file.Files.exists(lockPath),
        s"$lockPath missing — run with GRAFT_REGEN_PLANLOCK=1 to create it")
      val locked = PlanFingerprint.parse(
        java.nio.file.Files.readString(lockPath))
      val liveMap = live.toMap
      val drifted = live.flatMap { case (name, fp) =>
        locked.get(name) match {
          case None => Some(s"$name: NEW entry not in lock (regen the lock)")
          case Some(l) if !PlanFingerprint.matches(l, fp) =>
            val gained = (fp.toSet -- l.toSet).toSeq.sorted
            val lost = (l.toSet -- fp.toSet).toSeq.sorted
            Some(s"$name: +${gained.mkString(",")} -${lost.mkString(",")}")
          case _ => None
        }
      }
      val removed = (locked.keySet -- liveMap.keySet).toSeq.sorted
        .map(n => s"$n: entry removed but still locked (regen the lock)")
      assert(drifted.isEmpty && removed.isEmpty,
        "plan drift (GRAFT_REGEN_PLANLOCK=1 re-snapshots intentional " +
          s"changes):\n  ${(drifted ++ removed).mkString("\n  ")}")
    }
  }
}
