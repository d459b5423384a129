package graft

/** The committed quiet-box steady-state snapshot (docs/BUDGET.json,
  * refreshed by tools/budget.sh from a full sf0.1 `tools/bench.sh`
  * run) — ONE parser shared by [[Bench]]'s sustained-contention
  * anchor and BudgetLintSpec's wall-time lint, so the two consumers
  * can never drift on the file's shape. Minimal no-lib parse of the
  * one-line bench JSON: "name":seconds pairs inside the "queries"
  * object (the build carries no JSON library).
  */
object BudgetSnapshot {

  /** The scale factor the snapshot's numbers were measured at; a
    * consumer comparing live timings against the snapshot must only
    * do so at this SF (anything larger legitimately exceeds every
    * committed value).
    */
  val SnapshotSfDir = "sf0.1"

  def perQuery(path: String = "docs/BUDGET.json"): Map[String, Double] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) Map.empty
    else "\"queries\":\\{([^}]*)\\}".r
      .findFirstMatchIn(java.nio.file.Files.readString(p)).map(_.group(1))
      .map(_.split(",").flatMap { kv =>
        kv.split(":") match {
          case Array(k, v) =>
            try Some(k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble)
            catch { case _: NumberFormatException => None }
          case _ => None
        }
      }.toMap).getOrElse(Map.empty)
  }
}
