package graft

/** Observed markers for adaptive-strategy operators (the no-silent-caps
  * pattern applied to DECISIONS): every operator that picks between two
  * execution strategies at plan time (ngramJaccard exact-PPJoin vs
  * banded LSH, semDedup kmeans vs IVF blocking, componentsFrom driver
  * union-find vs distributed propagation, embeddingCosBlocked IVF vs
  * IMI) records WHICH side it chose and the threshold inputs that drove
  * the choice. Two sinks, each for a different reader:
  *
  *  - one `GRAFT-STRATEGY` line on stderr per decision — greppable in
  *    any bench/driver log with no logger-level coupling (the bench
  *    runs at WARN), so a scale run's log shows every choice the suite
  *    made;
  *  - a process-wide last-choice registry the specs pin, so a
  *    configuration that silently flips a strategy fails a test instead
  *    of changing plans unnoticed.
  *
  * Decisions are per-invocation plan-time constants (at most one line
  * per operator call), so the channel is O(queries), never O(rows).
  */
object StrategyLog {

  private val last =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Record `op`'s chosen strategy with its threshold inputs. */
  def record(op: String, choice: String, inputs: (String, Any)*): Unit = {
    val detail = inputs.map { case (k, v) => s"$k=$v" }.mkString(" ")
    last.put(op, if (detail.isEmpty) choice else s"$choice $detail")
    System.err.println(
      s"GRAFT-STRATEGY $op=$choice${if (detail.isEmpty) "" else s" $detail"}")
  }

  /** The most recent recorded choice (+ inputs) for `op`, if any. */
  def lastChoice(op: String): Option[String] = Option(last.get(op))
}
