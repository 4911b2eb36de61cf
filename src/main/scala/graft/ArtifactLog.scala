package graft

/** In-process ledger of stored-artifact BUILDS (r13 verdict #2): the
  * shared artifacts (the dup-edge relation, the q225 corpus
  * window-hash table) charge their one-time build to whichever query
  * runs first, which makes partial-run numbers misleading — an
  * isolated `SPARK_GRAFT_ONLY=q226` run paid 8.5 s that the full pass
  * charges to q148. Builders call [[record]] with the wall-clock cost;
  * [[Bench]] drains after every query and emits a separate
  * `{"artifact":…,"build_sec":…,"during":…}` profile row, so the
  * build cost is visible as its own line instead of silently inflating
  * the consumer's. [[BuildArtifacts]] is the explicit pre-step that
  * moves the cost out of query rows entirely.
  */
object ArtifactLog {
  final case class Build(name: String, sec: Double)

  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[Build]()

  /** Record one artifact build (called from the builder itself). */
  def record(name: String, sec: Double): Unit = { buf.add(Build(name, sec)); () }

  /** Remove and return every build recorded since the last drain. */
  def drain(): Seq[Build] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Build]
    var b = buf.poll()
    while (b != null) { out += b; b = buf.poll() }
    out.toSeq
  }
}
