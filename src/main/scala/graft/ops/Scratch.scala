package graft.ops

/** Per-PROCESS scratch directories for queries that exercise a
  * write→read-back cycle (format roundtrips, the persisted IVF index).
  *
  * The r10 scheme keyed scratch by `dir.hashCode` alone, so two
  * concurrent JVMs over the same data dir (a Bench racing a Verify)
  * overwrote each other's trees mid-read, distinct dirs could
  * hash-collide, and nothing was ever cleaned up. Paths here embed the
  * PID (process-unique — concurrent runs get disjoint trees) and the
  * whole root is recursively deleted by a JVM shutdown hook, so scratch
  * never outlives the run.
  */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_scratch_${ProcessHandle.current().pid()}")
    java.nio.file.Files.createDirectories(p)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(p.toFile)))
    p
  }

  private def deleteRec(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRec)
    f.delete()
    ()
  }

  /** Per-sweep namespace salt (r12 advice): PlanSpec's pre-checkpoint
    * window sweep re-runs every query inside Ckpt.recording, and a
    * [[once]]-memoized artifact build (an index fit) that some earlier
    * test already ran would be SKIPPED there — sweep coverage of the
    * build-phase plans would depend on test order. [[withNamespace]]
    * reroutes every dir()/once() key under a fresh salt for the
    * duration, so artifact builds always execute inside the recording.
    * Single-threaded use (the sweeps are sequential).
    */
  @volatile private var salt: String = ""

  def withNamespace[T](ns: String)(body: => T): T = {
    val prev = salt
    salt = ns
    try body finally salt = prev
  }

  /** Absolute scratch path for `tag`, unique to this process (and to
    * the active [[withNamespace]] salt, if any).
    */
  def dir(tag: String): String =
    (if (salt.isEmpty) root.resolve(tag)
     else root.resolve(salt).resolve(tag)).toString

  /** Run `body` at most ONCE per (process, tag) — the artifact-build
    * memo for queries that construct a deterministic on-disk artifact
    * under a [[dir]] and then read it back: within one JVM the artifact
    * is a pure function of the input dir, so sweeps/tests re-invoking
    * the query re-probe the EXISTING tree instead of re-fitting and
    * re-writing it (measured ~3-5 s per index rebuild, times three
    * PlanSpec sweeps).
    *
    * REENTRANCY (r16-opt): bodies may call [[once]] for a DIFFERENT tag
    * (a mutation gate clones a shared base artifact, whose own build is
    * once-guarded). Running bodies inside `computeIfAbsent` breaks
    * then — a nested insert on the same ConcurrentHashMap throws
    * "Recursive update" whenever the two tags collide on a bin, i.e.
    * intermittently by hash. So the map only ever allocates per-tag
    * LOCK objects (computeIfAbsent completes before any body runs) and
    * the body executes under the tag's monitor with a done-set check.
    * Nested tags take nested monitors; the artifact dependency graph is
    * a DAG (mutation root -> base root, never cyclic), so no deadlock.
    * Concurrent first callers of one tag still serialize; later callers
    * hit the done-set fast path.
    */
  private val onceLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private val onceDone =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def once(tag: String)(body: => Unit): Unit =
    if (!onceDone.contains(tag)) {
      val lock = onceLocks.computeIfAbsent(tag, _ => new Object)
      lock.synchronized {
        if (!onceDone.contains(tag)) { body; onceDone.add(tag): Unit }
      }
    }
}
