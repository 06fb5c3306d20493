package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Cache lifecycle for query functions that persist intermediates.
  *
  * Two shapes exist in the engine:
  *
  *  1. the persisted frame is fully consumed INSIDE the function
  *     (model training collects, census counts) — use [[withPersisted]],
  *     a plain try/finally scope;
  *  2. the persisted frame is part of the RETURNED DataFrame's lineage
  *     (self-joins over a computed frame) — nothing has materialized
  *     when the function returns, so an in-function unpersist would
  *     defeat the cache. Use [[owned]]: a session-installed
  *     QueryExecutionListener unpersists the dependencies as soon as
  *     ANY action that consumes the owning plan completes.
  *
  * Without this, a long-lived SqlGateway/SyncServer session accumulates
  * storage memory query after query (57 persist sites vs 13 unpersists
  * as of round 8); the bench/verify harnesses only stayed flat because
  * they call `spark.catalog.clearCache()` between queries. As of round
  * 9 every query-path persist is scoped or owned — QueriesSmokeSpec
  * asserts the SQL cache registry is empty after each SparkEntry query
  * materializes, and CacheScopeSpec pins the mechanism.
  */
object CacheScope {

  /** Persist `df`, evaluate `body`, and ALWAYS unpersist — for
    * intermediates consumed entirely inside the function. */
  def withPersisted[T](df: Dataset[_],
      level: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)(body: => T): T = {
    df.persist(level)
    try body finally df.unpersist(blocking = false)
  }

  // Both plan objects identify the owner: a `collect`/`show` acts on
  // the result Dataset's own QueryExecution (whose .logical IS the
  // un-analyzed plan we built), while `count`/`write`/any further
  // transformation builds a NEW plan over the Dataset's ANALYZED
  // plan object — matching only one of the two misses half the
  // action surface.
  // Owners are held WEAKLY: the owner plans are reachable only
  // through the result Dataset the caller received (deps reference
  // nothing upward), so once the caller drops that Dataset no action
  // can ever consume it — the cleared references make the entry
  // collectable and its deps releasable. A still-held result keeps
  // its plans strongly reachable, so a live entry can never be
  // swept out from under the caller.
  private final case class Entry(
      owners: Seq[java.lang.ref.WeakReference[LogicalPlan]],
      deps: Seq[Dataset[_]]) {
    def abandoned: Boolean = owners.forall(_.get() == null)
  }

  /** Registry cap per session: a prepare-but-never-run gateway path
    * registering unboundedly many owned results would pin caches even
    * with live references; past this many pending entries the OLDEST
    * is force-released (recompute cost on a path that by definition
    * has not run anything, never a correctness issue). */
  private[graft] val MaxPending = 64

  // Keyed by session so concurrent sessions (tests) don't see each
  // other's entries. Entries are few (one per in-flight query).
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.util.List[Entry]]()

  /** Tie persisted `deps` to a `result` frame: when an action whose plan
    * contains `result`'s logical plan (by reference — the caller acts on
    * the very Dataset we returned, or a transformation of it) completes,
    * the deps are unpersisted and dropped from the registry. Returns
    * `result` unchanged, so call sites read as `CacheScope.owned(out, tmp)`.
    *
    * Abandoned results cannot pin caches indefinitely: owner plans
    * are tracked through WeakReferences, so an entry whose result
    * Dataset was dropped without materializing is swept (deps
    * unpersisted) on the next registration or query completion, and
    * a per-session [[MaxPending]] cap force-releases the oldest
    * entry if a prepare-only path registers unboundedly.
    * [[releaseAll]] remains the immediate escape hatch.
    */
  def owned[T](result: Dataset[T], deps: Dataset[_]*): Dataset[T] = {
    val spark = result.sparkSession
    ensureListener(spark)
    val qe = result.queryExecution
    val entries = registry
      .computeIfAbsent(spark, _ =>
        java.util.Collections.synchronizedList(new java.util.ArrayList[Entry]()))
    val evicted = new java.util.ArrayList[Entry]()
    entries.synchronized {
      sweepAbandoned(entries, evicted)
      entries.add(Entry(
        Seq(new java.lang.ref.WeakReference(qe.logical),
          new java.lang.ref.WeakReference(qe.analyzed)), deps))
      while (entries.size() > MaxPending) evicted.add(entries.remove(0))
    }
    evicted.forEach(_.deps.foreach(_.unpersist(blocking = false)))
    result
  }

  // Drop entries whose owner plans have ALL been collected — the
  // caller discarded the result without materializing it, so nothing
  // can ever consume the owner. Must run under `entries.synchronized`;
  // unpersists are collected by the caller and run outside the lock.
  private def sweepAbandoned(entries: java.util.List[Entry],
      out: java.util.List[Entry]): Unit = {
    val it = entries.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.abandoned) { out.add(e); it.remove() }
    }
  }

  /** Unpersist every registered dependency for `spark` immediately —
    * the explicit escape hatch for abandoned results. */
  def releaseAll(spark: SparkSession): Unit = {
    val entries = registry.remove(spark)
    if (entries != null) entries.forEach(_.deps.foreach(_.unpersist(blocking = false)))
  }

  /** Registered-but-unreleased entry count (spec observability). */
  private[graft] def pendingCount(spark: SparkSession): Int = {
    val entries = registry.get(spark)
    if (entries == null) 0 else entries.size()
  }

  /** True when the session's SQL cache registry holds nothing — the
    * post-query invariant every SparkEntry query must restore (spec
    * observability; Dataset.persist/unpersist update this registry
    * synchronously, unlike executor block release). localCheckpoint
    * RDDs live outside the SQL cache and are reclaimed by the
    * ContextCleaner once unreferenced, so they are deliberately not
    * part of this check. */
  def sqlCacheEmpty(spark: SparkSession): Boolean =
    SparkInternals.sqlCacheEmpty(spark)

  private val installed =
    java.util.Collections.synchronizedSet(new java.util.HashSet[SparkSession]())

  private def ensureListener(spark: SparkSession): Unit =
    if (installed.add(spark)) spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        release(spark, qe)
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit =
        release(spark, qe)
    })

  // An action "consumes" an owner when the owner's plan is a subtree
  // of the action's logical plan. Identity (`eq`) is the fast path:
  // DataFrameWriter wraps df.logicalPlan by reference, and
  // count/collect/show build over the same object. It is NOT
  // sufficient: when a composition joins two frames built from the
  // same source (qualityGateOf's q ⋈ r, classifierFrame), the
  // analyzer's DeduplicateRelations REWRITES one side's subtree with
  // fresh expression ids — new node objects — so the fallback is the
  // same semantic comparison CacheManager itself uses for cache
  // lookup (`sameResult`, i.e. canonicalized equality, which
  // normalizes expression ids away). A semantic false match against
  // a genuinely identical plan elsewhere merely unpersists a cache
  // early — recompute cost, never a correctness issue.
  private def release(spark: SparkSession, qe: QueryExecution): Unit = {
    val entries = registry.get(spark)
    if (entries == null || entries.isEmpty) return
    val acted =
      try qe.logical
      catch { case _: Throwable => return }
    val matched = new java.util.ArrayList[Entry]()
    entries.synchronized {
      sweepAbandoned(entries, matched)
      val it = entries.iterator()
      while (it.hasNext) {
        val e = it.next()
        val owners = e.owners.flatMap(r => Option(r.get()))
        val hit = acted.exists(p => owners.exists(_ eq p)) ||
          (try owners.exists(o => acted.exists(o.sameResult(_)))
           catch { case _: Throwable => false })
        if (hit) { matched.add(e); it.remove() }
      }
    }
    matched.forEach(_.deps.foreach(_.unpersist(blocking = false)))
  }
}
