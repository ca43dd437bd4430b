"""Shared helpers: str/Column coercion and list normalization.

Parity note: the reference coerces through ``kolang.column_functions.col``
(``/root/reference/kolang/column_functions.py:12-24``), which returns a
*generator* for multi-arg calls and re-classes results as ``KolangColumn``
(broken on PySpark 4 — SURVEY.md §1.4). Here coercion is a plain helper
returning vanilla ``Column`` objects / tuples.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def to_col(c: ColumnOrName) -> Column:
    """Coerce a column name into a :class:`Column`; pass Columns through."""
    if isinstance(c, str):
        return F.col(c)
    if isinstance(c, Column):
        return c
    raise TypeError(f"expected str or Column, got {type(c).__name__}")


def to_cols(cols: Iterable[ColumnOrName]) -> List[Column]:
    """Coerce an iterable of names/Columns into a list of Columns."""
    return [to_col(c) for c in cols]


def to_col_list(
    cols: Union[ColumnOrName, Sequence[ColumnOrName], None],
) -> List[Column]:
    """Normalize a ``partition_by``-style argument (None | single | list)."""
    if cols is None:
        return []
    if isinstance(cols, (str, Column)):
        return [to_col(cols)]
    return to_cols(cols)


def name_of(c: ColumnOrName, fallback: str = "value") -> str:
    """Best-effort name for aliasing: the string itself, else a fallback."""
    return c if isinstance(c, str) else fallback


def broadcast_join_nullsafe(left, right, keys: Sequence[str], how: str = "inner"):
    """``left.join(broadcast(right), keys, how)`` with NULL-safe key
    equality (``<=>``), keeping a single copy of each key column.

    ``groupBy`` treats NULL as a real group, but a plain equi-join then
    drops the NULL-keyed rows on re-attach — so every "aggregate per
    group, broadcast back onto the detail rows" operator in this package
    (``mad_outliers``, ``equi_depth_bin``, ``resample_fill``) joins
    through here to honor its "adds columns to the input rows" contract
    for NULL group keys too. With no keys this degenerates to the
    broadcast cross join of a 1-row aggregate.

    Plan shape is unchanged: the right side stays a broadcast hash join
    (``<=>`` is a valid hash key — NULL hashes to a regular bucket), so
    the detail rows still never shuffle.
    """
    if not keys:
        return left.crossJoin(F.broadcast(right))
    renamed = right
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"__ks_rk_{k}__")
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(renamed[f"__ks_rk_{k}__"])
        cond = c if cond is None else (cond & c)
    return left.join(F.broadcast(renamed), cond, how).drop(
        *[f"__ks_rk_{k}__" for k in keys]
    )


def bind_once(expr: Column, build) -> Column:
    """Evaluate ``expr`` exactly once per row, then feed it to ``build``.

    Higher-order-function lambdas (``transform``/``filter``/``aggregate``)
    are CodegenFallback expressions: they get **no** common-subexpression
    elimination, so an expensive array expression referenced N times
    inside lambda bodies is re-evaluated N times per row. Routing it
    through a single-element ``transform`` binds it to a lambda variable
    (a cheap slot reference) — the classic let-binding, expressed in
    Column algebra:

        ``element_at(transform(array(expr), lambda x: build(x)), 1)``

    Semantics are unchanged; only evaluation count drops.
    """
    return F.element_at(F.transform(F.array(expr), build), 1)


def pushdown_fence(c: Column) -> Column:
    """Optimizer fence: mark an expensive expression non-deterministic so
    Catalyst will not duplicate it into a join condition or a pushed-down
    filter.

    ``c + 0.0 * rand()`` is value-identical for any finite/NaN ``c`` (the
    added term is exactly ``0.0``), but the ``rand`` taints the projection
    as non-deterministic, which blocks ``PushPredicateThroughJoin`` /
    ``CollapseProject``. Use on numeric scoring columns that a subsequent
    ``where`` filters — otherwise the score is evaluated once per
    *candidate* pair inside the (interpreted, non-codegen) join condition
    and a second time in the output projection.
    """
    return c + F.lit(0.0) * F.rand(seed=0)


def ensure_min_parallelism(df, min_partitions: int | None = None):
    """Round-robin repartition iff the plan has too few input partitions.

    Small single-file inputs arrive as one split, serializing per-row
    compute-heavy stages (shingling, hashing, similarity scoring) onto a
    single core. At production scale (thousands of input splits) the
    check short-circuits and this is a no-op — the shuffle is only paid
    exactly when the input cannot otherwise use the cluster.
    """
    try:
        sc = df.sparkSession.sparkContext
        target = min_partitions or sc.defaultParallelism
        current = df.rdd.getNumPartitions()
    except Exception:
        # Spark Connect: no sparkContext/rdd access. We cannot probe the
        # input split count, and an unconditional repartition would tax
        # well-partitioned production inputs — leave the plan unchanged.
        return df
    if current >= target:
        return df
    return df.repartition(target)


def _eager_checkpoint_keep_partitioning(df, reliable: bool):
    """Eager (local or reliable) checkpoint whose ``LogicalRDD``
    RETAINS the child plan's hash partitioning under AQE.

    ``Dataset.checkpoint`` copies ``executedPlan.outputPartitioning``
    into the resulting ``LogicalRDD`` — but with AQE enabled the
    executed plan is an ``AdaptiveSparkPlanExec`` whose partitioning
    reads as unknown at capture time, so a deliberately laid-out frame
    (e.g. an edge table repartitioned by its per-round join/agg key)
    forgets its layout and every downstream round pays the exchange
    again (measured: groupBy-after-checkpoint keeps its Exchange with
    AQE on, drops it with AQE off). The checkpoint itself merely loses
    AQE partition coalescing; its exchange count comes from
    ``spark.sql.shuffle.partitions``, which this project keeps
    scale-adaptive (conf/env).

    r14 (VERDICT r13 item 7): the one AQE-off checkpoint plans in a
    CLONED session — ``SparkSession.cloneSession()`` copies the full
    runtime conf + session state but owns its own ``SQLConf``, so
    flipping AQE off there is invisible to every other driver thread
    (the old session-global toggle let a concurrent thread plan its
    query without AQE for the duration of the checkpoint job). The
    frame's logical plan is re-bound into the clone via
    ``Dataset.ofRows`` (``private[sql]`` — public in bytecode, so
    py4j dispatches it), checkpointed eagerly there (eager because
    observe-fused metrics must fire in the same tracked execution —
    the clone's listener manager is a clone-time copy of the
    original's, so registered Observations still receive their
    metrics; pinned by tests/test_checkpoint_dir.py), and the
    resulting ``LogicalRDD`` plan — session-agnostic, it holds only
    the materialized RDD — is re-wrapped in the ORIGINAL session.
    Runtimes without JVM access (Spark Connect) fall back to the r13
    session-global toggle, whose thread caveat is bounded by the
    checkpoint job's duration."""
    spark = df.sparkSession
    try:
        aqe_on = (
            str(spark.conf.get("spark.sql.adaptive.enabled", "true")).lower()
            == "true"
        )
    except Exception:  # pragma: no cover - conf access failed
        aqe_on = False
    if not aqe_on:
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(
            eager=True
        )
    try:
        from pyspark.sql import DataFrame as _SparkDataFrame

        jspark = spark._jsparkSession
        jvm = spark._jvm
        jclone = jspark.cloneSession()
        jclone.conf().set("spark.sql.adaptive.enabled", "false")
        ds_cls = jvm.org.apache.spark.sql.classic.Dataset
        jdf2 = ds_cls.ofRows(
            jclone, df._jdf.queryExecution().logical()
        )
        jck = jdf2.checkpoint(True) if reliable else jdf2.localCheckpoint(
            True
        )
        jout = ds_cls.ofRows(jspark, jck.queryExecution().logical())
        return _SparkDataFrame(jout, spark)
    except Exception:  # pragma: no cover - Connect / JVM access failed
        pass
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(
            eager=True
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def iter_checkpoint(df, checkpoint_dir=None, keep_partitioning=False):
    """Per-iteration lineage pin for iterative operators (PageRank,
    label propagation): eager ``localCheckpoint`` by default — the
    fastest truncation, blocks in executor-local storage — or a
    RELIABLE ``checkpoint`` into ``checkpoint_dir`` when given (r11
    verdict item 5). ``localCheckpoint`` state dies with its executor:
    fine on ``local[*]``, but on a real cluster one lost executor past
    round 1 makes the truncated lineage unrecomputable and kills the
    whole job. A reliable checkpoint writes each round's state to the
    fault-tolerant ``checkpoint_dir`` filesystem (HDFS/object store)
    and survives executor loss, at the cost of one distributed write
    per round — opt in for long iteration chains on preemptible
    fleets. The caller owns the directory's lifecycle (Spark only
    auto-cleans it with ``spark.cleaner.referenceTracking
    .cleanCheckpoints``).

    Caveats (review r12) — reliable checkpointing rides
    ``SparkContext.setCheckpointDir``, which is SESSION-GLOBAL and has
    no faithful restore (the getter returns the per-set UUID subdir,
    not the value to re-set): (a) after an operator call with
    ``checkpoint_dir``, the session's checkpoint dir stays pointed
    there — re-issue your own ``setCheckpointDir`` before unrelated
    ``df.checkpoint()`` calls, and don't delete the scratch dir while
    frames that checkpointed into it are alive; (b) concurrent
    operators in different driver threads with DIFFERENT
    checkpoint_dirs race on the global setting — serialize them or
    share one dir (the same one-driver-thread caveat as
    :func:`tracked_local_checkpoint`'s release tracking). The set is
    skipped when the session already points under ``checkpoint_dir``,
    so an N-round loop issues one mkdir, not N.

    ``keep_partitioning=True`` (r13): checkpoint via
    :func:`_eager_checkpoint_keep_partitioning` so a deliberately
    laid-out frame keeps its hash partitioning under AQE — use for
    big frames pinned once and re-read every iteration."""
    if checkpoint_dir is None:
        if keep_partitioning:
            return _eager_checkpoint_keep_partitioning(df, reliable=False)
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    try:
        cur = sc.getCheckpointDir()
    except Exception:  # pragma: no cover - Connect without the getter
        cur = None
    # cur is the fully-qualified UUID SUBDIR of the last set (possibly
    # scheme-prefixed, e.g. file:/...). Strip the UUID leaf and compare
    # its PARENT to checkpoint_dir on whole-path boundaries, qualifying
    # both through the Hadoop FileSystem so schemes/relative paths
    # normalize identically. A substring test here (advisor r12) would
    # falsely skip the set when a *prior* dir merely contains
    # checkpoint_dir as a path substring ('/data/ck-old' vs '/data/ck'),
    # silently landing reliable checkpoints in the other directory.
    if cur is None or _qualify_dir(df.sparkSession, cur.rstrip("/").rsplit("/", 1)[0]) != _qualify_dir(df.sparkSession, checkpoint_dir):
        sc.setCheckpointDir(checkpoint_dir)
    if keep_partitioning:
        return _eager_checkpoint_keep_partitioning(df, reliable=True)
    return df.checkpoint(eager=True)


def _qualify_dir(spark, path: str) -> str:
    """Fully-qualified, trailing-slash-free form of ``path`` through the
    Hadoop FileSystem (``file:/abs`` for local, scheme-preserved for
    object stores), so checkpoint-dir comparisons are whole-segment
    exact regardless of how the caller spelled the path. Falls back to
    a driver-local abspath on Spark Connect (local paths only there)."""
    from kolang_spark.sources.io import _hadoop_fs

    pair = _hadoop_fs(spark, path)
    if pair is None:
        import os

        return os.path.abspath(path).rstrip("/")
    fs, jpath = pair
    return fs.makeQualified(jpath).toString().rstrip("/")


def tracked_local_checkpoint(df, checkpoint_dir=None, keep_partitioning=False):
    """``localCheckpoint(eager=True)`` that also reports which RDD ids
    the checkpoint registered, so iterative operators can *release*
    superseded checkpoints deterministically (see
    :func:`release_checkpoints`).

    ``checkpoint_dir`` switches to a RELIABLE checkpoint (same
    contract as :func:`iter_checkpoint`: survives executor loss, one
    distributed write per call); reliable checkpoints pin no
    executor-local blocks, so the returned id set is empty and
    release is a natural no-op — checkpoint FILES under the dir are
    the caller's to clean.

    ``DataFrame.unpersist()`` only talks to the SQL cache manager and
    leaves localCheckpoint's RDD-level blocks pinned until JVM GC — in
    a long-lived session an iterative algorithm (connected components:
    up to ~50 full-vertex-set checkpoints per call) accumulates
    gigabytes of dead blocks and rides on nondeterministic
    ContextCleaner timing. Tracking the registered ids at creation is
    the only stable handle PySpark exposes.

    Returns ``(checkpointed_df, frozenset_of_rdd_ids)``; on Spark
    Connect (no JVM access) the id set is empty and release degrades to
    the GC-timed behavior.

    Caveat: the id set is computed as a before/after diff of the
    context's persistent-RDD registry, so a *concurrent* persist from
    another driver thread inside that window would be captured (and
    later released) too. Acceptable for the iterative operators here
    (one driver thread builds one query); in a multi-threaded driver,
    serialize calls or skip release.
    """
    if checkpoint_dir is not None:
        return (
            iter_checkpoint(
                df, checkpoint_dir, keep_partitioning=keep_partitioning
            ),
            frozenset(),
        )
    try:
        jctx = df.sparkSession._jsparkSession.sparkContext()
        before = _persistent_rdd_ids(jctx)
    except Exception:
        jctx = None
        before = frozenset()
    if keep_partitioning:
        out = _eager_checkpoint_keep_partitioning(df, reliable=False)
    else:
        out = df.localCheckpoint(eager=True)
    if jctx is None:
        return out, frozenset()
    try:
        return out, frozenset(_persistent_rdd_ids(jctx) - before)
    except Exception:
        return out, frozenset()


def _persistent_rdd_ids(jctx) -> frozenset:
    m = jctx.getPersistentRDDs()
    it = m.iterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next()._1())
    return frozenset(ids)


def release_checkpoints(spark, rdd_ids) -> None:
    """Drop the RDD-level blocks of previously tracked localCheckpoints
    (non-blocking). Safe to call with ids already collected by the
    ContextCleaner; silently a no-op on Spark Connect.

    Only release checkpoints that no live DataFrame's plan reads —
    localCheckpoint truncates lineage, so evicted blocks cannot be
    recomputed."""
    try:
        jctx = spark._jsparkSession.sparkContext()
        m = jctx.getPersistentRDDs()
        for pid in rdd_ids:
            if m.contains(pid):
                m.apply(pid).unpersist(False)
    except Exception:
        pass


def observation_value(obs, key: str, timeout: float = 60.0):
    """Read one metric from a ``pyspark.sql.Observation`` with a
    BOUNDED wait, or ``None`` if the metrics never arrive.

    ``Observation.get`` blocks until the observed action's metrics
    fire; on classic Spark the eager action has already run them, so
    this returns instantly. On a runtime that materializes the action
    outside a tracked SQL execution (the hazard documented at
    ``llm/dedup.py::_observation_changed``) the metrics never fire —
    after ``timeout`` seconds this returns ``None`` so the caller can
    fall back to an explicit aggregate job instead of hanging forever.
    """
    import threading

    result: dict = {}

    def _read() -> None:
        try:
            result["v"] = obs.get[key]
        except Exception as exc:  # surfaced to caller as fallback
            result["e"] = exc

    t = threading.Thread(target=_read, daemon=True)
    t.start()
    t.join(timeout)
    return result.get("v")
