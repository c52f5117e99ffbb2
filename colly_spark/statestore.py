"""Checkpointed state tables (frontier, url_seen, robots_cache, visits,
errors, results, lineage) with atomic per-round commits and resume.

The design target is Iceberg (snapshot-per-round, MERGE/append, time travel);
this sandbox has no iceberg-spark-runtime jar, so the same contract is kept
behind a thin interface (SURVEY.md §7.2): parquet round-directories plus a
JSON manifest that is rewritten atomically (tmp + rename) only after every
table of the round is fully written. Crash between writes -> orphan round
dirs beyond ``completed_round`` are dropped on resume, exactly like an
uncommitted Iceberg snapshot. Swapping in Iceberg later touches only this
module.

Memory mode (tests/bench) keeps DataFrames in-process and truncates the
iterative lineage each round with ``localCheckpoint`` — the standard guard
against Catalyst-plan blowup in round-based Spark jobs.

The durable format is pluggable (the reference ships a Storage interface
with community redis/sqlite backends, storage/storage.go:30-42): every
parquet-specific operation goes through the ``_io_*`` primitives at the
bottom of :class:`StateStore`, and :class:`SqliteStateStore` overrides
exactly those to keep the whole round state in one SQLite file — the
single-node resumability backend (rows transit the driver, documented;
the parquet tree remains the at-scale default).
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
import sqlite3
import tempfile
from concurrent.futures import ThreadPoolExecutor

from pyspark import inheritable_thread_target
from pyspark.sql import DataFrame, SparkSession


def run_jobs_concurrent(spark: SparkSession, thunks: list):
    """Run independent Spark actions (localCheckpoint / parquet write)
    concurrently and return their results in order.

    Every action is a full driver-side scheduling barrier (job submit,
    DAG build, task round-trips) — K small state-maintenance jobs issued
    serially cost K barriers of pure latency even when the cluster is
    idle. Spark's scheduler accepts concurrent job submission natively
    (it is the documented multi-tenant pattern) and py4j releases the
    GIL on socket waits, so submitting the batch from a small thread
    pool collapses K barriers into ~1 without touching plan semantics.
    Job description, job group, scheduler pool and the rest of the
    caller's JVM-thread local properties are propagated into each worker
    via ``inheritable_thread_target`` (captured here, at submit time):
    under pinned-thread mode (PYSPARK_PIN_THREAD=true, the default since
    Spark 3.2) each pooled Python thread gets its own JVM thread, which
    would otherwise start with EMPTY local properties; with pinning
    disabled all Python threads share ONE JVM thread whose state already
    carries them, and the wrapper must be skipped — pyspark's non-pinned
    ``inheritable_thread_target(session)`` branch returns the SESSION
    itself (pyspark/util.py: ``else: return f``), so applying it to the
    thunk would raise 'SparkSession is not callable'."""
    if not thunks:
        return []
    if len(thunks) == 1:
        return [thunks[0]()]

    from py4j.clientserver import ClientServer
    from pyspark import SparkContext

    if isinstance(SparkContext._gateway, ClientServer):  # pinned-thread mode
        # the session-arg form also inherits session TAGS (the
        # bare-callable form warns that tags are dropped)
        run = inheritable_thread_target(spark)(lambda t: t())
    else:
        run = lambda t: t()
    with ThreadPoolExecutor(max_workers=min(8, len(thunks))) as ex:
        return list(ex.map(run, thunks))


def _round_of(subdir: str) -> int | None:
    """round number encoded in a 'round={r}' or 'round={r}__s{k}' dir name."""
    if not subdir.startswith("round="):
        return None
    return int(subdir.split("=")[1].split("__")[0])


def union_all(frames: list[DataFrame]) -> DataFrame:
    """Balanced unionByName over a frame list. A left-deep fold re-analyzes
    an ever-growing tree per step (O(n^2) driver-side analysis — measured as
    ~90 ms per unionByName on round-sized subtrees); pairing halves the
    depth to O(log n) and each analysis sees a near-minimal tree."""
    assert frames
    while len(frames) > 1:
        nxt = [a.unionByName(b) for a, b in zip(frames[::2], frames[1::2])]
        if len(frames) % 2:
            nxt.append(frames[-1])
        frames = nxt
    return frames[0]


class StateStore:
    def __init__(
        self,
        spark: SparkSession,
        schemas: dict,
        checkpoint_dir: str | None = None,
        replace_tables: tuple[str, ...] = (),
        bucketed: dict[str, dict] | None = None,
    ):
        self.spark = spark
        self.schemas = schemas
        self.dir = checkpoint_dir
        self.replace_tables = set(replace_tables)
        self.tables: dict[str, DataFrame] = {}
        self.completed_round = -1
        self.counters: dict[str, int] = {}
        self._stage_seq: dict[tuple[str, int], int] = {}
        # (table, segment) pairs retired only after the manifest commit
        self._pending_delete: list[tuple[str, str]] = []
        # Bucketed (LSM-shaped) tables — the 10^10-row url_seen design:
        # a big BASE frame kept hash-partitioned + sorted on its bucket keys
        # (checkpointed with partitioning preserved, so per-round probe
        # joins never re-shuffle or re-sort the base side) plus a small
        # TAIL of recent appends (broadcast-joined by the probe). Appends
        # only ever checkpoint the delta; every ``merge_every`` compactions
        # the tail folds into the base with one full repartition — the
        # in-memory analog of Iceberg bucket compaction, amortizing the
        # full-table shuffle to 1/merge_every per round instead of paying
        # a full distinct + shuffle + rewrite every round.
        # bucketed[name] = {"keys": (...), "partitions": int, "merge_every": int}
        # Disk mode gets the same LSM shape (VERDICT r3 item 2): round-delta
        # parquet dirs are the durable format; the partitioned base + tail
        # live in memory during the run exactly like memory mode (probe
        # joins never re-shuffle the base), ONE repartition re-establishes
        # the base partitioning at resume, and every ``merge_every``
        # compactions the merged base is durably rewritten (staged dir,
        # superseded dirs retired only after the manifest commit) — the
        # parquet analog of Iceberg bucket compaction.
        self.bucketed = dict(bucketed or {})
        self._base: dict[str, DataFrame | None] = {n: None for n in self.bucketed}
        self._tail: dict[str, list[DataFrame]] = {n: [] for n in self.bucketed}
        self._tail_pending: dict[str, list[DataFrame]] = {n: [] for n in self.bucketed}
        self._since_merge: dict[str, int] = {n: 0 for n in self.bucketed}
        # disk mode: the segments backing the current base/tail frames — a
        # durable base rewrite retires exactly the segments it merged
        self._base_seg: dict[str, str | None] = {n: None for n in self.bucketed}
        self._tail_segs: dict[str, list[str]] = {n: [] for n in self.bucketed}
        # memory-mode append deferral: staged frames accumulate in lists and
        # only union at read/compact time (balanced). Eager per-append
        # unionByName re-analyzed the full accumulated tree on every append
        # — pure driver-side serial cost in the round loop.
        self._mem_appends: dict[str, list[DataFrame]] = {}
        # memory-mode replace()s since the last compact: a table that was
        # neither appended to nor replaced is ALREADY a checkpointed frame
        # — re-checkpointing it is one full Spark job of pure serial cost
        # per table per round (measured as the dominant residual term of
        # the round loop once plan construction was hoisted)
        self._mem_dirty: set[str] = set()
        if self.dir:
            self._io_init()
            self._load_manifest()

    # ---------------- manifest ----------------

    def _load_manifest(self) -> None:
        m = self._io_load_manifest()
        if m is not None:
            self.completed_round = m["completed_round"]
            self.counters = m["counters"]
            self._drop_uncommitted()
            for name in self.schemas:
                if name in self.bucketed:
                    # resume: ONE repartition re-establishes the preserved
                    # base partitioning; per-round probes then join with no
                    # base-side exchange, same as an uninterrupted run
                    segs = self._io_list(name)
                    if segs:
                        spec = self.bucketed[name]
                        self._base[name] = self._ckpt_partitioned(
                            self._read_table(name), spec["keys"], spec["partitions"]
                        )
                        # every pre-resume segment contributed to this base —
                        # register them for retirement at the next durable
                        # rewrite, or a second resume would read them AND
                        # the rewritten base (duplicate rows)
                        self._tail_segs[name] = segs
                    continue
                self.tables[name] = self._read_table(name)

    def _drop_uncommitted(self) -> None:
        for name in self.schemas:
            for seg in self._io_list(name):
                r = _round_of(seg)
                if r is not None and r > self.completed_round:
                    self._io_delete(name, seg)

    def _read_table(self, name: str) -> DataFrame:
        empty = self.spark.createDataFrame([], schema=self.schemas[name])
        segs = self._io_list(name)
        if not segs:
            return empty
        if name in self.replace_tables:  # only the newest committed snapshot is live
            rounds = [
                r
                for r in (_round_of(s) for s in segs)
                if r is not None and r <= self.completed_round
            ]
            if not rounds:
                return empty
            return self._io_read(name, [f"round={max(rounds)}"])
        return self._io_read(name, segs)

    # ---------------- table ops ----------------

    def get(self, name: str) -> DataFrame:
        if name in self.bucketed:
            frames = (
                ([self._base[name]] if self._base[name] is not None else [])
                + self._tail[name]
                + self._tail_pending[name]
            )
            if not frames:
                return self.spark.createDataFrame([], schema=self.schemas[name])
            return union_all(frames)
        if name not in self.tables:
            self.tables[name] = self.spark.createDataFrame([], schema=self.schemas[name])
        staged = self._mem_appends.get(name)
        if staged:
            return union_all([self.tables[name], *staged])
        return self.tables[name]

    def get_parts(self, name: str) -> tuple[DataFrame | None, DataFrame | None]:
        """(base, tail) of a bucketed table for the probe-join path.

        ``base`` is hash-partitioned + sorted on the bucket keys with that
        layout *preserved through its checkpoint*, so a join on those keys
        plans with NO exchange and NO sort on the base side — only the probe
        rows shuffle. ``tail`` is the recent-append delta (small; the
        optimizer broadcast-joins it) — in disk mode the tail frames are
        the round-delta parquet scans. Either may be None (empty). For
        non-bucketed tables: (full table, None)."""
        if name not in self.bucketed:
            return self.get(name), None
        tail_frames = self._tail[name] + self._tail_pending[name]
        tail = union_all(tail_frames) if tail_frames else None
        return self._base[name], tail

    def _ckpt_partitioned(self, df: DataFrame, keys: tuple, parts: int) -> DataFrame:
        """repartition+sort+localCheckpoint with partitioning/ordering kept.

        AQE is toggled off around the checkpoint: under AQE the captured
        LogicalRDD reports UnknownPartitioning (the adaptive plan's output
        partitioning isn't final at capture time) and every later join
        would re-shuffle the base — verified by
        tests/test_statestore.py::test_base_join_has_no_base_exchange."""
        conf = self.spark.conf
        old = conf.get("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return (
                df.repartition(parts, *keys)
                .sortWithinPartitions(*keys)
                .localCheckpoint(eager=True)
            )
        finally:
            conf.set("spark.sql.adaptive.enabled", old)

    def stage_append(self, name: str, df: DataFrame, round_no: int) -> None:
        """Stage this round's rows for ``name`` (lazy in BOTH modes).
        Later reads within the round see them (:meth:`get` /
        :meth:`get_parts` union the staged frames); disk mode durably
        writes every staged delta in ONE concurrent batch at
        :meth:`commit_round` — staging eagerly would cost one serial
        parquet-write barrier per append (~8-10 per round across errors /
        url_seen / lineage / visits / results / caches), pure driver
        latency the commit batch collapses. Not visible to a resumed run
        until the manifest commit, exactly as before."""
        cols = [f.name for f in self.schemas[name].fields]
        df = df.select(*cols)
        if name in self.bucketed:
            self._tail_pending[name].append(df)
        else:
            self._mem_appends.setdefault(name, []).append(df)

    def _next_seg(self, name: str, round_no: int) -> str:
        k = self._stage_seq.get((name, round_no), 0)
        self._stage_seq[(name, round_no)] = k + 1
        return f"round={round_no}__s{k}"

    def replace(self, name: str, df: DataFrame, round_no: int) -> None:
        """Full-replace semantics (the pending frontier snapshot)."""
        cols = [f.name for f in self.schemas[name].fields]
        df = df.select(*cols)
        if self.dir:
            # replace = only the newest round segment is live. Written
            # eagerly (not deferred to commit): the caller counts/reads the
            # replaced table right after, and the durable scan makes that a
            # single materialization instead of a double pass.
            self._mem_appends.pop(name, None)
            self.tables[name] = self._io_write(name, f"round={round_no}", df)
        else:
            self.tables[name] = df
            self._mem_appends.pop(name, None)
            self._mem_dirty.add(name)

    def compact(self, names: list[str], eager: bool = True) -> None:
        """Truncate Catalyst lineage of iterative tables (memory mode).

        Bucketed tables compact incrementally: only the round's DELTA is
        checkpointed (O(appends), not O(table)); every ``merge_every``
        compactions the accumulated tail folds into the partitioned base
        with one full shuffle — amortized Iceberg-style bucket compaction.

        The per-table ``localCheckpoint`` actions are independent jobs —
        they run as one concurrent batch (run_jobs_concurrent) instead of
        one serial scheduling barrier per table. Disk mode skips the
        non-bucketed tables entirely: their lineage truncation comes free
        from the durable-scan swap at commit_round.

        ``eager=False`` marks the checkpoint lazily: the caller's NEXT
        full-scan action (e.g. a count) materializes it, folding the
        checkpoint job and that action into one scheduling barrier. Only
        safe when the caller's next action computes every partition —
        a partial action (take/isEmpty) would checkpoint only the
        partitions it touched."""
        batch: list[tuple[str, str, DataFrame]] = []  # (kind, name, frame)
        for name in names:
            if name in self.bucketed:
                if not self.dir and self._tail_pending[name]:
                    batch.append(("tail", name, union_all(self._tail_pending[name])))
                continue
            if self.dir:
                continue
            staged = self._mem_appends.pop(name, None)
            if staged:
                base = [self.tables[name]] if name in self.tables else []
                batch.append(("table", name, union_all(base + staged)))
            elif name in self._mem_dirty and name in self.tables:
                batch.append(("table", name, self.tables[name]))
            self._mem_dirty.discard(name)
        done = run_jobs_concurrent(
            self.spark,
            [lambda df=df: df.localCheckpoint(eager=eager) for _, _, df in batch],
        )
        for (kind, name, _), ck in zip(batch, done):
            if kind == "tail":
                self._tail[name].append(ck)
                self._tail_pending[name] = []
            else:
                self.tables[name] = ck
        for name in names:
            if name not in self.bucketed:
                continue
            spec = self.bucketed[name]
            self._since_merge[name] += 1
            if self._since_merge[name] >= spec["merge_every"] and self._tail[name]:
                frames = (
                    [] if self._base[name] is None else [self._base[name]]
                ) + self._tail[name]
                self._base[name] = self._ckpt_partitioned(
                    union_all(frames), spec["keys"], spec["partitions"]
                )
                self._tail[name] = []
                self._since_merge[name] = 0
                if self.dir:
                    # durable bucket compaction: write the merged base
                    # (already checkpointed — this is a copy, not a
                    # recompute) as a staged segment under the
                    # IN-PROGRESS round. Crash before the manifest
                    # commit: the staged segment is uncommitted and
                    # dropped on resume, the superseded delta segments
                    # are still durable — state intact. Crash after:
                    # commit_round retired the superseded segments and
                    # the base segment is live.
                    seg = self._next_seg(name, self.completed_round + 1)
                    self._io_write(name, seg, self._base[name])
                    if self._base_seg[name]:
                        self._pending_delete.append((name, self._base_seg[name]))
                    self._pending_delete.extend(
                        (name, s) for s in self._tail_segs[name]
                    )
                    self._base_seg[name] = seg
                    self._tail_segs[name] = []

    def compact_rewrite(self, name: str, df: DataFrame, round_no: int) -> None:
        """Rewrite an append-mode table to exactly ``df`` (fetch-cache
        maintenance: drop superseded/expired entries the way the reference
        deletes expired cache files).

        Disk mode stays crash-safe: the compacted snapshot is written as a
        new staged segment first, superseded segments are only DELETED after
        the round's manifest commit (``commit_round``). A crash in between
        leaves both durable — resume then reads duplicate rows, which the
        engine's newest-wins ``row_number`` read path tolerates, and the
        next compaction removes them."""
        cols = [f.name for f in self.schemas[name].fields]
        df = df.select(*cols)
        # the rewrite frame was derived from get() (staged appends
        # included) — clear them or the next get() / commit double-counts
        self._mem_appends.pop(name, None)
        if not self.dir:
            self.tables[name] = df.localCheckpoint(eager=True)
            self._mem_dirty.discard(name)
            return
        seg = self._next_seg(name, round_no)
        scan = self._io_write(name, seg, df)  # materialize BEFORE retiring
        for sub in self._io_list(name):
            r = _round_of(sub)
            if sub != seg and r is not None and r <= round_no:
                self._pending_delete.append((name, sub))
        self.tables[name] = scan

    def commit_round(self, round_no: int, counters: dict[str, int]) -> None:
        if not self.dir:
            self.completed_round = round_no
            self.counters = dict(counters)
            return
        # durably write every delta staged this round as ONE concurrent
        # batch of independent parquet-write jobs (one segment per table —
        # the per-append segments of the old eager path collapse too).
        # Crash mid-batch: the segments carry round=round_no which is
        # > the manifest's completed_round until the save below, so a
        # resume drops them — same crash contract as the eager path.
        writes: list[tuple[str, str, DataFrame]] = []
        for name, frames in self._mem_appends.items():
            if frames:
                writes.append((name, self._next_seg(name, round_no), union_all(frames)))
        for name, frames in self._tail_pending.items():
            if frames:
                writes.append((name, self._next_seg(name, round_no), union_all(frames)))
        scans = run_jobs_concurrent(
            self.spark,
            [lambda n=n, s=s, df=df: self._io_write(n, s, df) for n, s, df in writes],
        )
        # in-process commit point: only after every durable write landed.
        # A write that throws leaves completed_round at the prior round, so
        # the store never believes uncommitted round=round_no segments are
        # readable (_read_table filters r <= completed_round) even if a
        # caller were to catch the exception and continue.
        self.completed_round = round_no
        self.counters = dict(counters)
        for (name, seg, _), scan in zip(writes, scans):
            if name in self.bucketed:
                # the durable scan becomes the tail frame: materialized +
                # lineage-truncated, so later probes/merges never re-run
                # the round's plan
                self._tail[name].append(scan)
                self._tail_segs[name].append(seg)
                self._tail_pending[name] = []
            else:
                self._mem_appends.pop(name, None)
                self.tables[name] = self._read_table(name)
        for name in self.schemas:
            for sub in self._io_list(name):
                r = _round_of(sub)
                if r is not None and r > round_no:
                    self._io_delete(name, sub)
        self._io_save_manifest(  # atomic commit
            {"completed_round": round_no, "counters": self.counters}
        )
        # only now is it safe to retire segments superseded by a
        # compact_rewrite / durable base merge earlier in this round
        for name, seg in self._pending_delete:
            self._io_delete(name, seg)
        self._pending_delete = []

    # ---------------- durable IO primitives ----------------
    # The whole durable format lives behind these six methods (the pluggable
    # Storage seam — reference storage/storage.go:30-42). The default is the
    # parquet round-segment tree described in the module docstring;
    # :class:`SqliteStateStore` overrides exactly these.

    def _io_init(self) -> None:
        os.makedirs(self.dir, exist_ok=True)

    def _io_list(self, name: str) -> list[str]:
        """Names of the durable segments currently stored for ``name``."""
        tdir = os.path.join(self.dir, name)
        return os.listdir(tdir) if os.path.isdir(tdir) else []

    def _io_write(self, name: str, seg: str, df: DataFrame) -> DataFrame:
        """Durably persist ``df`` as segment ``seg`` (overwriting) and
        return a lineage-truncated frame backed by the stored bytes."""
        path = os.path.join(self.dir, name, seg)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.schema(self.schemas[name]).parquet(path)

    def _io_read(self, name: str, segs: list[str]) -> DataFrame:
        paths = [os.path.join(self.dir, name, s) for s in segs]
        return self.spark.read.schema(self.schemas[name]).parquet(*paths)

    def _io_delete(self, name: str, seg: str) -> None:
        shutil.rmtree(os.path.join(self.dir, name, seg), ignore_errors=True)

    def _io_load_manifest(self) -> dict | None:
        path = os.path.join(self.dir, "manifest.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _io_save_manifest(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f)
        os.replace(tmp, os.path.join(self.dir, "manifest.json"))


class SqliteStateStore(StateStore):
    """Same contract, one SQLite file (reference: the community sqlite
    Storage backend behind storage/storage.go:30-42).

    Segments become BLOB rows in a ``segments`` table — each holds the
    pickled row list of one staged append — and the manifest commit is a
    SQLite transaction, which gives the same atomicity the parquet tree
    gets from the tmp+rename manifest. Rows transit the driver on both
    write (``collect``) and read (``createDataFrame``): this is the
    SINGLE-NODE resumability backend, exactly like the reference's sqlite
    storage, and is documented as such — the parquet tree remains the
    at-scale default. ``checkpoint_dir`` is the path of the .db file."""

    def _io_init(self) -> None:
        parent = os.path.dirname(os.path.abspath(self.dir))
        os.makedirs(parent, exist_ok=True)
        with self._conn() as db:
            db.execute(
                "CREATE TABLE IF NOT EXISTS segments ("
                " tbl TEXT NOT NULL, seg TEXT NOT NULL, data BLOB NOT NULL,"
                " PRIMARY KEY (tbl, seg))"
            )
            db.execute(
                "CREATE TABLE IF NOT EXISTS manifest ("
                " id INTEGER PRIMARY KEY CHECK (id = 0), body TEXT NOT NULL)"
            )

    def _conn(self) -> sqlite3.Connection:
        # commit_round issues segment writes concurrently; the busy timeout
        # lets writers queue on SQLite's file lock instead of erroring
        return sqlite3.connect(self.dir, timeout=30)

    def _io_list(self, name: str) -> list[str]:
        with self._conn() as db:
            rows = db.execute(
                "SELECT seg FROM segments WHERE tbl = ?", (name,)
            ).fetchall()
        return [r[0] for r in rows]

    #: hard cap on rows one segment may transit through the driver — this
    #: backend's contract is single-node, and it must fail loudly rather
    #: than OOM the driver when pointed at an at-scale crawl
    #: (COLLY_SQLITE_MAX_SEGMENT_ROWS overrides; parquet checkpoint dirs
    #: have no such cap because their writes never leave the executors)
    MAX_SEGMENT_ROWS = 5_000_000

    def _io_write(self, name: str, seg: str, df: DataFrame) -> DataFrame:
        cap = int(
            os.environ.get("COLLY_SQLITE_MAX_SEGMENT_ROWS", self.MAX_SEGMENT_ROWS)
        )
        # limit(cap+1) bounds driver memory during the guard itself: the
        # overflow is detected from ONE extra row, not a full collect
        rows = df.limit(cap + 1).collect()
        if len(rows) > cap:
            raise RuntimeError(
                f"sqlite state backend: segment {name}/{seg} exceeds "
                f"{cap} rows. Rows transit the driver in this single-node "
                "backend; use a parquet checkpoint_dir for at-scale crawls "
                "(or raise COLLY_SQLITE_MAX_SEGMENT_ROWS)."
            )
        with self._conn() as db:
            db.execute(
                "INSERT OR REPLACE INTO segments (tbl, seg, data) VALUES (?, ?, ?)",
                (name, seg, pickle.dumps(rows)),
            )
        # local rows ARE the materialized, lineage-free representation
        return self.spark.createDataFrame(rows, schema=self.schemas[name])

    def _io_read(self, name: str, segs: list[str]) -> DataFrame:
        # one batched SELECT per ~500 segments (SQLite's default host-
        # parameter limit is 999) instead of one per segment; rows are
        # assembled in the caller's seg order to keep reads deterministic
        blob_of: dict[str, bytes] = {}
        with self._conn() as db:
            for i in range(0, len(segs), 500):
                chunk = segs[i:i + 500]
                marks = ",".join("?" * len(chunk))
                blob_of.update(
                    db.execute(
                        f"SELECT seg, data FROM segments"
                        f" WHERE tbl = ? AND seg IN ({marks})",
                        (name, *chunk),
                    ).fetchall()
                )
        rows = []
        for seg in segs:
            if seg in blob_of:
                rows.extend(pickle.loads(blob_of[seg]))
        return self.spark.createDataFrame(rows, schema=self.schemas[name])

    def _io_delete(self, name: str, seg: str) -> None:
        with self._conn() as db:
            db.execute(
                "DELETE FROM segments WHERE tbl = ? AND seg = ?", (name, seg)
            )

    def _io_load_manifest(self) -> dict | None:
        with self._conn() as db:
            got = db.execute("SELECT body FROM manifest WHERE id = 0").fetchone()
        return json.loads(got[0]) if got is not None else None

    def _io_save_manifest(self, m: dict) -> None:
        with self._conn() as db:  # one transaction = the atomic commit
            db.execute(
                "INSERT OR REPLACE INTO manifest (id, body) VALUES (0, ?)",
                (json.dumps(m),),
            )


def make_state_store(spark: SparkSession, schemas: dict, checkpoint_dir, **kw):
    """Backend dispatch on the checkpoint path: ``*.db`` / ``*.sqlite`` →
    :class:`SqliteStateStore`, anything else → the parquet-tree
    :class:`StateStore` (also used, without IO, for memory mode)."""
    if checkpoint_dir and checkpoint_dir.endswith((".db", ".sqlite")):
        return SqliteStateStore(spark, schemas, checkpoint_dir, **kw)
    return StateStore(spark, schemas, checkpoint_dir, **kw)
