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
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def _round_of(subdir: str) -> int | None:
    """round number encoded in a 'round={r}' or 'round={r}__s{k}' dir name."""
    if not subdir.startswith("round="):
        return None
    return int(subdir.split("=")[1].split("__")[0])


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
        self._pending_delete: list[str] = []  # retired by compact_rewrite
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
        # Memory mode only: disk mode (the Iceberg stand-in) keeps plain
        # round-dir appends — real Iceberg gets this via bucket partitioning.
        self.bucketed = {} if checkpoint_dir else dict(bucketed or {})
        self._base: dict[str, DataFrame | None] = {n: None for n in self.bucketed}
        self._tail: dict[str, list[DataFrame]] = {n: [] for n in self.bucketed}
        self._tail_pending: dict[str, list[DataFrame]] = {n: [] for n in self.bucketed}
        self._since_merge: dict[str, int] = {n: 0 for n in self.bucketed}
        if self.dir:
            os.makedirs(self.dir, exist_ok=True)
            self._load_manifest()

    # ---------------- manifest ----------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "manifest.json")

    def _load_manifest(self) -> None:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                m = json.load(f)
            self.completed_round = m["completed_round"]
            self.counters = m["counters"]
            self._drop_uncommitted()
            for name in self.schemas:
                self.tables[name] = self._read_table(name)

    def _drop_uncommitted(self) -> None:
        for name in self.schemas:
            tdir = os.path.join(self.dir, name)
            if not os.path.isdir(tdir):
                continue
            for sub in os.listdir(tdir):
                r = _round_of(sub)
                if r is not None and r > self.completed_round:
                    shutil.rmtree(os.path.join(tdir, sub))

    def _read_table(self, name: str) -> DataFrame:
        tdir = os.path.join(self.dir, name)
        empty = self.spark.createDataFrame([], schema=self.schemas[name])
        if not os.path.isdir(tdir) or not os.listdir(tdir):
            return empty
        if name in self.replace_tables:  # only the newest committed snapshot is live
            rounds = [
                r
                for r in (_round_of(s) for s in os.listdir(tdir))
                if r is not None and r <= self.completed_round
            ]
            if not rounds:
                return empty
            live = max(rounds)
            return self.spark.read.schema(self.schemas[name]).parquet(
                os.path.join(tdir, f"round={live}")
            )
        return self.spark.read.schema(self.schemas[name]).parquet(
            os.path.join(tdir, "round=*")
        )

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
            out = frames[0]
            for f in frames[1:]:
                out = out.unionByName(f)
            return out
        if name not in self.tables:
            self.tables[name] = self.spark.createDataFrame([], schema=self.schemas[name])
        return self.tables[name]

    def get_parts(self, name: str) -> tuple[DataFrame | None, DataFrame | None]:
        """(base, tail) of a bucketed table for the probe-join path.

        ``base`` is hash-partitioned + sorted on the bucket keys with that
        layout *preserved through its checkpoint*, so a join on those keys
        plans with NO exchange and NO sort on the base side — only the probe
        rows shuffle. ``tail`` is the recent-append delta (small; the
        optimizer broadcast-joins it). Either may be None (empty). For
        non-bucketed tables (and disk mode): (full table, None)."""
        if name not in self.bucketed:
            return self.get(name), None
        tail_frames = self._tail[name] + self._tail_pending[name]
        tail = None
        if tail_frames:
            tail = tail_frames[0]
            for f in tail_frames[1:]:
                tail = tail.unionByName(f)
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
        """Write (disk) / union (memory) this round's rows for ``name``.
        Not visible to a resumed run until :meth:`commit_round`."""
        cols = [f.name for f in self.schemas[name].fields]
        df = df.select(*cols)
        if name in self.bucketed:
            self._tail_pending[name].append(df)
            return
        if self.dir:
            # a round may stage several appends to one table (e.g. url_seen:
            # submission marks then redirect-hop marks). Each gets its own
            # subdir: never overwrite a path a sibling plan is still reading.
            k = self._stage_seq.get((name, round_no), 0)
            self._stage_seq[(name, round_no)] = k + 1
            path = os.path.join(self.dir, name, f"round={round_no}__s{k}")
            df.write.mode("overwrite").parquet(path)
            self.tables[name] = self._read_table(name)
        else:
            self.tables[name] = self.get(name).unionByName(df)

    def replace(self, name: str, df: DataFrame, round_no: int) -> None:
        """Full-replace semantics (the pending frontier snapshot)."""
        cols = [f.name for f in self.schemas[name].fields]
        df = df.select(*cols)
        if self.dir:
            tdir = os.path.join(self.dir, name)
            path = os.path.join(tdir, f"round={round_no}")
            df.write.mode("overwrite").parquet(path)
            # replace = only the newest round dir is live
            self.tables[name] = self.spark.read.schema(self.schemas[name]).parquet(path)
        else:
            self.tables[name] = df

    def compact(self, names: list[str]) -> None:
        """Truncate Catalyst lineage of iterative tables (memory mode).

        Bucketed tables compact incrementally: only the round's DELTA is
        checkpointed (O(appends), not O(table)); every ``merge_every``
        compactions the accumulated tail folds into the partitioned base
        with one full shuffle — amortized Iceberg-style bucket compaction."""
        if self.dir:
            return
        for name in names:
            if name in self.bucketed:
                spec = self.bucketed[name]
                if self._tail_pending[name]:
                    delta = self._tail_pending[name][0]
                    for f in self._tail_pending[name][1:]:
                        delta = delta.unionByName(f)
                    self._tail[name].append(delta.localCheckpoint(eager=True))
                    self._tail_pending[name] = []
                self._since_merge[name] += 1
                if self._since_merge[name] >= spec["merge_every"] and self._tail[name]:
                    full = self._tail[name][0] if self._base[name] is None else self._base[name]
                    start = 1 if self._base[name] is None else 0
                    for f in self._tail[name][start:]:
                        full = full.unionByName(f)
                    self._base[name] = self._ckpt_partitioned(
                        full, spec["keys"], spec["partitions"]
                    )
                    self._tail[name] = []
                    self._since_merge[name] = 0
                continue
            if name in self.tables:
                self.tables[name] = self.tables[name].localCheckpoint(eager=True)

    def compact_rewrite(self, name: str, df: DataFrame, round_no: int) -> None:
        """Rewrite an append-mode table to exactly ``df`` (fetch-cache
        maintenance: drop superseded/expired entries the way the reference
        deletes expired cache files).

        Disk mode stays crash-safe: the compacted snapshot is written as a
        new staged subdir first, superseded subdirs are only DELETED after
        the round's manifest commit (``commit_round``). A crash in between
        leaves both on disk — resume then reads duplicate rows, which the
        engine's newest-wins ``row_number`` read path tolerates, and the
        next compaction removes them."""
        cols = [f.name for f in self.schemas[name].fields]
        df = df.select(*cols)
        if not self.dir:
            self.tables[name] = df.localCheckpoint(eager=True)
            return
        k = self._stage_seq.get((name, round_no), 0)
        self._stage_seq[(name, round_no)] = k + 1
        path = os.path.join(self.dir, name, f"round={round_no}__s{k}")
        df.write.mode("overwrite").parquet(path)  # materialize BEFORE retiring
        tdir = os.path.join(self.dir, name)
        for sub in os.listdir(tdir):
            full = os.path.join(tdir, sub)
            r = _round_of(sub)
            if full != path and r is not None and r <= round_no:
                self._pending_delete.append(full)
        self.tables[name] = self.spark.read.schema(self.schemas[name]).parquet(path)

    def commit_round(self, round_no: int, counters: dict[str, int]) -> None:
        self.completed_round = round_no
        self.counters = dict(counters)
        if not self.dir:
            return
        for name in self.schemas:
            tdir = os.path.join(self.dir, name)
            if os.path.isdir(tdir):
                for sub in os.listdir(tdir):
                    r = _round_of(sub)
                    if r is not None and r > round_no:
                        shutil.rmtree(os.path.join(tdir, sub))
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump({"completed_round": round_no, "counters": self.counters}, f)
        os.replace(tmp, self._manifest_path)  # atomic commit
        # only now is it safe to retire subdirs superseded by a
        # compact_rewrite earlier in this round (see its docstring)
        for full in self._pending_delete:
            shutil.rmtree(full, ignore_errors=True)
        self._pending_delete = []
