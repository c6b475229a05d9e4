"""Atomic per-round state checkpointing (Iceberg-shaped, parquet-manifest backed).

Semantics required by the north rule: every crawl round commits frontier /
seen-delta / fetch_log / metrics ATOMICALLY, and a killed run resumes from the
last committed round reproducing identical state (reference analog: the
filename seen-set makes re-runs idempotent, dags/common/base_source_dag.py:96,
107-114 + mode='failed').

The sandbox image has no Iceberg jars (guide §Sources), so the store is a thin
abstraction with the same commit semantics implemented on plain parquet:

    root/<table>/round=NNNNNN/*.parquet     # data, written FIRST
    root/_manifests/NNNNNN.json             # commit marker, renamed into place LAST

A round is committed iff its manifest exists; data directories without a
manifest are garbage from a killed run and are ignored (and cleaned on the next
commit attempt). `os.rename` within a directory is atomic on POSIX — the same
single-atomic-swap trick Iceberg uses with its metadata pointer. On a real
cluster, swap this class for Iceberg `writeTo(...).append()` + snapshot tags;
every caller goes through this interface, nothing else changes.

Tables are partitioned by round (directory) and data files are laid out by the
seen-set bucket column where applicable, so reads prune by round and joins can
reuse the bucket layout.

**Bucketed layout** (``bucket_spec``): tables named in ``bucket_spec`` —
``{table: (key_col, num_buckets)}`` — are written as BUCKETED metastore tables
(``bucketBy(n, key)`` + explicit ``path`` under the store root, so the data
files and the manifest commit point are exactly where they always were; only
the catalog entry is extra). This is the 100 TB steady-state answer to the
per-round frontier ∖ seen anti-join: when both sides carry the same
``HashPartitioning(key, n)`` bucket layout, the join needs ZERO exchanges —
each task reads its own bucket from both sides (Iceberg bucket-partition
transform analog). Catalog entries are re-created from manifest metadata on
read (``_ensure_registered``), so a resumed driver in a fresh session — whose
in-memory catalog is empty — sees the same bucketed tables.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from typing import Any

from pyspark.sql import DataFrame, SparkSession

def guard_union_partitioning(spark: SparkSession) -> None:
    """WRONG-RESULTS GUARD (upstream Spark 4.1.2), enforced at the library
    level so store reads are correct under ANY caller-built session, not only
    ``wcp.session.get_spark`` (which sets the same conf at build time).

    With ``spark.sql.unionOutputPartitioning=true`` (the upstream default), a
    Union of two co-bucketed table scans claims its children's
    HashPartitioning even though Union CONCATENATES partitions (key k lands in
    partition i AND n+i) — a downstream distinct/groupBy/latest-event
    resolution then elides its exchange (including an explicit
    ``repartition()``) and returns DUPLICATE rows. Every multi-round read of a
    bucketed store table unions such scans, so this must be off in the session
    executing those plans. The conf is runtime-settable; flipping it only
    removes an (incorrect) exchange elision, it never changes results of
    correct plans. Cost: one conf round-trip per call (sub-ms) — called once
    per store read entry point, not per row.
    """
    key = "spark.sql.unionOutputPartitioning"
    try:
        if spark.conf.get(key, "true") != "false":
            spark.conf.set(key, "false")
    except Exception:
        # conf unknown to this Spark build → the buggy claim doesn't exist
        pass


class StateStore:
    def __init__(self, root: str, bucket_spec: dict[str, tuple[str, int]] | None = None):
        self.root = root
        self.bucket_spec = bucket_spec or {}
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
        # catalog names must be unique per store root (tests run many stores
        # against one session) and survive nothing — the manifest carries the
        # DDL to re-register them anywhere
        self._prefix = "wcs_" + hashlib.md5(os.path.abspath(root).encode()).hexdigest()[:10]

    # --- bucketed-table plumbing ---

    def _tbl_name(self, table: str, round_id: int) -> str:
        return f"{self._prefix}_{table}_r{round_id:06d}"

    def _base_tbl_name(self, table: str, upto: int) -> str:
        return f"{self._prefix}_{table}_base_{upto:06d}"

    @staticmethod
    def _schema_ddl(df: DataFrame) -> str:
        return df._jdf.schema().toDDL()

    def _write_bucketed(self, df: DataFrame, table: str, path: str, tbl: str) -> dict[str, Any]:
        """Write `df` as a bucketed external table at `path`; returns the
        manifest metadata needed to re-register it in a fresh session.

        Callers own the partitioning: data already laid out as
        ``HashPartitioning(key, n)`` (repartition(n, key)) writes exactly one
        file per bucket — bucketBy uses the same murmur3+pmod id expression —
        while unpartitioned input writes up to tasks×n files (correct, just
        more files)."""
        col, n = self.bucket_spec[table]
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        if os.path.exists(path):
            shutil.rmtree(path)  # orphan from a killed run
        ddl = self._schema_ddl(df)
        # sortBy(key): with one file per bucket (callers repartition(n, key))
        # the scan exposes per-bucket ordering too, so the anti-join is a pure
        # streaming merge — no exchange AND no sort at read time
        (
            df.write.mode("overwrite")
            .option("path", path)
            .bucketBy(n, col)
            .sortBy(col)
            .saveAsTable(tbl)
        )
        return {"col": col, "n": n, "ddl": ddl}

    def _ensure_registered(
        self, spark: SparkSession, tbl: str, path: str, meta: dict[str, Any]
    ) -> None:
        """Re-create the catalog entry (fresh session after resume). The table
        is EXTERNAL (explicit LOCATION) — registration never touches data."""
        # every bucketed catalog read passes through here: the one choke point
        # where the union-partitioning wrong-results guard must hold
        guard_union_partitioning(spark)
        if spark.catalog.tableExists(tbl):
            return
        spark.sql(
            f"CREATE TABLE {tbl} ({meta['ddl']}) USING PARQUET "
            f"CLUSTERED BY ({meta['col']}) SORTED BY ({meta['col']}) INTO {meta['n']} BUCKETS "
            f"LOCATION '{path}'"
        )

    # --- manifest plumbing ---

    def _manifest_path(self, round_id: int) -> str:
        return os.path.join(self.root, "_manifests", f"{round_id:06d}.json")

    def _read_rounds(self, spark: SparkSession, table: str, paths: list[str]) -> DataFrame:
        """One multi-path scan over per-round dirs. basePath makes the scan a
        single job with directory-level pruning; the synthetic `round`
        partition column it adds is dropped so multi-round reads union
        cleanly with tier reads (which see no partition dir)."""
        return (
            spark.read.option("basePath", os.path.join(self.root, table))
            .parquet(*paths)
            .drop("round")
        )

    def committed_rounds(self) -> list[int]:
        d = os.path.join(self.root, "_manifests")
        return sorted(
            int(f[:-5]) for f in os.listdir(d) if f.endswith(".json") and f[:-5].isdigit()
        )

    def last_committed_round(self) -> int | None:
        r = self.committed_rounds()
        return r[-1] if r else None

    def manifest(self, round_id: int) -> dict[str, Any]:
        with open(self._manifest_path(round_id)) as f:
            return json.load(f)

    # --- write path ---

    def _table_round_dir(self, table: str, round_id: int) -> str:
        return os.path.join(self.root, table, f"round={round_id:06d}")

    def commit_round(
        self,
        round_id: int,
        tables: dict[str, DataFrame],
        extra_meta: dict[str, Any] | None = None,
    ) -> dict[str, Any]:
        """Write all tables for a round, then atomically publish the manifest.

        If the process dies mid-write, no manifest exists → the round never
        happened; rerunning the round overwrites the orphan directories.
        """
        if os.path.exists(self._manifest_path(round_id)):
            raise ValueError(f"round {round_id} already committed")
        # snapshot the layout registry BEFORE the commit point: after the
        # manifest rename a replay-seeded registry would already contain this
        # round's tables and first-seen registration would never fire
        layout = self._check_layout_drift(tables)
        from concurrent.futures import ThreadPoolExecutor

        bucket_meta: dict[str, dict[str, Any]] = {}

        def _write(item):
            name, df = item
            path = self._table_round_dir(name, round_id)
            if name in self.bucket_spec:
                bucket_meta[name] = self._write_bucketed(
                    df, name, path, self._tbl_name(name, round_id)
                )
                return
            if os.path.exists(path):
                shutil.rmtree(path)  # orphan from a killed run
            df.write.mode("overwrite").parquet(path)

        # independent output dirs → write concurrently (the scheduler overlaps
        # the jobs); the manifest rename below stays the single commit point,
        # so atomicity/resume semantics are unchanged. Width = every table at
        # once (≤8 per round): most round tables are tiny (metrics/run_report/
        # host_state) and their writes are job-LATENCY-bound, not
        # resource-bound — capping at 4 serialized two waves of latency
        # (guide §2.6 overlap-independent-jobs; measured ~1 s/round at bench
        # scale, and on a cluster the big writes' task tails backfill).
        with ThreadPoolExecutor(max_workers=min(8, max(1, len(tables)))) as ex:
            list(ex.map(_write, tables.items()))
        meta = {"round_id": round_id, "tables": sorted(tables), **(extra_meta or {})}
        if bucket_meta:
            meta["bucketed"] = bucket_meta
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "_manifests"), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.rename(tmp, self._manifest_path(round_id))  # the atomic commit point
        # record first-seen layouts AFTER the commit point (a killed write
        # must not register a layout for a round that never happened), using
        # the PRE-commit snapshot so newly-committed tables register
        changed = not os.path.exists(self._layout_path())
        for name in tables:
            if name not in layout:
                spec = self.bucket_spec.get(name)
                layout[name] = {"col": spec[0], "n": spec[1]} if spec else None
                changed = True
        if changed:
            self._save_layout(layout)
        return meta

    def _layout_path(self) -> str:
        return os.path.join(self.root, "_manifests", "_layout.json")

    def _load_layout(self) -> dict[str, Any]:
        """Store-level layout registry: table → {col, n} (bucketed) or None
        (plain), recorded the first time each table is committed. Stores
        written before this file existed are seeded by replaying every
        manifest oldest→newest (the newest mention of a table wins), so a
        table committed intermittently is still covered — the defect the
        last-manifest-only check had."""
        path = self._layout_path()
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        layout: dict[str, Any] = {}
        for r in self.committed_rounds():
            m = self.manifest(r)
            b = m.get("bucketed", {})
            for t in m.get("tables", []):
                layout[t] = {"col": b[t]["col"], "n": b[t]["n"]} if t in b else None
        return layout

    def _save_layout(self, layout: dict[str, Any]) -> None:
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "_manifests"), suffix=".ltmp")
        with os.fdopen(fd, "w") as f:
            json.dump(layout, f)
        os.rename(tmp, self._layout_path())

    def _check_layout_drift(self, tables: dict[str, DataFrame]) -> dict[str, Any]:
        """The bucket layout is STORE-INTRINSIC: a resume whose writer differs
        from the committed rounds — different (col, n), bucketing dropped, or
        bucketing newly added — would write new rounds in a mismatched layout.
        Reads stay CORRECT either way (each table re-registers with its own
        recorded spec) but every co-partitioned join silently regains its
        exchange. Refuse loudly, in BOTH directions, for EVERY table ever
        committed (the registry covers intermittently-committed tables too)."""
        layout = self._load_layout()
        if not layout:
            return layout
        for name in tables:
            if name not in layout:
                continue  # table is new to the store: any layout is fine
            old = layout[name]
            new = self.bucket_spec.get(name)
            if old is None and new is None:
                continue
            if old is None or new is None:
                was = "bucketed" if old is not None else "plain"
                now = "bucketed" if new is not None else "plain"
                raise ValueError(
                    f"{name}: store was committed {was} but this writer is "
                    f"{now} — bucket layout cannot change mid-store"
                )
            if (old["col"], old["n"]) != tuple(new):
                raise ValueError(
                    f"{name}: store was committed with bucket layout "
                    f"({old['col']}, {old['n']}) but this writer is configured "
                    f"for {tuple(new)} — bucket layout cannot change mid-store"
                )
        return layout

    # --- sketch sidecars (Iceberg-style puffin analog: bloom bytes per round) ---

    def save_bloom(self, round_id: int, data: bytes) -> None:
        """Persist the cumulative seen-set bloom alongside the round. Written
        after the manifest; a round whose bloom is missing (kill in between)
        falls back to a one-time rebuild from the seen-set — never wrong,
        because the bloom is an optimization tier only."""
        path = os.path.join(self.root, "_manifests", f"{round_id:06d}.bloom")
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "_manifests"), suffix=".btmp")
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.rename(tmp, path)

    def load_bloom(self, round_id: int) -> bytes | None:
        path = os.path.join(self.root, "_manifests", f"{round_id:06d}.bloom")
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return f.read()

    # --- compaction (Iceberg rewrite_data_files analog, LSM-tiered) ---
    #
    # read_all unions one directory per committed round; at round 10^4 every
    # seen-set scan would list 10^4 dirs and the bloom-rebuild fallback would
    # rescan all of them. compact() folds rounds into base TIERS with an
    # LSM-style size-tiered schedule:
    #
    #   MINOR fold (the common case): only the rounds since the newest tier
    #   are read and written into ONE new tier — O(K·delta) work, never a
    #   rewrite of the accumulated seen-set. At 10^10 rows, folding the whole
    #   base every K rounds would be an O(N) rewrite per fold (O(N·R/K) total
    #   write amplification over an R-round crawl) — the naive single-base
    #   scheme's hidden scale killer.
    #   MAJOR fold: when the tier count would exceed ``max_tiers``, all tiers
    #   + new deltas merge into one tier — amortized, classic size-tiering.
    #
    # Read amplification stays bounded: read_all / read_parts list at most
    # max_tiers tier dirs + the ≤K un-folded round dirs. The pointer file
    # carries the whole tier list and swaps atomically, so a kill
    # mid-compaction leaves the previous tier set intact. Old round dirs are
    # left in place (read_round/audit still work) — vacuum_compacted()
    # reclaims them.

    def _base_pointer_path(self, table: str) -> str:
        return os.path.join(self.root, "_manifests", f"{table}.base.json")

    def tiers(self, table: str) -> list[dict[str, Any]]:
        """Base tiers, oldest→newest. Legacy single-base pointers read as one
        tier — stores written by earlier versions keep working unchanged."""
        path = self._base_pointer_path(table)
        if not os.path.exists(path):
            return []
        with open(path) as f:
            data = json.load(f)
        return data["tiers"] if "tiers" in data else [data]

    def base_upto(self, table: str) -> int | None:
        t = self.tiers(table)
        return t[-1]["upto"] if t else None

    def _base_dir(self, table: str, upto: int) -> str:
        return os.path.join(self.root, f"{table}__base", f"upto={upto:06d}")

    @staticmethod
    def _dir_has_rows(d: str) -> bool:
        return os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d))

    def compact(
        self,
        spark: SparkSession,
        table: str,
        up_to: int | None = None,
        num_buckets: int | None = None,
        bucket_col: str = "bucket",
        max_tiers: int = 4,
        resolver=None,
    ) -> int | None:
        """Fold the rounds since the newest tier into a base tier (minor), or
        everything into one tier when ``max_tiers`` would be exceeded (major);
        atomic pointer swap either way. Returns the new tier's upto round, or
        None if there is nothing to fold.

        ``resolver``: optional callable applied to the folded union before
        writing — for EVENT-LOG tables (e.g. the crawl's ``frontier_log``)
        whose fold must resolve per-key latest state rather than concatenate
        rows. Called as ``resolver(df, terminal)`` when its signature takes
        two parameters (``resolver(df)`` otherwise, for older callers):
        ``terminal=True`` means the fold output becomes the OLDEST tier
        (major fold, or the store's first tier) — no older layer exists that
        a tombstone could still target, so the resolver may drop tombstones.
        A non-terminal MINOR fold resolves only its own window and must KEEP
        tombstone rows (they shadow keys living in older tiers); readers
        chain tiers newest-over-oldest (each tier's keys shadow older tiers)
        and filter tombstones last — fold cost is O(window churn), never a
        rewrite of the accumulated live set."""
        cur = self.tiers(table)
        floor = cur[-1]["upto"] if cur else -1
        new_rounds = [
            r
            for r in self.committed_rounds()
            if (up_to is None or r <= up_to) and r > floor and self._round_has_rows(table, r)
        ]
        if not new_rounds:
            return None
        upto = max(new_rounds)
        major = len(cur) + 1 > max_tiers
        if major:
            df = self.read_all(spark, table, up_to=upto)  # all tiers + new deltas
        else:
            paths = [self._table_round_dir(table, r) for r in new_rounds]
            df = self._read_rounds(spark, table, paths)
        if resolver is not None:
            import inspect

            try:
                n_params = len(inspect.signature(resolver).parameters)
            except (TypeError, ValueError):
                # uninspectable callable (C-implemented, odd partials): these
                # are exactly the legacy 1-param callers the fallback exists
                # for — every 2-param resolver in this codebase is a plain
                # Python function whose signature inspects fine
                n_params = 1
            terminal = major or not cur  # fold output has no tier beneath it
            df = resolver(df, terminal) if n_params >= 2 else resolver(df)
        new_dir = self._base_dir(table, upto)
        tier: dict[str, Any] = {"upto": upto}
        if table in self.bucket_spec:
            # every tier carries the bucketed seen-set layout: one repartition
            # on the key per fold buys every subsequent round a shuffle-free
            # anti-join against it
            col, n = self.bucket_spec[table]
            tier.update(
                self._write_bucketed(
                    df.repartition(n, col), table, new_dir, self._base_tbl_name(table, upto)
                )
            )
        else:
            if num_buckets and bucket_col in df.columns:
                df = df.repartition(num_buckets, bucket_col)  # keep the join layout
            if os.path.exists(new_dir):
                shutil.rmtree(new_dir)
            df.write.mode("overwrite").parquet(new_dir)
        new_tiers = [tier] if major else [*cur, tier]
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "_manifests"), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"table": table, "tiers": new_tiers}, f)
        os.rename(tmp, self._base_pointer_path(table))  # atomic publish
        if major:  # superseded tiers: reclaim dirs + catalog entries
            for t in cur:
                d = self._base_dir(table, t["upto"])
                if os.path.exists(d):
                    shutil.rmtree(d)
                if table in self.bucket_spec:
                    spark.sql(f"DROP TABLE IF EXISTS {self._base_tbl_name(table, t['upto'])}")
        return upto

    def vacuum_compacted(self, table: str, spark: SparkSession | None = None) -> int:
        """Delete per-round dirs already folded into the base. Irreversible
        for per-round history: read_round on a folded round and
        read_all(up_to < base) raise afterwards (read_all at or past the base
        is unaffected — the base carries every folded row). Pass ``spark`` to
        also drop the folded rounds' catalog entries (bucketed tables).

        Also reaps ORPHAN tier dirs: a kill between a major fold's pointer
        publish and its cleanup loop leaves the superseded tier dirs on disk
        with nothing referencing them (the new pointer no longer lists them,
        so no later fold's cleanup ever sees them). Safe by the store's
        single-writer contract — compact and vacuum never run concurrently,
        so an unreferenced ``upto=`` dir is always a leftover, never a tier
        mid-write."""
        upto = self.base_upto(table)
        if upto is None:
            return 0
        n = 0
        for r in self.committed_rounds():
            d = self._table_round_dir(table, r)
            if r <= upto and os.path.exists(d):
                shutil.rmtree(d)
                n += 1
                if spark is not None and table in self.bucket_spec:
                    spark.sql(f"DROP TABLE IF EXISTS {self._tbl_name(table, r)}")
        live = {t["upto"] for t in self.tiers(table)}
        base_root = os.path.join(self.root, f"{table}__base")
        if os.path.isdir(base_root):
            for name in os.listdir(base_root):
                if not name.startswith("upto="):
                    continue
                try:
                    tier_upto = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                if tier_upto in live:
                    continue
                shutil.rmtree(os.path.join(base_root, name), ignore_errors=True)
                n += 1
                if spark is not None and table in self.bucket_spec:
                    spark.sql(
                        f"DROP TABLE IF EXISTS {self._base_tbl_name(table, tier_upto)}"
                    )
        return n

    def drop_round_table(self, table: str, round_id: int, spark: SparkSession | None = None) -> bool:
        """Delete ONE committed round's table dir (retention for superseded
        snapshot tables, e.g. pagerank_scores — only the newest is ever
        read). The manifest is untouched: ``has_table`` turns False (it
        requires the dir), so readers that probe before reading skip the
        round cleanly; ``read_round`` on it would raise, same as after
        ``vacuum_compacted``. Returns True iff a dir was removed."""
        d = self._table_round_dir(table, round_id)
        if not os.path.exists(d):
            return False
        shutil.rmtree(d)
        if spark is not None and table in self.bucket_spec:
            spark.sql(f"DROP TABLE IF EXISTS {self._tbl_name(table, round_id)}")
        return True

    # --- read path (only committed rounds are visible) ---

    def has_table(self, table: str, round_id: int) -> bool:
        """True iff `round_id` is committed AND wrote this table (older stores
        may predate a table's existence)."""
        return os.path.exists(self._manifest_path(round_id)) and os.path.exists(
            self._table_round_dir(table, round_id)
        )

    def read_round(self, spark: SparkSession, table: str, round_id: int) -> DataFrame:
        """Bucketed tables come back as catalog reads (``spark.table``) so the
        scan exposes its HashPartitioning to joins; plain tables as parquet."""
        if not os.path.exists(self._manifest_path(round_id)):
            raise ValueError(f"round {round_id} is not committed")
        bmeta = self.manifest(round_id).get("bucketed", {}).get(table)
        if table in self.bucket_spec and bmeta is not None:
            tbl = self._tbl_name(table, round_id)
            self._ensure_registered(spark, tbl, self._table_round_dir(table, round_id), bmeta)
            return spark.table(tbl)
        return spark.read.parquet(self._table_round_dir(table, round_id))

    def read_parts(
        self, spark: SparkSession, table: str, up_to: int | None = None
    ) -> tuple[list[DataFrame], list[DataFrame]]:
        """Layout-aware split read: ([base tiers, oldest→newest],
        [per-round deltas]).

        For bucketed tables every part is a catalog read carrying the bucket
        layout, so a caller can CHAIN anti-joins against each tier then each
        delta with zero exchanges (a union would erase the partitioning —
        Spark's Union node reports unknown output partitioning even over
        co-bucketed children). For plain tables: per-tier dir reads + ONE
        multi-path delta scan (same data `read_all` returns, split at the
        compaction floor). Part count is bounded: ≤ max_tiers + K.
        """
        rounds = self.committed_rounds()
        if up_to is not None:
            rounds = [r for r in rounds if r <= up_to]
        usable = [t for t in self.tiers(table) if up_to is None or t["upto"] <= up_to]
        floor = usable[-1]["upto"] if usable else -1
        # same reconstructability contract as read_all: a round past the
        # usable tiers whose manifest says it wrote this table but whose dir
        # is gone was folded into a deeper tier and vacuumed — returning an
        # INCOMPLETE seen-set silently would re-schedule already-fetched URLs
        missing = [
            r
            for r in rounds
            if r > floor
            and table in self.manifest(r).get("tables", [])
            and not os.path.exists(self._table_round_dir(table, r))
        ]
        if missing:
            raise ValueError(
                f"{table}: rounds {missing} were compacted into a tier beyond "
                f"up_to={up_to} and vacuumed; read_parts cannot reconstruct history"
            )
        bases = []
        for t in usable:
            d = self._base_dir(table, t["upto"])
            if not self._dir_has_rows(d):
                continue  # tier folded only empty rounds
            if table in self.bucket_spec:
                tbl = self._base_tbl_name(table, t["upto"])
                self._ensure_registered(spark, tbl, d, t)
                bases.append(spark.table(tbl).drop("round"))
            else:
                bases.append(spark.read.parquet(d).drop("round"))
        delta_rounds = [r for r in rounds if r > floor and self._round_has_rows(table, r)]
        if table in self.bucket_spec:
            deltas = [self.read_round(spark, table, r) for r in delta_rounds]
        else:
            paths = [self._table_round_dir(table, r) for r in delta_rounds]
            deltas = (
                [self._read_rounds(spark, table, paths)]
                if paths
                else []
            )
        return bases, deltas

    def _round_has_rows(self, table: str, round_id: int) -> bool:
        """True iff the round wrote this table with ≥1 data file (bucketed
        writes of an EMPTY DataFrame emit no files at all)."""
        d = self._table_round_dir(table, round_id)
        return os.path.exists(d) and any(f.endswith(".parquet") for f in os.listdir(d))

    def read_all(self, spark: SparkSession, table: str, up_to: int | None = None) -> DataFrame | None:
        """Union of a table across all committed rounds (e.g. the full seen-set).

        Compaction-aware: reads the base tiers whose upto ≤ requested plus
        only the round deltas after them — ≤ max_tiers + K paths, not
        O(rounds). Deltas go through one multi-path parquet scan → a single
        job with partition pruning by directory, not N sequential reads.
        A historical read (up_to below the newest tier) uses the largest
        usable tier prefix and the surviving round dirs; it raises if the
        needed rounds were folded deeper and vacuumed.
        """
        rounds = self.committed_rounds()
        if up_to is not None:
            rounds = [r for r in rounds if r <= up_to]
        usable = [t for t in self.tiers(table) if up_to is None or t["upto"] <= up_to]
        floor = usable[-1]["upto"] if usable else -1
        # rounds past the usable tiers must still have their dirs — but only
        # rounds whose MANIFEST says they wrote this table (a round that never
        # wrote it legitimately has no dir; a vacuumed one did and doesn't)
        missing = [
            r
            for r in rounds
            if r > floor
            and table in self.manifest(r).get("tables", [])
            and not os.path.exists(self._table_round_dir(table, r))
        ]
        if missing:
            raise ValueError(
                f"{table}: rounds {missing} were compacted into a tier beyond "
                f"up_to={up_to} and vacuumed; read_all cannot reconstruct history"
            )
        parts = [
            # tiers compacted by earlier versions baked the synthetic `round`
            # partition column into their files — drop it (no-op otherwise)
            # so tier ∪ delta unions line up on every store vintage
            spark.read.parquet(self._base_dir(table, t["upto"])).drop("round")
            for t in usable
            if self._dir_has_rows(self._base_dir(table, t["upto"]))
        ]
        paths = [
            self._table_round_dir(table, r)
            for r in rounds
            if r > floor and self._round_has_rows(table, r)
        ]
        if paths:
            parts.append(
                self._read_rounds(spark, table, paths)
            )
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
