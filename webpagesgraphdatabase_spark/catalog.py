"""Warehouse catalog: named Parquet tables with versioned overwrite.

Plays the role of the reference's embedded Kùzu database directory
(``main.py:16``, ``Edits.ipynb c9:8``): S11 introspection
(``CALL show_tables()``) → :meth:`Warehouse.list_tables`; S12
create-if-absent DDL → :meth:`Warehouse.create_table`.

Mutations in Spark are table-rewrite jobs, and Spark cannot overwrite a
path it is currently reading — so each table is a directory of
immutable version subdirs plus a ``_CURRENT`` pointer file::

    warehouse/links/v00000001/part-*.parquet
    warehouse/links/v00000002/part-*.parquet
    warehouse/links/_CURRENT        # contains "v00000002"

Writers produce a new version dir then atomically flip the pointer
(write temp + ``os.replace``); readers resolve the pointer at plan
time. This gives snapshot isolation for readers and makes every write
a safe read-modify-write — the same pattern Delta/Iceberg use with a
full transaction log; a pointer file is the minimum that preserves the
reference's single-writer semantics (the Flask app serializes writes
through one process too). At 100 TB each version write is a distributed
parquet job; old versions are pruned with :meth:`vacuum`.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_POINTER = "_CURRENT"
_META = "_META.json"
#: leading underscore: Spark's file index skips _-prefixed names, so a
#: zone-map manifest can live inside the data dir it describes
ZONEMAP_NAME = "_zonemap.json"


def zonemap_file_stats(df: DataFrame, cols: tuple[str, ...]) -> dict:
    """Per-data-file ``{file: {n_rows, col: [min, max], ...}}`` stats
    for the files behind ``df`` — one scan with a per-file partial
    aggregation, the manifest is n_files-sized. Shared by the batch
    :meth:`Warehouse.write_zonemap` and the streaming maintainer
    (``streaming.jobs.run_to_parquet_with_zonemap``), so the two can
    never disagree on how stats are derived."""
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    rows = (
        df.select(F.input_file_name().alias("_file"), *cols)
        .groupBy("_file")
        .agg(*aggs)
        .collect()
    )
    files = {}
    for r in rows:
        fname = r["_file"]
        if fname.startswith("file:"):
            fname = fname[len("file:") :]
        files[fname] = {
            "n_rows": r["n_rows"],
            **{c: [r[f"min_{c}"], r[f"max_{c}"]] for c in cols},
        }
    return files


def zonemap_surviving_files(manifest: dict, ranges: dict) -> list[str]:
    """Manifest files whose [min, max] interval intersects every
    requested range — the files a pruned read must scan. Stats are a
    pruning hint, never a correctness filter: untracked columns and
    all-null stats keep the file.

    Manifests round-trip JSON, so timestamp/date stats arrive as their
    ``str()`` serialization ("YYYY-MM-DD[ HH:MM:SS]"), which sorts
    chronologically — datetime/date bounds are normalized into that
    domain before comparing, never compared cross-type."""
    import datetime as _dt

    tracked = set(manifest["columns"])

    def norm(bound, stat):
        # JSON stringified the stat; compare the bound in the same
        # (chronologically-ordered) string domain
        if isinstance(bound, (_dt.datetime, _dt.date)) and isinstance(
            stat, str
        ):
            return str(bound)
        return bound

    def survives(st: dict) -> bool:
        for c, (lo, hi) in ranges.items():
            if c not in tracked or c not in st:
                continue
            mn, mx = st[c]
            if mn is None or mx is None:
                continue  # all-null file: never prunable by range
            if lo is not None and mx < norm(lo, mx):
                return False
            if hi is not None and mn > norm(hi, mn):
                return False
        return True

    return [f for f, st in manifest["files"].items() if survives(st)]


def zonemap_range_predicate(ranges: dict):
    """The row-level predicate a pruned read still applies to surviving
    files (pruning skips provably-empty files; it never filters rows)."""
    pred = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            pred = pred & (F.col(c) >= F.lit(lo))
        if hi is not None:
            pred = pred & (F.col(c) <= F.lit(hi))
    return pred


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a few-split table read across the cores — the
    operators/_util.spread discipline, duplicated here because catalog
    is a lower layer than the operators package. A compacted table is
    often ONE file = one input split, which would serialize every
    derived pass of a maintenance rewrite (quantile probe, bounds
    sample, range sampling, the rewrite itself) on one core."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


class TableNotFoundError(KeyError):
    pass


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- S11: catalog introspection -------------------------------------
    def list_tables(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isfile(os.path.join(self.root, d, _POINTER))
        )

    def exists(self, name: str) -> bool:
        return os.path.isfile(os.path.join(self.root, name, _POINTER))

    # -- S12: create-if-absent DDL ---------------------------------------
    def create_table(
        self,
        name: str,
        schema: T.StructType,
        partition_by: tuple[str, ...] = (),
    ) -> None:
        """CREATE TABLE IF NOT EXISTS semantics (reference ``main.py:20-24``):
        registers an empty versioned table with the given schema.

        ``partition_by`` declares hive-style partition columns recorded in
        table metadata and applied on every subsequent ``overwrite`` —
        equality filters on them prune whole directories at plan time
        (PartitionFilters in ``.explain``), the on-disk analog of an
        index for the key-dimension scans this engine serves.

        Pure metadata operation — no Spark job: the schema goes into
        ``_META.json``, the initial version is an empty directory, and
        reads resolve the declared schema (DDL should cost milliseconds,
        not a distributed write of zero rows)."""
        if self.exists(name):
            return
        missing = set(partition_by) - set(schema.fieldNames())
        if missing:
            raise ValueError(f"partition columns not in schema: {sorted(missing)}")
        tdir = os.path.join(self.root, name)
        version = "v00000001"
        os.makedirs(os.path.join(tdir, version), exist_ok=True)
        with open(os.path.join(tdir, _META), "w") as f:
            json.dump(
                {"partition_by": list(partition_by), "schema": schema.jsonValue()},
                f,
            )
        tmp = os.path.join(tdir, _POINTER + ".tmp")
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, os.path.join(tdir, _POINTER))

    def _meta(self, name: str) -> dict:
        meta = os.path.join(self.root, name, _META)
        if not os.path.isfile(meta):
            return {}
        with open(meta) as f:
            return json.load(f)

    def partition_spec(self, name: str) -> tuple[str, ...]:
        return tuple(self._meta(name).get("partition_by", ()))

    # -- read / write -----------------------------------------------------
    def _current_version(self, name: str) -> str:
        ptr = os.path.join(self.root, name, _POINTER)
        if not os.path.isfile(ptr):
            raise TableNotFoundError(name)
        with open(ptr) as f:
            return f.read().strip()

    def read(self, name: str) -> DataFrame:
        version = self._current_version(name)
        path = os.path.join(self.root, name, version)
        return self._read_path(name, path)

    def _read_path(self, name: str, path: str) -> DataFrame:
        ver = os.path.basename(path.rstrip("/"))
        ver_num = int(ver[1:]) if ver.startswith("v") else None
        return self._read_files(name, [path], ver_num)

    def _read_files(
        self, name: str, paths: list[str], ver_num: int | None
    ) -> DataFrame:
        meta = self._meta(name)
        if "schema" not in meta:
            return self.spark.read.parquet(*paths)
        declared = T.StructType.fromJson(meta["schema"])
        df = self.spark.read.schema(declared).parquet(*paths)
        # schema evolution: a version written BEFORE the column was
        # added lacks it physically -> parquet yields nulls, and the
        # recorded default fills them (initial-default semantics, no
        # rewrite of old versions). Versions written at-or-after the
        # evolution carry the column physically, so an explicit NULL
        # written there must read back as NULL — the default is gated
        # on the version under read, matching Delta/Iceberg add-column
        # semantics (r5 advice: ungated coalesce made explicit NULLs
        # indistinguishable from absent values, and compact() then
        # baked the defaults into data).
        defaults = meta.get("defaults", {})
        if defaults:
            fill = {}
            for c, d in defaults.items():
                if isinstance(d, dict):
                    if ver_num is None or ver_num < d.get("since", 0):
                        fill[c] = d["value"]
                else:  # legacy unversioned default: apply everywhere
                    fill[c] = d
            if fill:
                df = df.select(
                    *[
                        F.coalesce(F.col(c), F.lit(fill[c])).alias(c)
                        if c in fill
                        else F.col(c)
                        for c in df.columns
                    ]
                )
        return df

    def list_versions(self, name: str) -> list[int]:
        """All retained versions of a table, oldest first."""
        self._current_version(name)  # existence check
        tdir = os.path.join(self.root, name)
        return sorted(
            int(d[1:]) for d in os.listdir(tdir) if d.startswith("v")
        )

    def read_version(self, name: str, version: int) -> DataFrame:
        """Time travel: read a specific retained version (every
        ``overwrite`` keeps the previous snapshot until ``vacuum``)."""
        path = os.path.join(self.root, name, f"v{version:08d}")
        if not os.path.isdir(path):
            raise TableNotFoundError(f"{name}@v{version}")
        return self._read_path(name, path)

    def overwrite(self, name: str, df: DataFrame) -> None:
        """Write a new version dir, then atomically flip ``_CURRENT``."""
        tdir = os.path.join(self.root, name)
        os.makedirs(tdir, exist_ok=True)
        try:
            cur = int(self._current_version(name)[1:])
        except TableNotFoundError:
            cur = 0
        version = f"v{cur + 1:08d}"
        writer = df.write.mode("overwrite")
        spec = self.partition_spec(name)
        if spec:
            writer = writer.partitionBy(*spec)
        writer.parquet(os.path.join(tdir, version))
        tmp = os.path.join(tdir, _POINTER + ".tmp")
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, os.path.join(tdir, _POINTER))

    def drop_table(self, name: str) -> None:
        tdir = os.path.join(self.root, name)
        if os.path.isdir(tdir):
            shutil.rmtree(tdir)

    def drop_all(self) -> None:
        """M6 destructive re-init (reference ``c9:11-17`` rmtree)."""
        if os.path.isdir(self.root):
            shutil.rmtree(self.root)
        os.makedirs(self.root, exist_ok=True)

    def vacuum(self, name: str, keep: int = 1) -> None:
        """Drop all but the newest ``keep`` version dirs."""
        tdir = os.path.join(self.root, name)
        current = self._current_version(name)
        versions = sorted(d for d in os.listdir(tdir) if d.startswith("v"))
        for v in versions[:-keep] if keep else versions:
            if v != current:
                shutil.rmtree(os.path.join(tdir, v))

    def add_column(self, name: str, col: str, ddl_type: str, default=None) -> None:
        """Schema evolution without data rewrite: append ``col`` to the
        declared schema. Existing version files simply lack the column
        — the declared-schema parquet read yields nulls for them, and
        ``default`` (recorded in table metadata) is applied lazily at
        read time, so evolving a 100 TB table is a metadata write, not
        a rewrite job. New writes carry the column physically; the
        default fills only versions written *before* the evolution
        (recorded with the default), so an explicit NULL written after
        evolution reads back as NULL — the Delta/Iceberg initial-default
        semantics, pointer-file style."""
        meta = self._meta(name)
        if "schema" not in meta:
            raise TableNotFoundError(name)
        schema = T.StructType.fromJson(meta["schema"])
        if col in schema.fieldNames():
            raise ValueError(f"column {col!r} already exists on {name}")
        new_type = self.spark.createDataFrame([], f"`{col}` {ddl_type}").schema[0].dataType
        schema = schema.add(T.StructField(col, new_type))
        meta["schema"] = schema.jsonValue()
        if default is not None:
            # gate the default on the evolution point: versions strictly
            # before `since` predate the column (fill with the default);
            # `since` onward carry it physically (explicit NULLs survive)
            since = int(self._current_version(name)[1:]) + 1
            meta.setdefault("defaults", {})[col] = {
                "value": default,
                "since": since,
            }
        with open(os.path.join(self.root, name, _META), "w") as f:
            json.dump(meta, f)

    # -- maintenance -------------------------------------------------------

    def file_stats(self, name: str) -> dict:
        """Data-file census of the current version: {n_files,
        total_bytes, min_bytes, max_bytes} — the observability half of
        :meth:`compact` (small-file detection is a stats read, not a
        table scan)."""
        tdir = os.path.join(self.root, name, self._current_version(name))
        sizes = []
        for dirpath, _dirs, files in os.walk(tdir):
            sizes.extend(
                os.path.getsize(os.path.join(dirpath, f))
                for f in files
                if f.endswith(".parquet")
            )
        return {
            "n_files": len(sizes),
            "total_bytes": sum(sizes),
            "min_bytes": min(sizes, default=0),
            "max_bytes": max(sizes, default=0),
        }

    def compact(self, name: str, target_file_bytes: int = 128 * 1024 * 1024) -> dict:
        """Small-file compaction: rewrite the current version with file
        count sized so each output file approaches ``target_file_bytes``
        (the HDFS-block-ish sweet spot; thousands of KB-sized files are
        the classic accumulated-upsert pathology — every query pays
        per-file open/footer cost and the driver pays listing time).

        One distributed read → repartition → versioned overwrite; the
        pointer flip keeps concurrent readers on the old version until
        the rewrite completes (same isolation as any mutation). For
        partitioned tables the repartition keys on the partition spec so
        each hive partition's rows land together instead of every task
        writing a sliver into every partition. Returns before/after
        file stats."""
        before = self.file_stats(name)
        df = self.read(name)
        n_files = max(1, round(before["total_bytes"] / target_file_bytes))
        spec = self.partition_spec(name)
        if spec:
            compacted = df.repartition(n_files, *[F.col(c) for c in spec])
        else:
            compacted = df.repartition(n_files)
        self.overwrite(name, compacted)
        after = self.file_stats(name)
        return {"before": before, "after": after, "target_files": n_files}

    def cluster(
        self,
        name: str,
        cols: tuple[str, ...],
        target_file_bytes: int = 128 * 1024 * 1024,
        bits: int = 8,
    ) -> dict:
        """Z-order clustering rewrite (Delta's OPTIMIZE ZORDER BY, the
        lakehouse answer to "queries filter on BOTH user and time"):
        map each clustering column to a ``bits``-bit quantile rank,
        interleave the rank bits into one z-value, range-partition and
        sort the rewrite on it. Rows close in EVERY clustering
        dimension land in the same files, so a conjunctive range
        predicate touches a small file subset (and few parquet row
        groups within them) instead of striping across all of them —
        min/max stats become selective on every clustered column at
        once, which a plain sort gives only to its leading column.

        Scale shape: one ``approxQuantile`` pass (numeric columns,
        batched) plus one bounded top-S-by-hash sample per string
        column sizes the rank boundaries on the driver (≤ a few
        thousand values each — corpus-free); the z-value itself is a
        codegen fold over broadcast-literal boundary arrays (no window,
        no global sort — the rewrite's ``repartitionByRange`` samples
        the z-values like any range write). Versioned overwrite, same
        isolation as every mutation.

        Column types: numeric, timestamp/date (cast to epoch), and
        string. String ranks use sampled boundary *strings* in raw
        string order — range locality, the order zone maps prune on —
        via a uniform row sample taken as top-S by a row-salted
        xxhash64 (TakeOrdered, never a global sort). Any other type
        raises up front — quantile ranks need an order that min/max
        stats preserve. Returns before/after file stats.
        """
        if not 1 <= len(cols) <= 4:
            raise ValueError("cluster needs 1-4 clustering columns")
        before = self.file_stats(name)
        # spread: the usual input is the compacted table = 1-2 files,
        # whose single splits would run every pass below on one core
        df = _spread(self.read(name))
        n_buckets = 1 << bits
        dtypes = dict(df.dtypes)
        num_re = re.compile(
            r"^(tinyint|smallint|int|bigint|float|double|boolean|decimal.*)$"
        )
        exprs: dict[str, tuple[str, object]] = {}
        for c in cols:
            dt = dtypes.get(c)
            if dt is None:
                raise ValueError(f"no column {c!r} in table {name!r}")
            if dt in ("timestamp", "timestamp_ntz", "date"):
                exprs[c] = ("num", F.col(c).cast("timestamp").cast("double"))
            elif num_re.match(dt):
                exprs[c] = ("num", F.col(c).cast("double"))
            elif dt == "string":
                exprs[c] = ("str", F.col(c))
            else:
                raise ValueError(
                    f"cluster needs numeric/timestamp/date/string "
                    f"columns; {c!r} is {dt}"
                )
        qs = [i / float(n_buckets) for i in range(1, n_buckets)]
        num_cols = [c for c in cols if exprs[c][0] == "num"]
        num_bounds: dict[str, list] = {}
        if num_cols:
            probe = df.select(
                *[exprs[c][1].alias(f"_zc_{i}") for i, c in enumerate(num_cols)]
            )
            got = probe.approxQuantile(
                [f"_zc_{i}" for i in range(len(num_cols))], qs, 0.001
            )
            num_bounds = dict(zip(num_cols, got))

        def _string_bounds(c: str) -> list[str]:
            # uniform row sample without a count pass: top-S by a
            # row-salted hash is per-partition top-S + driver merge
            # (TakeOrderedAndProject), bounded at S rows regardless of
            # table size; boundary strings are then every S/n_buckets-th
            # value of the sorted sample
            s_size = n_buckets * 64
            sample = sorted(
                r[0]
                for r in df.select(F.col(c))
                .where(F.col(c).isNotNull())
                .orderBy(F.xxhash64(F.col(c), F.monotonically_increasing_id()))
                .limit(s_size)
                .collect()
            )
            if not sample:
                return []
            step = len(sample) / float(n_buckets)
            return [sample[int(i * step)] for i in range(1, n_buckets)]

        def _rank(barr, vcol):
            # single-arg lambda: F.filter dispatches on arity, so the
            # value column must come in by closure, not a default param
            return F.size(F.filter(barr, lambda b: b <= vcol))

        rank_cols = []
        for c in cols:
            kind, expr = exprs[c]
            if kind == "num":
                barr = F.array(*[F.lit(float(b)) for b in num_bounds[c]])
            else:
                sbounds = _string_bounds(c)
                if sbounds:
                    barr = F.array(*[F.lit(b) for b in sbounds])
                else:  # all-null column: every row ranks 0
                    barr = F.array().cast("array<string>")
            rank_cols.append(_rank(barr, expr))
        z = F.lit(0).cast("long")
        for bit in range(bits):
            for i in range(len(cols)):
                z = z.bitwiseOR(
                    F.shiftleft(
                        F.shiftright(rank_cols[i], bit).bitwiseAND(F.lit(1)),
                        bit * len(cols) + i,
                    ).cast("long")
                )
        n_files = max(1, round(before["total_bytes"] / target_file_bytes))
        # persist the z-augmented frame for the rewrite's duration
        # (released in the finally): the range exchange's boundary
        # sampling executes its child in full, so without the persist
        # the rank folds above are evaluated over every row TWICE —
        # once by the sampler, once by the shuffle write. The cache is
        # one table copy (MEMORY_AND_DISK, spills), the same order as
        # the rewrite's own shuffle — the build-scoped-persist
        # discipline of the index builds.
        zdf = df.withColumn("_zvalue", z).persist()
        try:
            zdf.count()  # materialize so both consumers read computed z
            clustered = (
                zdf.repartitionByRange(n_files, F.col("_zvalue"))
                .sortWithinPartitions("_zvalue")
                .drop("_zvalue")
            )
            self.overwrite(name, clustered)
        finally:
            zdf.unpersist()
        after = self.file_stats(name)
        return {"before": before, "after": after, "target_files": n_files}

    #: leading underscore: Spark's file index skips _-prefixed names,
    #: so the manifest can live inside the version dir it describes
    _ZONEMAP = ZONEMAP_NAME

    def write_zonemap(self, name: str, cols: tuple[str, ...]) -> dict:
        """Per-file min/max statistics (zone maps — Netezza's term;
        Delta/Iceberg file stats, Parquet row-group stats one level up)
        for the CURRENT version: one manifest JSON in the version dir
        mapping each data file to {min, max, n_rows} per tracked
        column. One scan with a per-file partial aggregation — the
        manifest is n_files-sized, driver-trivial. Numeric and string
        columns only (min/max must serialize to JSON and compare the
        way the data compares). Pairs with :meth:`cluster`: z-ordered
        files have tight ranges on every clustered column, which is
        what makes these stats selective."""
        version = self._current_version(name)
        vdir = os.path.join(self.root, name, version)
        df = self._read_path(name, vdir)
        files = zonemap_file_stats(df, cols)
        manifest = {"version": version, "columns": list(cols), "files": files}
        with open(os.path.join(vdir, self._ZONEMAP), "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        return manifest

    def read_pruned(
        self, name: str, ranges: dict[str, tuple]
    ) -> DataFrame:
        """Zone-map-pruned scan: read only the data files whose
        [min, max] interval intersects every requested range, then
        apply the predicate to the surviving rows — always
        row-equivalent to ``read(name).filter(...)``; the manifest
        only skips files that provably contain no match. ``ranges``
        maps column → (lower, upper), either bound None for open.
        Files missing from the manifest (or columns not tracked) are
        read unconditionally — stats are a pruning hint, never a
        correctness filter. Raises if no zone map exists for the
        current version (call :meth:`write_zonemap` after the write
        that created it)."""
        version = self._current_version(name)
        vdir = os.path.join(self.root, name, version)
        mpath = os.path.join(vdir, self._ZONEMAP)
        if not os.path.isfile(mpath):
            raise FileNotFoundError(
                f"no zone map for {name}@{version}; run write_zonemap first"
            )
        with open(mpath) as f:
            manifest = json.load(f)
        keep = zonemap_surviving_files(manifest, ranges)
        ver_num = int(version[1:])
        if not keep:
            df = self._read_path(name, vdir).limit(0)
        else:
            df = self._read_files(name, keep, ver_num)
        return df.filter(zonemap_range_predicate(ranges))

    def diff(
        self, name: str, v_from: int, v_to: int, key: str | None = None
    ) -> DataFrame:
        """Change-data-capture between two table versions: what a
        downstream consumer must apply to move from ``v_from`` to
        ``v_to``. With ``key`` set, rows are matched by key:
        ``op ∈ {insert, delete, update}`` (update = key present in both
        with any non-key column changed). Without a key, set semantics:
        ``insert``/``delete`` via ``exceptAll`` both ways.

        The versioned layout makes this a pure read — both versions are
        immutable directories, so CDC needs no transaction log, just
        two scans and a join/except on the consumer's schedule (the
        snapshot-diff pattern; Delta/Iceberg incremental reads solve
        the same problem with manifests). Cost: one shuffle on ``key``
        (or the full row for the set form)."""
        old = self.read_version(name, v_from)
        new = self.read_version(name, v_to)
        if key is None:
            ins = new.exceptAll(old).select(F.lit("insert").alias("op"), "*")
            dele = old.exceptAll(new).select(F.lit("delete").alias("op"), "*")
            return ins.unionByName(dele)
        cols = [c for c in new.columns if c != key]
        o = old.select(key, F.struct(*cols).alias("_old"))
        n = new.select(key, F.struct(*cols).alias("_new"))
        j = o.join(n, key, "full_outer")
        return (
            j.select(
                F.when(F.col("_old").isNull(), F.lit("insert"))
                .when(F.col("_new").isNull(), F.lit("delete"))
                .when(F.col("_old") != F.col("_new"), F.lit("update"))
                .alias("op"),
                F.col(key),
                F.col("_new.*"),
            )
            .filter(F.col("op").isNotNull())
        )
