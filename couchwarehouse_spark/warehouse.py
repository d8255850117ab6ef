"""The warehouse: changes feed → conformed, queryable Spark tables.

End-to-end orchestration mirroring the reference's ``start()``
lifecycle (reference index.js:181-255): resume from checkpoint, spool
the feed, discover first-doc schemas per type, conform, upsert,
propagate deletes, checkpoint — then expose everything to SQL
(reference README.md:14 "your database can be queried using SQL").

Spark-first shape: the whole batch path is declarative DataFrame ops
(one json scan → filter → flatten projection → window dedup → write);
the only Python-per-row code is the optional per-doc transform hook,
and schema freezing collects exactly ONE row per doc type. For
continuous sync the same ``_process_batch`` runs under Structured
Streaming ``foreachBatch`` (streaming.ingest), which is the
micro-batch analog of the reference's 'batch' event loop
(reference index.js:105-125).

Scale: tables are hash-bucket-partitioned on ``id`` (parquet
``_cw_bucket=K`` directories); a batch rewrites ONLY the buckets its
ids hash into — per-batch I/O is proportional to the batch, not the
table (the reference's per-row ``REPLACE INTO``, reference
lib/sqlite.js:82, expressed as partition-level merge). Ids never
change buckets, so the merge plan (window latest-wins + tombstone
union) runs bucket-pruned; Delta/Iceberg ``MERGE INTO`` remains the
documented upgrade for true atomic commits. State never transits the
driver; the widest shuffle is one hash partition on the document id.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from couchwarehouse_spark.functions.mango import compile_selector
from couchwarehouse_spark.operators.document import (
    conform_frame,
    flatten_frame,
    schema_to_struct,
    usable_table_name,
)
from couchwarehouse_spark.operators.upsert import (
    SEQ_COL,
    CheckpointStore,
    merge_batch,
)
from couchwarehouse_spark.sources.changes import (
    filter_design_docs,
    read_changes_feed,
    split_envelopes,
)

DEFAULT_TYPE = "_default"  # reference index.js:52


def _logical_of(dtype: T.DataType) -> str:
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, T.NumericType):
        return "number"
    return "string"


class Warehouse:
    """A CouchDB-database-shaped warehouse on Spark.

    Parameters mirror the reference CLI (reference bin/
    couchwarehouse.bin.js:6-16): ``split`` = route by this doc field
    into per-type tables (R8); ``transform`` = frame-level transform
    applied to each type's flattened frame before schema freezing
    (R5, fast path); ``doc_transform`` = dict→dict per-doc hook (R5,
    reference-exact slow path); ``selector`` = Mango filter compiled
    to a Catalyst predicate (R4); ``reset`` = drop state and start
    from seq 0 (R19).
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        db_name: str,
        split: str | None = None,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        doc_transform: Callable[[dict], dict] | None = None,
        selector: Mapping | None = None,
        reset: bool = False,
        verbose: bool = False,
        n_buckets: int = 16,
        followers: list[Callable] | None = None,
    ):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self.db_name = db_name
        self.split = split
        self.transform = transform
        self.doc_transform = doc_transform
        self.selector_col = compile_selector(selector) if selector else None
        self.verbose = verbose
        # Bucket count for incremental merge: ids are stable under
        # pmod(xxhash64(id), n_buckets), so a micro-batch touches (and
        # rewrites) at most min(|batch ids|, n_buckets) partitions.
        # Size so one bucket ≈ a comfortable rewrite unit (e.g. 1024
        # buckets for a 1 TB table ⇒ ~1 GB rewrites).
        self.n_buckets = n_buckets
        # Sink followers: callables (wh, doc_type, conformed_batch,
        # tombstones) invoked per merged micro-batch with the SAME
        # conformed frame the merge applied — the reference's per-batch
        # insertBulk fan-out to secondary targets (lib/sqlite.js:60,
        # lib/elasticsearch.js:16). See sinks.sqlite.sqlite_follower.
        self.followers: list[Callable] = list(followers or [])
        self.schemas: dict[str, dict[str, str]] = {}
        self.checkpoints = CheckpointStore(spark, os.path.join(warehouse_dir, "_checkpoints"))
        if reset:
            self.reset()
        self._load_schemas()
        # Heal any swap a crashed previous process left torn. Safe here
        # and ONLY here (plus the merge path itself): at construction no
        # swap of ours can be in flight, whereas healing from table()
        # could roll back a live concurrent merge.
        if os.path.isdir(warehouse_dir):
            for entry in os.listdir(warehouse_dir):
                if entry.endswith("._swap.json"):
                    self._recover_swap(
                        os.path.join(warehouse_dir, entry[: -len("._swap.json")])
                    )

    # -- persistence of the frozen schema registry ---------------------

    @property
    def _schema_path(self) -> str:
        return os.path.join(self.warehouse_dir, "_schemas.json")

    def _load_schemas(self) -> None:
        if os.path.exists(self._schema_path):
            with open(self._schema_path) as f:
                stored = json.load(f)
            meta = stored.pop("__meta__", None)
            self.schemas = stored
            if meta and "n_buckets" in meta:
                # The ON-DISK bucket count wins over the constructor
                # arg: ids were hashed with it, so a different value
                # would silently mis-route lookups and merge pruning.
                self.n_buckets = int(meta["n_buckets"])

    def _save_schemas(self) -> None:
        os.makedirs(self.warehouse_dir, exist_ok=True)
        with open(self._schema_path, "w") as f:
            json.dump({"__meta__": {"n_buckets": self.n_buckets}, **self.schemas}, f, indent=1)

    # -- naming --------------------------------------------------------

    def table_name(self, doc_type: str = DEFAULT_TYPE) -> str:
        return usable_table_name(
            self.db_name,
            None if doc_type == DEFAULT_TYPE else doc_type,
            split=self.split is not None,
        )

    def _table_path(self, doc_type: str) -> str:
        return os.path.join(self.warehouse_dir, self.table_name(doc_type))

    # -- lifecycle -----------------------------------------------------

    def reset(self) -> None:
        """R19 — truncate & reload: drop all state and checkpoints."""
        shutil.rmtree(self.warehouse_dir, ignore_errors=True)
        self.schemas = {}

    def spool(self, feed_path: str) -> str | None:
        """Batch-replay a spooled changes feed into the warehouse (R1).

        Resumes from the last checkpoint unless the store is fresh
        (reference index.js:240-243); returns the new last-seq token.
        """
        env = read_changes_feed(self.spark, feed_path, doc_transform=self.doc_transform)
        since = self.checkpoints.read(self.db_name)
        if since is not None:
            from couchwarehouse_spark.operators.document import extract_seq_number

            env = env.filter(F.col(SEQ_COL) > extract_seq_number(since))
        last = self._process_batch(env)
        if last is not None:
            self.checkpoints.write(self.db_name, last)
            if self.verbose:
                self.message()
        return last

    def _process_batch(self, env: DataFrame) -> str | None:
        """Conform + merge one envelope batch (the 'batch' event body,
        reference index.js:105-125). Returns the batch's max seq token."""
        env = filter_design_docs(env)
        env = split_envelopes(env, self.split)
        # One JSON parse, many consumers: this batch is read by the
        # max-seq probe, type discovery, the tombstone probe, and every
        # per-type merge — without a persist each action re-parses the
        # feed from disk. Micro-batches are bounded, and persist()
        # spills to disk, so this holds at scale too.
        env = env.persist()

        # Tombstones: deletes apply to every type's table — CouchDB
        # tombstones carry no body, so no type (reference
        # lib/sqlite.js:95-98 deletes by id in whichever table).
        deleted = F.col("deleted").isNotNull() & F.col("deleted")
        tombstones = env.filter(deleted).select("id", SEQ_COL)
        live = env.filter(~deleted | F.col("deleted").isNull()).filter(
            F.col("doc").isNotNull()
        )

        # One probe job, not three: batch max-seq, the set of live doc
        # types, and does-this-batch-delete-anything all come out of a
        # single aggregation over the persisted batch.
        is_live = (~deleted | F.col("deleted").isNull()) & F.col("doc").isNotNull()
        stats = env.agg(
            F.max_by("seq", SEQ_COL).alias("last_seq"),
            F.collect_set(F.when(is_live, F.col("_cw_type"))).alias("types"),
            F.max(deleted).alias("has_tombstones"),
        ).collect()[0]
        last_seq = stats["last_seq"]
        types = set(stats["types"])
        # Tombstones must reach EVERY existing table, including types
        # with no live doc in this batch (a batch of pure deletes) —
        # CouchDB tombstones carry no type (reference lib/sqlite.js:95-98
        # deletes by id wherever the row lives).
        if stats["has_tombstones"]:
            types |= set(self.schemas.keys())
        try:
            for doc_type in sorted(types):
                self._merge_type(live, tombstones, doc_type)
            self._save_schemas()
        finally:
            env.unpersist()
        return last_seq

    def _bucket_of(self, col) -> "F.Column":
        """THE bucket formula — one definition shared by merge pruning
        and point lookup, so the two can never drift apart."""
        c = F.col(col) if isinstance(col, str) else col
        return F.pmod(F.xxhash64(c), F.lit(self.n_buckets)).cast("int")

    # -- swap journal: crash-safe bucket swaps --------------------------
    #
    # A swap is a sequence of directory renames; a crash between a
    # bucket's rename-out and rename-in would otherwise leave a table
    # that READS fine but silently lacks that bucket. The journal
    # marker (written only after the new data is fully on disk) lets
    # the next open roll the table back to its exact pre-swap state;
    # the interrupted batch replays from the unadvanced checkpoint and
    # the merge is idempotent by seq. Delta/Iceberg's atomic commit is
    # still the documented upgrade.

    def _swap_marker(self, path: str) -> str:
        return path + "._swap.json"

    def _begin_swap(
        self, path: str, affected: list[int] | None, had_old: list[int] | None = None
    ) -> None:
        # write-to-temp + rename: the marker itself must be atomic — a
        # truncated marker would otherwise wedge every future open.
        # ``had_old`` records which affected buckets had pre-existing
        # data BEFORE any rename: recovery needs it to distinguish "new
        # data placed for a fresh bucket" (discard) from "old data not
        # yet touched" (keep) — both look like a bucket dir with no
        # trash copy.
        marker = self._swap_marker(path)
        with open(marker + ".tmp", "w") as f:
            json.dump({"affected": affected, "had_old": had_old}, f)
        os.rename(marker + ".tmp", marker)

    def _finish_swap(self, path: str) -> None:
        try:
            os.remove(self._swap_marker(path))
        except FileNotFoundError:
            pass

    def _recover_swap(self, path: str) -> None:
        """Roll an interrupted swap back to the EXACT pre-swap state:
        every old copy in trash is restored over whatever is in place
        (already-swapped buckets included — their new data is from the
        uncommitted batch, which replays from the unadvanced
        checkpoint), and affected buckets with no old copy (newly
        created) are removed."""
        marker = self._swap_marker(path)
        if not os.path.exists(marker):
            return
        try:
            with open(marker) as f:
                info = json.load(f)
        except (json.JSONDecodeError, OSError):
            # Truncated marker = crash DURING _begin_swap, i.e. before
            # any rename: the table is untouched; just clean up.
            info = None
        trash = path + "._old"
        if info is not None:
            affected = info.get("affected")
            if affected is None:
                if os.path.isdir(trash):
                    shutil.rmtree(path, ignore_errors=True)
                    os.rename(trash, path)
            else:
                whole = os.path.join(trash, "_all")
                if os.path.isdir(whole):
                    shutil.rmtree(path, ignore_errors=True)
                    os.rename(whole, path)
                had_old = set(info.get("had_old") or [])
                for b in affected:
                    part = f"_cw_bucket={b}"
                    old = os.path.join(trash, part)
                    cur = os.path.join(path, part)
                    if os.path.isdir(old):
                        # Old copy secured in trash: exact restore
                        # (whatever is in place is uncommitted new data).
                        shutil.rmtree(cur, ignore_errors=True)
                        os.rename(old, cur)
                    elif b in had_old:
                        # Crash BEFORE this bucket's rename-out: what is
                        # in place IS the old data — leave it alone.
                        pass
                    elif os.path.isdir(cur):
                        shutil.rmtree(cur)  # newly created bucket: discard
        shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(path + "._tmp", ignore_errors=True)
        os.remove(marker)

    def _merge_type(self, live: DataFrame, tombstones: DataFrame, doc_type: str) -> None:
        sub = live.filter(F.col("_cw_type") == doc_type).select(SEQ_COL, "doc.*")
        flat = flatten_frame(sub)
        if self.transform is not None:
            flat = self.transform(flat)
        if self.selector_col is not None:
            flat = flat.filter(self.selector_col)

        if doc_type not in self.schemas:
            self.schemas[doc_type] = self._freeze_schema(flat)
        struct = schema_to_struct(self.schemas[doc_type])

        # Persisted: the incremental lane reads this frame twice (the
        # affected-bucket probe and the merge write) — without a persist
        # the flatten/transform/selector/conform pipeline would run
        # twice per micro-batch. Released in the finally below so a
        # failed write cannot leak the cached frame for the session.
        conformed = conform_frame(flat, struct, keep=[SEQ_COL]).persist()
        try:
            self._merge_conformed(conformed, tombstones, doc_type)
            # Followers see the exact conformed frame the merge applied
            # (still persisted), so secondary targets can never drift
            # from the warehouse's own semantics.
            for follower in self.followers:
                follower(self, doc_type, conformed, tombstones)
        finally:
            conformed.unpersist(blocking=False)
        self.register_view(doc_type)

    def _prune_bucket_files(
        self,
        path: str,
        affected: list[int],
        conformed: DataFrame,
        tombstones: DataFrame,
    ) -> tuple[list[str], dict[int, list[str]]]:
        """File-level merge pruning WITHIN affected buckets: a part
        file whose footer ``id`` min/max range contains no batch id
        needs no rewrite — its rows can't compete in the latest-wins
        window (state holds exactly one row per id, so a touched id's
        single copy always lives in a file whose range covers it).
        Returns (files to merge, per-bucket untouched files to carry
        forward). Footer reads are metadata-scale (driver-side, ≤
        files-per-affected-bucket); the range-vs-batch-id check is a
        broadcast semi join, not a collect of ids. Files without id
        statistics are conservatively merged. This is the hand-rolled
        version of Delta/Iceberg's manifest min/max file skipping;
        those remain the managed upgrade path."""
        import pyarrow.parquet as pq

        def id_range(fp: str) -> tuple[str, str] | None:
            md = pq.ParquetFile(fp).metadata
            idx = next(
                (i for i in range(md.num_columns) if md.schema.column(i).name == "id"),
                None,
            )
            if idx is None:
                return None
            mn = mx = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                mn = st.min if mn is None or st.min < mn else mn
                mx = st.max if mx is None or st.max > mx else mx
            return None if mn is None else (mn, mx)

        metas: list[tuple[int, str, str, str]] = []
        read_files: list[str] = []
        for b in affected:
            bdir = os.path.join(path, f"_cw_bucket={b}")
            if not os.path.isdir(bdir):
                continue
            for fn in sorted(os.listdir(bdir)):
                if not fn.endswith(".parquet"):
                    continue
                fp = os.path.join(bdir, fn)
                rng = id_range(fp)
                if rng is None:
                    read_files.append(fp)
                else:
                    metas.append((b, fp, rng[0], rng[1]))
        hit: set[str] = set()
        if metas:
            meta_df = self.spark.createDataFrame(
                metas, "b int, file string, min_id string, max_id string"
            )
            touched = conformed.select("id").unionByName(tombstones.select("id"))
            hit = {
                r["file"]
                for r in meta_df.join(
                    touched,
                    (F.col("id") >= F.col("min_id"))
                    & (F.col("id") <= F.col("max_id")),
                    "left_semi",
                )
                .select("file")
                .collect()
            }
        untouched: dict[int, list[str]] = {}
        for b, fp, _, _ in metas:
            if fp in hit:
                read_files.append(fp)
            else:
                untouched.setdefault(b, []).append(fp)
        return read_files, untouched

    def _merge_conformed(
        self, conformed: DataFrame, tombstones: DataFrame, doc_type: str
    ) -> None:
        path = self._table_path(doc_type)
        bucket_of = self._bucket_of

        self._recover_swap(path)  # heal any interrupted swap first
        state = None
        affected: list[int] | None = None
        untouched: dict[int, list[str]] = {}
        if os.path.isdir(path):
            state = self.spark.read.parquet(path)
            if "_cw_bucket" in state.columns:
                # Incremental lane: only buckets this batch's ids (or
                # tombstone ids) hash into are considered — and within
                # those, only part files whose id range intersects the
                # batch are read and rewritten (_prune_bucket_files);
                # untouched files carry forward byte-identical via
                # hardlink below. Bucket ids are ≤ n_buckets scalars;
                # collecting them is not data.
                affected = sorted(
                    r["b"]
                    for r in conformed.select(bucket_of("id").alias("b"))
                    .unionByName(tombstones.select(bucket_of("id").alias("b")))
                    .distinct()
                    .collect()
                )
                read_files, untouched = self._prune_bucket_files(
                    path, affected, conformed, tombstones
                )
                state = (
                    self.spark.read.parquet(*read_files) if read_files else None
                )
        new_state = merge_batch(state, conformed, tombstones).withColumn(
            "_cw_bucket", bucket_of("id")
        )

        # Write the merged (affected) buckets to a temp dir, then swap
        # per bucket directory: Spark can't overwrite a parquet dir it
        # is concurrently reading (self-join on source), and per-bucket
        # renames keep untouched buckets' files byte-identical.
        # Delta/Iceberg make this a true atomic commit.
        tmp = path + "._tmp"
        trash = path + "._old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)
        new_state.write.mode("overwrite").partitionBy("_cw_bucket").parquet(tmp)
        # Carry untouched part files into the new bucket dirs as
        # hardlinks: byte-identical, no copy cost, and the swap/
        # rollback protocol is unchanged — the old bucket dir (with
        # its own directory entries to the same inodes) still moves to
        # trash whole, so recovery restores the exact pre-swap state.
        for b, files in untouched.items():
            dst_dir = os.path.join(tmp, f"_cw_bucket={b}")
            os.makedirs(dst_dir, exist_ok=True)
            for fp in files:
                dst = os.path.join(dst_dir, os.path.basename(fp))
                try:
                    os.link(fp, dst)
                except OSError:  # filesystem without hardlinks
                    shutil.copy2(fp, dst)
        # New data is fully on disk — journal the swap so a crash
        # between any two renames below rolls back instead of losing a
        # bucket (see _recover_swap).
        had_old = None
        if affected is not None:
            had_old = [
                b
                for b in affected
                if os.path.isdir(os.path.join(path, f"_cw_bucket={b}"))
            ]
        self._begin_swap(path, affected, had_old)
        if affected is None:
            # Fresh table (or legacy unpartitioned state): whole swap.
            if not any(e.startswith("_cw_bucket=") for e in os.listdir(tmp)):
                # Zero rows (e.g. a selector filtered every doc of this
                # type): a partitioned empty write has no part files and
                # cannot be re-read — store a schema-bearing
                # unpartitioned empty state instead.
                shutil.rmtree(tmp, ignore_errors=True)
                new_state.drop("_cw_bucket").write.mode("overwrite").parquet(tmp)
            if os.path.isdir(path):
                os.rename(path, trash)
            os.rename(tmp, path)
        else:
            os.makedirs(trash, exist_ok=True)
            for b in affected:
                part = f"_cw_bucket={b}"
                old_dir = os.path.join(path, part)
                new_dir = os.path.join(tmp, part)
                if os.path.isdir(old_dir):
                    os.rename(old_dir, os.path.join(trash, part))
                if os.path.isdir(new_dir):
                    os.rename(new_dir, old_dir)
            shutil.rmtree(tmp, ignore_errors=True)
            if not any(e.startswith("_cw_bucket=") for e in os.listdir(path)):
                # Every remaining row was deleted: leave a readable
                # empty (unpartitioned) state so table() keeps working;
                # the next merge treats it as a fresh table.
                new_state.limit(0).drop("_cw_bucket").write.mode(
                    "overwrite"
                ).parquet(tmp)
                os.rename(path, os.path.join(trash, "_all"))
                os.rename(tmp, path)
        shutil.rmtree(trash, ignore_errors=True)
        self._finish_swap(path)

    def _freeze_schema(self, flat: DataFrame) -> dict[str, str]:
        """First-doc-wins schema freeze (R7; reference index.js:55-68).

        The first (lowest-seq) document of the type defines the
        column set and logical types; fields it lacks — even ones
        other docs in the same batch have — never become columns
        (reference README.md:300-304). Exactly one row is collected.
        """
        first = flat.orderBy(F.col(SEQ_COL).asc()).limit(1).collect()
        if not first:
            return {}
        row = first[0].asDict()
        schema: dict[str, str] = {}
        for field in flat.schema.fields:
            name = field.name
            if name == SEQ_COL:
                continue
            if row.get(name) is None:
                continue  # absent (or null — dropped, see flatten_doc)
            schema[name] = _logical_of(field.dataType)
        return schema

    def compact(
        self, doc_type: str = DEFAULT_TYPE, max_files_per_bucket: int = 4
    ) -> int:
        """Compact fragmented bucket directories (operational kernel).

        Every micro-batch merge rewrites its affected buckets with the
        session's task parallelism, so a hot bucket accumulates small
        part-files over time — the classic small-files problem that
        degrades scan throughput at scale. This rewrites every bucket
        holding more than ``max_files_per_bucket`` parquet parts down
        to ~one file, reusing the crash-safe swap journal: a crash
        mid-compaction rolls back to the exact pre-compaction state on
        the next open (content is unchanged either way — compaction
        only re-clusters bytes). Returns the number of buckets
        rewritten. Delta/Iceberg's OPTIMIZE is the managed-table
        equivalent and remains the documented upgrade.
        """
        path = self._table_path(doc_type)
        self._recover_swap(path)
        if not os.path.isdir(path):
            return 0
        todo: list[int] = []
        for entry in sorted(os.listdir(path)):
            if not entry.startswith("_cw_bucket="):
                continue
            n_parts = sum(
                1
                for f in os.listdir(os.path.join(path, entry))
                if f.endswith(".parquet")
            )
            if n_parts > max_files_per_bucket:
                todo.append(int(entry.split("=", 1)[1]))
        if not todo:
            return 0

        tmp = path + "._tmp"
        trash = path + "._old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)
        # basePath keeps _cw_bucket as a partition column while reading
        # ONLY the fragmented bucket dirs; repartition by the bucket
        # column so each bucket lands in one task → ~one output file.
        df = (
            self.spark.read.option("basePath", path)
            .parquet(*[os.path.join(path, f"_cw_bucket={b}") for b in todo])
            .repartition(len(todo), "_cw_bucket")
        )
        df.write.mode("overwrite").partitionBy("_cw_bucket").parquet(tmp)

        # Journal + per-bucket swap — same protocol as the merge; every
        # affected bucket has pre-existing data by construction.
        self._begin_swap(path, todo, had_old=list(todo))
        os.makedirs(trash, exist_ok=True)
        for b in todo:
            part = f"_cw_bucket={b}"
            os.rename(os.path.join(path, part), os.path.join(trash, part))
            os.rename(os.path.join(tmp, part), os.path.join(path, part))
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)
        self._finish_swap(path)
        return len(todo)

    # -- query surface (R17) -------------------------------------------

    def register_view(self, doc_type: str = DEFAULT_TYPE) -> DataFrame:
        df = self.table(doc_type)
        df.createOrReplaceTempView(self.table_name(doc_type))
        return df

    def _read_state(self, path: str) -> DataFrame:
        """ONE read path for table() and lookup(): wait out an active
        swap (journal marker present — the rename phase is pure
        directory renames, so the wait is milliseconds; recovery at
        construction clears stale markers from dead processes), then
        read with one retry for the residual rename instant. A reader
        that raced the marker could otherwise silently miss a bucket
        mid-swap; Delta/Iceberg snapshots are the true fix and remain
        the documented upgrade."""
        import time

        deadline = time.monotonic() + 5.0
        while os.path.exists(self._swap_marker(path)) and time.monotonic() < deadline:
            time.sleep(0.05)
        try:
            return self.spark.read.parquet(path)
        except Exception:
            time.sleep(0.2)
            return self.spark.read.parquet(path)

    def table(self, doc_type: str = DEFAULT_TYPE) -> DataFrame:
        """The current conformed state of one type's table (no seq col)."""
        return self._read_state(self._table_path(doc_type)).drop(
            SEQ_COL, "_cw_bucket"
        )

    def lookup(self, doc_id: str, doc_type: str = DEFAULT_TYPE) -> DataFrame:
        """Point lookup by document id — the reference's ``id PRIMARY
        KEY`` access path (reference lib/sqlite.js:38-40, ``WHERE id =
        ?`` at :83). On the bucket-partitioned layout this prunes to
        ONE ``_cw_bucket=K`` directory (PartitionFilters) before the
        id predicate even runs — at 100 TB a lookup reads 1/n_buckets
        of the table, not all of it.
        """
        df = self._read_state(self._table_path(doc_type))
        if "_cw_bucket" in df.columns:
            df = df.filter(F.col("_cw_bucket") == self._bucket_of(F.lit(doc_id)))
        return df.filter(F.col("id") == doc_id).drop(SEQ_COL, "_cw_bucket")

    def query(
        self, sql: str, substitutions: dict | list | None = None
    ) -> DataFrame:
        """SQL passthrough over the warehouse tables (R17; the seam the
        reference documents at README.md:306-328 — here it's real:
        ``spark.sql`` with full Catalyst planning).

        ``substitutions`` mirrors the reference's
        ``query(sql, substitutions)`` (lib/sqlite.js:123-134 prepared-
        statement params) via Spark's parameterized SQL: named
        (``:name`` + dict) or positional (``?`` + list) markers —
        values bind as literals, never string-spliced, so user input
        cannot inject SQL.
        """
        if substitutions is None:
            return self.spark.sql(sql)
        return self.spark.sql(sql, args=substitutions)

    def start(
        self,
        feed_dir: str,
        checkpoint_dir: str | None = None,
        monitor: bool = False,
        processing_time: str = "10 seconds",
    ):
        """Reference-lifecycle entry point (reference index.js:181-255):
        spool everything currently in the landing zone, then — when
        ``monitor=True`` — keep tailing it with a processing-time
        trigger. Returns the StreamingQuery when monitoring, else the
        last spooled seq token.
        """
        from couchwarehouse_spark.streaming.ingest import monitor_warehouse

        ckpt = checkpoint_dir or os.path.join(self.warehouse_dir, "_stream_ckpt")
        spool_q = monitor_warehouse(self, feed_dir, ckpt, available_now=True)
        spool_q.awaitTermination()
        if self.verbose:
            self.message()
        if monitor:
            self._active_query = monitor_warehouse(
                self, feed_dir, ckpt, available_now=False, processing_time=processing_time
            )
            return self._active_query
        return self.checkpoints.read(self.db_name)

    def stop(self) -> None:
        """Stop a running monitor (the reference's exported ``stop``,
        reference index.js:257-260 / 172-178) — the streaming query
        AND the HTTP tailer thread when the package-level ``start``
        attached one (``_tailer_stop``). Idempotent: no-op when
        nothing is monitoring."""
        ev = getattr(self, "_tailer_stop", None)
        if ev is not None:
            ev.set()
        self._tailer_stop = None
        q = getattr(self, "_active_query", None)
        if q is not None and q.isActive:
            q.stop()
        self._active_query = None

    def message(self) -> None:
        """R18 — tell the user how to query (reference lib/sqlite.js:172-179)."""
        for doc_type in self.schemas:
            print(
                f"couchwarehouse: table {self.table_name(doc_type)!r} ready — "
                f'query with spark.sql("SELECT * FROM {self.table_name(doc_type)} LIMIT 10")'
            )
