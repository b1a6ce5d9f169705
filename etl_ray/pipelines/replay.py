"""End-to-end replay: tail WAL → validate → shuffle → apply → commit.

One commit = one atomic application of a contiguous range of unapplied WAL
segments (the analog of the reference's one-task-per-archive lifecycle,
/root/reference/task/task.go:90-200, with Gardener-style resume,
active/poller.go:152-216).

Pipeline (streaming, zero-copy Arrow end to end):

    ray.data.read_parquet(segments)                 # distributed read tasks
      .map_batches(Validator, batch_format="pyarrow")   # stateless decode/route
      .groupby("__shard")                           # THE hash shuffle on doc_id
      .map_groups(ApplyGroup, ...)                  # stateful actor-pool apply
      → tiny per-shard stats table on the driver → atomic manifest commit

Skew: partitions whose previous-commit event count exceeded
``salt_threshold`` are salted this commit (salt = seq % max_salt) — adaptive,
no extra IO; correctness unaffected because merge-on-read is LWW by
sequence_number across all delta files.
"""

from __future__ import annotations

import time
from typing import List, Optional

import pyarrow as pa

from etl_ray.config import QUARANTINE_SHARD, EngineConfig
from etl_ray.schema import promote_all
from etl_ray.sources.wal import list_segments, segments_schema
from etl_ray.stages.apply import ApplyShards
from etl_ray.stages.validate import Validator
from etl_ray.state.manifest import Manifest
from etl_ray.state.stats import CommitStats

class CommitAborted(RuntimeError):
    """Raised when a commit's quarantine ratio exceeds
    ``EngineConfig.max_failure_ratio`` — the analog of the reference's
    TaskError on >10% test failures (/root/reference/etl/etl.go:116-117,
    parser/ndt7_result.go:40-51). The manifest is NOT flipped."""

    def __init__(self, msg: str, stats=None):
        super().__init__(msg)
        self.stats = stats


# Control columns every changelog carries, as an Arrow schema fragment.
_CONTROL_SCHEMA = pa.schema(
    [
        pa.field("op", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("sequence_number", pa.int64()),
    ]
)


def _target_schema(manifest: Manifest, seg_paths: List[str],
                   config: EngineConfig) -> pa.Schema:
    schemas = []
    if manifest.schema is not None:
        schemas.append(manifest.schema)
    else:
        base = _CONTROL_SCHEMA
        if config.payload.payload_schema is not None:
            for f in config.payload.payload_schema:
                base = base.append(f)
        schemas.append(base)
    schemas.append(segments_schema(seg_paths))
    return promote_all(schemas)


def _salted_parts(manifest: Manifest, config: EngineConfig) -> frozenset:
    # scan back to the most recent REPLAY commit: compaction entries carry no
    # per_partition key and must not reset hot-partition salting
    for c in reversed(manifest.lineage.get("commits", [])):
        last = c.get("per_partition")
        if last is not None:
            return frozenset(
                int(k) for k, v in last.items()
                if v.get("rows", 0) >= config.salt_threshold
            )
    return frozenset()


def _storage_exchange_apply(seg_paths, lake_dir, commit_id, config, target,
                            salted, cpus, concurrency):
    """Two-phase apply through the disk exchange (see stages/exchange.py).

    Phase 1 is a stateless task pool (validate + bucket-split fragment
    writes, streaming); phase 2 is the stateful actor pool, one input block
    per bucket. Both phases' outputs are tiny stats tables.
    """
    import ray.data as rd

    from etl_ray.stages.exchange import (
        ApplyBucket,
        FragmentReadWriter,
        bucket_descriptors,
        cleanup_exchange,
        exchange_path,
        rowgroup_descriptors,
    )

    import os as _os

    prof = _os.environ.get("ETL_RAY_PROFILE") == "1"
    t0 = time.monotonic()
    # wipe any fragments from a crashed attempt of this same commit: the
    # retry regenerates them deterministically
    cleanup_exchange(lake_dir, commit_id, config.exchange_root)
    exch = exchange_path(lake_dir, commit_id, config.exchange_root)
    n_buckets = max(4, min(config.num_partitions * config.max_salt,
                           cpus * config.bucket_multiplier))

    ctx = rd.DataContext.get_current()
    prev_min = ctx.target_min_block_size
    try:
        # descriptor rows (both stages) are bytes-tiny; without this the
        # executor bundles them into one block and the stage loses its
        # parallelism
        ctx.target_min_block_size = 0
        # fused read: stage-1 tasks decode their own row group in place —
        # a constructed instance → stateless TASK pool reusing Ray's
        # pre-started workers; no WAL bytes cross the object store
        # (the unfused ReadParquet → map_batches chain round-tripped the
        # whole WAL through plasma: measured 3.6-4.4 s vs ~1.0 s at 8 CPUs)
        rg_items = rowgroup_descriptors(seg_paths)
        rg_desc = rd.from_items(rg_items, override_num_blocks=len(rg_items))
        frag_stats = rg_desc.map_batches(
            FragmentReadWriter(config, target, salted, exch, n_buckets),
            batch_format="pyarrow",
            batch_size=1,
        ).to_pandas()
        if prof:
            print(f"[profile] stage1 validate+split: "
                  f"{time.monotonic() - t0:.2f}s", flush=True)
            t0 = time.monotonic()

        items = bucket_descriptors(frag_stats, n_buckets)
        if not items:
            from etl_ray.stages.apply import STATS_SCHEMA

            return STATS_SCHEMA.empty_table().to_pandas()
        desc = rd.from_items(items, override_num_blocks=len(items))
        pool = dict(
            fn_constructor_args=(lake_dir, commit_id, config, exch, n_buckets),
            concurrency=min(concurrency, len(items)),
            num_cpus=1,
        ) if config.use_actor_pool else {}
        fn = ApplyBucket if config.use_actor_pool else ApplyBucket(
            lake_dir, commit_id, config, exch, n_buckets)
        stats_tbl = desc.map_batches(
            fn,
            batch_format="pyarrow",
            # batch_size=1 == min_rows_per_bundled_input=1: dispatch each
            # 1-row descriptor block as its own task (None lets the executor
            # bundle the tiny blocks into one and serializes the stage)
            batch_size=1,
            **pool,
        ).to_pandas()
    finally:
        ctx.target_min_block_size = prev_min
    if prof:
        print(f"[profile] stage2 apply: {time.monotonic() - t0:.2f}s",
              flush=True)
        t0 = time.monotonic()
    cleanup_exchange(lake_dir, commit_id, config.exchange_root)
    if prof:
        print(f"[profile] cleanup: {time.monotonic() - t0:.2f}s", flush=True)
    return stats_tbl


def replay_once(
    wal_dir: str,
    lake_dir: str,
    config: EngineConfig,
    *,
    max_segments: Optional[int] = None,
    commit: bool = True,
) -> Optional[CommitStats]:
    """Apply the next batch of unapplied segments as one commit.

    Returns None when there is nothing to apply. ``commit=False`` performs
    all data writes but skips the manifest flip — used by crash/resume tests
    to simulate a failure between apply and commit (the rerun must produce
    byte-identical files and the same manifest).
    """
    import ray
    import ray.data as rd

    t0 = time.monotonic()
    manifest = Manifest.load(lake_dir)
    if manifest.version == 0 and not manifest.partitions:
        manifest.num_partitions = config.num_partitions
    elif manifest.num_partitions != config.num_partitions:
        raise ValueError(
            f"lake has {manifest.num_partitions} partitions; config says "
            f"{config.num_partitions} — partition count is fixed at creation"
        )
    segs = list_segments(
        wal_dir,
        after=manifest.applied_through_segment,
        skip_count=config.skip_count,
        limit=max_segments or config.max_segments_per_commit,
    )
    if not segs:
        return None
    if config.max_bytes_per_commit is not None and len(segs) > 1:
        # bound a commit by input bytes (driver-side stat of the tiny
        # work-list): a catch-up backlog becomes several bounded commits,
        # so bucket size stays ~ cap / n_buckets instead of the backlog
        import os as _os

        total, cut = 0, len(segs)
        for i, s in enumerate(segs):
            total += s.size if s.size >= 0 else _os.path.getsize(s.path)
            if total > config.max_bytes_per_commit and i > 0:
                cut = i
                break
        segs = segs[:cut]
    seg_paths = [s.path for s in segs]
    target = _target_schema(manifest, seg_paths, config)
    commit_id = manifest.commit_id
    salted = _salted_parts(manifest, config)

    cpus = int(ray.cluster_resources().get("CPU", 4))
    concurrency = config.apply_concurrency
    if concurrency is None:
        # cap below the CPU count: a pool == cluster CPUs starves the
        # upstream read of the shuffled blocks and the executor stalls
        concurrency = max(2, cpus - 2)

    if config.exchange == "storage":
        stats_tbl = _storage_exchange_apply(
            seg_paths, lake_dir, commit_id, config, target, salted,
            cpus, concurrency,
        )
    else:
        from etl_ray.util import read_parquet_any

        ds = read_parquet_any(seg_paths)
        ds = ds.map_batches(
            Validator(config, target, salted),
            batch_format="pyarrow",
            batch_size=config.batch_size,
        )
        # The groupby exchange is a barrier that materializes its input
        # anyway; the explicit materialize keeps the read+validate phase and
        # the shuffle+apply phase from fighting over CPUs (the apply actor
        # pool otherwise reserves cores while the read is still running —
        # measured 2-6x slower).
        validated = ds.materialize()
        stats_tbl = (
            validated.groupby("__shard")
            .map_groups(
                ApplyShards,
                fn_constructor_args=(lake_dir, commit_id, config),
                batch_format="pyarrow",
                concurrency=concurrency,
                num_cpus=1,
            )
            .to_pandas()
        )

    cs = CommitStats(commit_id=commit_id, segments=[s.number for s in segs])
    cs.events_in = int(stats_tbl["rows_in"].sum())
    new_version = manifest.version + 1
    for row in stats_tbl.itertuples(index=False):
        if row.shard == QUARANTINE_SHARD:
            cs.quarantined += int(row.rows_in)
            manifest.quarantine_files.append(row.file)
            continue
        cs.rows_written += int(row.rows_out)
        cs.deletes += int(row.deletes)
        p = manifest.partition(int(row.part))
        p.files.append(row.file)
        p.watermark_seq = max(p.watermark_seq, int(row.max_seq))
        pp = cs.per_partition.setdefault(
            int(row.part), {"rows": 0, "sec": 0.0})
        pp["rows"] += int(row.rows_in)
        pp["sec"] += float(row.wall_sec)
    for pp in cs.per_partition.values():
        pp["rows_per_sec"] = round(pp["rows"] / pp["sec"], 1) if pp["sec"] else None
    cs.valid = cs.events_in - cs.quarantined
    cs.wall_sec = time.monotonic() - t0
    # per-stage distribution metrics for the /metrics scrape surface
    # (reference exports these as Prometheus histograms,
    # metrics/metrics.go:398-555)
    from etl_ray.state.stats import DURATION_BUCKETS, ROWS_BUCKETS, Histogram

    h_sec = Histogram(DURATION_BUCKETS)
    h_sec.observe_many(stats_tbl["wall_sec"])
    h_rows = Histogram(ROWS_BUCKETS)
    h_rows.observe_many(stats_tbl["rows_in"])
    cs.histograms = {"shard_apply_seconds": h_sec.to_json(),
                     "shard_rows": h_rows.to_json()}

    if (
        config.max_failure_ratio is not None
        and cs.events_in > 0
        and cs.quarantined / cs.events_in > config.max_failure_ratio
    ):
        # the reference's TaskError gate (>10% of tests failing fails the
        # task, /root/reference/etl/etl.go:116-117): leave the manifest
        # UNFLIPPED so the bad batch is retried/inspected, never silently
        # committed. Data writes are deterministic → a later retry after the
        # poison source is fixed overwrites them byte-for-byte.
        raise CommitAborted(
            f"commit {commit_id}: {cs.quarantined}/{cs.events_in} events "
            f"quarantined (> max_failure_ratio={config.max_failure_ratio})",
            stats=cs,
        )

    manifest.version = new_version
    manifest.set_schema(target)
    manifest.applied_through_segment = segs[-1].number
    lin = manifest.lineage
    lin["events_in"] += cs.events_in
    lin["valid"] += cs.valid
    lin["quarantined"] += cs.quarantined
    lin["rows_written"] += cs.rows_written
    lin["deletes"] += cs.deletes
    lin["commits"].append(cs.to_json())
    if commit:
        manifest.commit()
    return cs


def recover_quarantine(
    lake_dir: str,
    config: EngineConfig,
) -> Optional[CommitStats]:
    """Dead-letter replay: re-validate the quarantine under the CURRENT
    config and apply newly-valid events as a normal exactly-once commit.

    The lifecycle the reference lives by — archives that failed a parser
    are reprocessed after the parser is fixed (task retry path,
    /root/reference/etl/etl.go TaskError semantics) — lifted to rows:
    quarantine rows, land a correction rule (EngineConfig.corrections),
    recover. Still-invalid rows become the NEW quarantine (the old files
    stay referenced by manifest history for time travel); recovered
    events participate in LWW with their original sequence numbers, so a
    recovered event that was the latest write wins exactly as if it had
    never been quarantined. ``applied_through_segment`` is untouched.
    Returns None (and leaves the manifest unflipped) when nothing
    becomes valid."""
    import ray
    import ray.data as rd

    t0 = time.monotonic()
    manifest = Manifest.load(lake_dir)
    if not manifest.quarantine_files:
        return None
    import os as _os

    paths = [_os.path.join(lake_dir, f) for f in manifest.quarantine_files]
    target = _target_schema(manifest, paths, config)
    # quarantine files persist the __reason diagnostic column; it is NOT an
    # event field — the Validator re-derives it, so it must not survive into
    # the target schema (a stored copy would collide with the fresh one)
    drop_meta = [c for c in ("__reason", "__shard") if c in target.names]
    for c in drop_meta:
        target = target.remove(target.get_field_index(c))
    salted = _salted_parts(manifest, config)
    commit_id = manifest.commit_id

    cpus = int(ray.cluster_resources().get("CPU", 4))
    concurrency = config.apply_concurrency or max(2, cpus - 2)

    from etl_ray.util import read_parquet_any

    ds = read_parquet_any(paths)

    def strip_reason(t: pa.Table) -> pa.Table:
        drop = [c for c in ("__reason", "__shard") if c in t.column_names]
        return t.drop_columns(drop) if drop else t

    validated = ds.map_batches(strip_reason, batch_format="pyarrow") \
        .map_batches(Validator(config, target, salted),
                     batch_format="pyarrow",
                     batch_size=config.batch_size).materialize()
    stats_tbl = (
        validated.groupby("__shard")
        .map_groups(
            ApplyShards,
            fn_constructor_args=(lake_dir, commit_id, config),
            batch_format="pyarrow",
            concurrency=min(concurrency, config.num_partitions),
            num_cpus=1,
        )
        .to_pandas()
    )

    cs = CommitStats(commit_id=commit_id, segments=[])
    cs.events_in = int(stats_tbl["rows_in"].sum())
    new_quarantine: List[str] = []
    delta_rows = []
    for row in stats_tbl.itertuples(index=False):
        if row.shard == QUARANTINE_SHARD:
            cs.quarantined += int(row.rows_in)
            new_quarantine.append(row.file)
        else:
            delta_rows.append(row)
    cs.valid = cs.events_in - cs.quarantined
    if cs.valid == 0:
        # nothing recovered: remove the rewritten (identical) quarantine
        # file and leave the manifest untouched — recovery is a no-op and
        # idempotent under repeated calls
        for f in new_quarantine:
            try:
                _os.remove(_os.path.join(lake_dir, f))
            except OSError:
                pass
        return None
    for row in delta_rows:
        cs.rows_written += int(row.rows_out)
        cs.deletes += int(row.deletes)
        p = manifest.partition(int(row.part))
        p.files.append(row.file)
        p.watermark_seq = max(p.watermark_seq, int(row.max_seq))
        pp = cs.per_partition.setdefault(
            int(row.part), {"rows": 0, "sec": 0.0})
        pp["rows"] += int(row.rows_in)
        pp["sec"] += float(row.wall_sec)
    for pp in cs.per_partition.values():
        pp["rows_per_sec"] = round(pp["rows"] / pp["sec"], 1) \
            if pp["sec"] else None
    cs.wall_sec = time.monotonic() - t0

    manifest.version += 1
    manifest.set_schema(target)
    manifest.quarantine_files = new_quarantine
    lin = manifest.lineage
    lin["events_in"] += cs.events_in
    lin["valid"] += cs.valid
    lin["quarantined"] = cs.quarantined  # quarantine REPLACED, not added
    lin["rows_written"] += cs.rows_written
    lin["deletes"] += cs.deletes
    rec = cs.to_json()
    rec["recovery"] = True
    lin["commits"].append(rec)
    manifest.commit()
    return cs


def replay(
    wal_dir: str,
    lake_dir: str,
    config: Optional[EngineConfig] = None,
    *,
    segments_per_commit: Optional[int] = None,
    max_commits: Optional[int] = None,
) -> List[CommitStats]:
    """Replay all unapplied WAL segments, one or more commits, until caught
    up. Resumable: a rerun after any crash continues from the manifest."""
    config = config or EngineConfig()
    out = []
    while max_commits is None or len(out) < max_commits:
        cs = replay_once(
            wal_dir, lake_dir, config, max_segments=segments_per_commit
        )
        if cs is None:
            break
        out.append(cs)
    return out
