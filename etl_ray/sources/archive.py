"""Archive source: tar archives of small test files → Dataset of members.

The reference's unit of work is a .tgz/.tar archive of test files streamed
member-by-member (/root/reference/storage/storage.go:149-304 GCSSource /
NewTestSource, task/task.go:90-200). Ray-Data-native shape:

    list archive paths (driver scout, skip-count sampling)
      → descriptor Dataset (one block per archive)
      → map_batches(ArchiveReader instance): open tar, iterate members,
        oversize skip, gzip member decode → rows (archive, member, data)
      → parser dispatch (etl_ray.parsers) in a downstream map_batches

Ordering note: members are emitted in tar order (the reference relies on
lexical order for NDT grouping, parser/ndt.go:210-248 — and panics when
violated); group-by-key sessionization downstream must NOT rely on block
order, only on within-archive member order (each archive is one batch).
"""

from __future__ import annotations

import gzip
import io
import os
import re
import tarfile
import time
from typing import Callable, List, Optional

import pyarrow as pa

from etl_ray.util import descriptor_dataset

# member-stream retry knobs (reference storage/storage.go:163-210: GCS
# stalls mid-stream ~hourly at fleet scale; retry the MEMBER read with
# exponential backoff, never re-run the whole archive task)
RETRY_BASE_DELAY = 0.016  # 16 ms, doubled per trial
RETRY_MAX_TRIALS = 10


class RetryingStream(io.RawIOBase):
    """Seekable byte stream over a REOPENABLE source that heals transient
    read errors: on failure it sleeps 16 ms·2ⁿ (≤10 trials, reference
    storage/storage.go:163-210), reopens the source, seeks back to the
    last good offset and resumes. Sits BELOW the tar/gzip layers, so a
    mid-member stream error recovers at the byte level and the tar
    iteration continues — a flaky read of one member inside a 200 MB
    archive no longer re-runs the whole archive task (Ray's task retry
    remains the backstop for non-transient failures)."""

    def __init__(self, open_fn: Callable, *, max_trials: int = RETRY_MAX_TRIALS,
                 base_delay: float = RETRY_BASE_DELAY, sleep=time.sleep):
        super().__init__()
        self._open_fn = open_fn
        self._fh = open_fn()
        self._pos = 0
        self._max_trials = max_trials
        self._base_delay = base_delay
        self._sleep = sleep
        self.retries = 0  # metrics analog of the reference GCSRetryCount

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def _reopen(self) -> None:
        try:
            self._fh.close()
        except Exception:
            pass
        self._fh = self._open_fn()
        if self._pos:
            self._fh.seek(self._pos)

    def read(self, size: int = -1) -> bytes:
        delay = self._base_delay
        for trial in range(1, self._max_trials + 1):
            try:
                data = self._fh.read(size)
                self._pos += len(data)
                return data
            except (OSError, pa.ArrowInvalid):
                if trial >= self._max_trials:
                    raise
                self.retries += 1
                self._sleep(delay)
                delay *= 2
                self._reopen()
        raise OSError("unreachable")  # pragma: no cover

    def readinto(self, b) -> int:
        # BufferedReader drives RawIOBase through readinto
        data = self.read(len(b))
        b[: len(data)] = data
        return len(data)

    def seek(self, offset: int, whence: int = io.SEEK_SET) -> int:
        if whence == io.SEEK_CUR:
            offset += self._pos
        elif whence == io.SEEK_END:
            self._fh.seek(0, io.SEEK_END)
            end = self._fh.tell()
            offset += end
        self._fh.seek(offset)
        self._pos = offset
        return self._pos

    def tell(self) -> int:
        return self._pos

    def close(self) -> None:
        try:
            self._fh.close()
        finally:
            super().close()

MEMBER_SCHEMA = pa.schema(
    [
        pa.field("archive", pa.string()),
        pa.field("member", pa.string()),
        pa.field("size", pa.int64()),
        pa.field("data", pa.binary()),
        pa.field("skipped", pa.string()),  # null, or skip reason
    ]
)

# oversize guard, reference task/task.go:30-34 (200 MB there; configurable)
DEFAULT_MAX_MEMBER_BYTES = 200 * 1024 * 1024


def list_archives(root: str, *, pattern: str = r"\.(tar|tgz|tar\.gz)$",
                  skip_count: int = 0, limit: Optional[int] = None) -> List[str]:
    """Driver-side archive discovery with regex filter + skip-count sampling
    (reference active/active.go:167-203, etl/globals.go:326-330)."""
    pat = re.compile(pattern)
    out = []
    if "://" in root:
        # object-store/URI listing via pyarrow.fs (reference streams
        # archives from GCS, storage/storage.go:242-304)
        from pyarrow import fs as pafs

        from etl_ray.util import resolve_fs

        f, p = resolve_fs(root)
        scheme = root.split("://", 1)[0]
        sel = pafs.FileSelector(p, recursive=True)
        for info in f.get_file_info(sel):
            if info.type == pafs.FileType.File and pat.search(
                    info.base_name):
                out.append(f"{scheme}://{info.path}")
    else:
        for dirpath, _dirs, files in os.walk(root):
            for fn in sorted(files):
                if pat.search(fn):
                    out.append(os.path.join(dirpath, fn))
    out.sort()
    if skip_count > 0:
        out = out[:: skip_count + 1]
    if limit is not None:
        out = out[:limit]
    return out


class ArchiveReader:
    """Reads one archive per descriptor row; emits one row per member.

    Oversize members are emitted with ``skipped`` set (counted, not parsed —
    never silently dropped); ``.gz`` members are decompressed.
    """

    def __init__(self, max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
                 decompress: bool = True):
        self.max_member_bytes = max_member_bytes
        self.decompress = decompress

    def _read_archive(self, path: str):
        rows = []
        mode = "r:gz" if path.endswith((".tgz", ".tar.gz")) else "r"
        if "://" in path:
            # URI archive: stream through pyarrow.fs inside the task (the
            # worker, not the driver, touches object storage). open_input_file
            # is a random-access reader, so RetryingStream can reopen + seek
            # past a mid-stream stall instead of re-reading the archive.
            from etl_ray.util import resolve_fs

            f, lp = resolve_fs(path)
            open_fn = lambda: f.open_input_file(lp)  # noqa: E731
        else:
            open_fn = lambda: open(path, "rb")  # noqa: E731
        raw = RetryingStream(open_fn)
        cm = tarfile.open(fileobj=io.BufferedReader(raw, 1 << 20), mode=mode)
        with cm as tf:
            for member in tf:
                if not member.isfile():
                    continue
                if member.size > self.max_member_bytes:
                    rows.append((path, member.name, member.size, b"",
                                 "oversize"))
                    continue
                fh = tf.extractfile(member)
                data = fh.read() if fh else b""
                name = member.name
                if self.decompress and name.endswith(".gz"):
                    try:
                        data = gzip.decompress(data)
                    except OSError:
                        rows.append((path, name, member.size, data,
                                     "bad gzip"))
                        continue
                elif self.decompress and name.endswith(".zst"):
                    # zstd member decode (reference parser/tcpinfo.go:119-126)
                    # via pyarrow's built-in codec — no external lib needed
                    try:
                        data = pa.CompressedInputStream(
                            pa.BufferReader(data), "zstd").read()
                    except (OSError, pa.ArrowInvalid):
                        rows.append((path, name, member.size, data,
                                     "bad zstd"))
                        continue
                rows.append((path, name, len(data), data, None))
        return rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for path in batch["path"].to_pylist():
            rows.extend(self._read_archive(path))
        if not rows:
            return MEMBER_SCHEMA.empty_table()
        cols = list(zip(*rows))
        return pa.table(
            {
                "archive": pa.array(cols[0], pa.string()),
                "member": pa.array(cols[1], pa.string()),
                "size": pa.array(cols[2], pa.int64()),
                "data": pa.array(cols[3], pa.binary()),
                "skipped": pa.array(cols[4], pa.string()),
            }
        )


def read_archives(root_or_paths, *, skip_count: int = 0,
                  max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES):
    """Dataset of archive members (one archive per task; streaming)."""
    if isinstance(root_or_paths, str):
        paths = list_archives(root_or_paths, skip_count=skip_count)
    else:
        paths = list(root_or_paths)
    if not paths:
        import ray.data as rd

        return rd.from_arrow(MEMBER_SCHEMA.empty_table())
    ds = descriptor_dataset([{"path": p} for p in paths])
    return ds.map_batches(
        ArchiveReader(max_member_bytes=max_member_bytes),
        batch_format="pyarrow",
        batch_size=1,
    )
