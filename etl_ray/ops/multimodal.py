"""Multimodal (binary-payload) plumbing: opaque ``binary`` columns with typed
metadata, decoded / feature-extracted by actor-pool map_batches stages.

The image/audio codec libraries are not available in this container, so the
actual decode is STUBBED: ``RealImageDecoder.decode`` raises
NotImplementedError, and the tested path uses ``FakeImageDecoder`` — a
deterministic stand-in that exercises the REAL Ray-side plumbing (binary
schema in/out, batch sizing for large payloads, actor init cost amortized,
output layout). Swap the decoder class to go live.

Batch-size guidance: payload bytes dominate; with B-byte payloads pick
``batch_size ≈ 64 MiB / B`` so batch × concurrency fits the worker heap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_META_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("media_type", pa.string()),
        pa.field("payload_bytes", pa.int64()),
    ]
)


def to_binary_payload(batch: pa.Table, *, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Pack a column into an opaque binary payload + typed metadata — the
    ingest shape for image/audio blobs."""
    import pyarrow.compute as pc

    payload = pc.cast(batch[text_col], pa.binary())
    return pa.table(
        {
            "doc_id": pc.cast(batch[id_col], pa.int64()),
            "payload": payload,
            "media_type": pa.array(["application/octet-stream"] * len(batch)),
            "payload_bytes": pc.binary_length(batch[text_col]).cast(pa.int64()),
        },
        schema=IMAGE_META_SCHEMA,
    )


class RealImageDecoder:
    """The live decoder slot. Requires an image codec library that is not in
    this container."""

    def __init__(self):
        raise NotImplementedError(
            "image codec library not available in this environment; "
            "use FakeImageDecoder for plumbing tests"
        )


class FakeImageDecoder:
    """Deterministic fake decode: derives (width, height, channels) and a
    16-byte feature digest from the payload bytes. Actor-pool stage — the
    'model' (digest salt) loads once per actor."""

    def __init__(self, salt: bytes = b"etl-ray-fake-decoder"):
        self.salt = salt

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths = np.empty(len(payloads), dtype=np.int64)
        heights = np.empty(len(payloads), dtype=np.int64)
        feats = []
        for i, p in enumerate(payloads):
            b = p or b""
            h = hashlib.md5(self.salt + b).digest()
            widths[i] = 1 + h[0] % 64
            heights[i] = 1 + h[1] % 64
            feats.append(h)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload_bytes": batch["payload_bytes"],
                "width": pa.array(widths),
                "height": pa.array(heights),
                "feature": pa.array(feats, pa.binary()),
            }
        )


def decode_images(ds, *, decoder=FakeImageDecoder, batch_size: int = 256,
                  concurrency: int = 4):
    """Binary payloads → decoded metadata/features via an actor pool. Small
    batch_size on purpose: payload rows are heavy (see module docstring)."""
    return ds.map_batches(
        decoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_sample(ds, *, every_nth: int = 10, id_col: str = "doc_id"):
    """Keep every n-th payload row per batch plus the last of the batch —
    the tcpinfo snapshot-thinning pattern (/root/reference/parser/
    tcpinfo.go:97-110) applied to frame streams."""

    def f(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return batch
        idx = list(range(0, n, every_nth))
        if idx[-1] != n - 1:
            idx.append(n - 1)
        return batch.take(pa.array(idx))

    return ds.map_batches(f, batch_format="pyarrow")
