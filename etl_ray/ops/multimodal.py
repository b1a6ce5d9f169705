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


def _ppm_header(b: bytes):
    """Parse a PNM header (P5 gray / P6 RGB, 8-bit): returns
    (width, height, channels, data_offset). Whitespace-delimited tokens,
    ``#`` comments allowed between them."""
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":
            pos = b.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(b[start:pos]))
    if tokens[2] > 255:
        raise ValueError("only 8-bit PNM supported")
    return tokens[0], tokens[1], (3 if b[:2] == b"P6" else 1), pos + 1


def decode_image(b: bytes):
    """Pure-numpy decode of PPM (P6), PGM (P5) and uncompressed 24-bit BMP
    payloads → (H, W, C) uint8 array. Raises ValueError on any other
    codec — route those rows to quarantine, or plug a library decoder in
    via ``decode_images(decoder=...)``."""
    if len(b) < 2:
        raise ValueError("payload too short")
    magic = bytes(b[:2])
    if magic in (b"P5", b"P6"):
        w, h, c, off = _ppm_header(b)
        need = w * h * c
        px = np.frombuffer(b, dtype=np.uint8, count=need, offset=off)
        return px.reshape(h, w, c)
    if magic == b"BM":
        off = int(np.frombuffer(b, "<u4", 1, 10)[0])
        w = int(np.frombuffer(b, "<i4", 1, 18)[0])
        h = int(np.frombuffer(b, "<i4", 1, 22)[0])
        bpp = int(np.frombuffer(b, "<u2", 1, 28)[0])
        comp = int(np.frombuffer(b, "<u4", 1, 30)[0])
        if bpp != 24 or comp != 0:
            raise ValueError(f"BMP bpp={bpp} compression={comp} unsupported")
        stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        rows = np.frombuffer(b, np.uint8, h * stride, off).reshape(h, stride)
        img = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR → RGB
        return img[::-1] if flip else img
    raise ValueError(f"unknown image magic {magic!r}")


class RealImageDecoder:
    """The live decoder slot — REAL pure-numpy decode for PPM/PGM/BMP
    payloads (no codec library needed); any other format raises into the
    standard quarantine path via the ``decode_error`` column. Output:
    (doc_id, payload_bytes, width, height, channels, mean_luma,
    decode_error). Actor-pool stage: construct once per actor."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        w = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        c = np.zeros(n, np.int64)
        luma = np.zeros(n, np.float64)
        errs: list = [None] * n
        for i, p in enumerate(payloads):
            try:
                img = decode_image(p or b"")
            except ValueError as ex:
                errs[i] = str(ex)
                continue
            h[i], w[i], c[i] = img.shape
            # exact integer mean → one double division (SQL-reproducible)
            luma[i] = float(int(img.sum(dtype=np.int64))) / img.size
        return pa.table({
            "doc_id": batch["doc_id"],
            "payload_bytes": batch["payload_bytes"],
            "width": pa.array(w),
            "height": pa.array(h),
            "channels": pa.array(c),
            "mean_luma": pa.array(luma),
            "decode_error": pa.array(errs, pa.string()),
        })


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
