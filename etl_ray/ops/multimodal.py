"""Multimodal (binary-payload) plumbing: opaque ``binary`` columns with typed
metadata, decoded / feature-extracted by actor-pool map_batches stages.

``RealImageDecoder`` performs a REAL decode with no codec library: PPM (P6),
PGM (P5), uncompressed 24-bit BMP, and PNG (8-bit, critical chunks, filters
0-4, via stdlib zlib) — all pure numpy. Formats the container can't decode
(JPEG etc.) raise into the standard ``decode_error`` quarantine path; a
library decoder (Pillow/torchvision) slots into ``decode_images(decoder=…)``
unchanged. ``FakeImageDecoder`` remains as the zero-cost plumbing exerciser.

Batch-size guidance: payload bytes dominate; with B-byte payloads pick
``batch_size ≈ 64 MiB / B`` so batch × concurrency fits the worker heap.
"""

from __future__ import annotations

import hashlib
import zlib

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(left, up, ul):
    """Paeth predictor (PNG spec §9.4), vectorized over the channel lanes
    of one pixel. Inputs/outputs int16."""
    p = left + up - ul
    pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                    np.where(pb <= pc_, up, ul))
    return pred


def _png_unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse per-scanline filtering (types 0-4). Sub is a per-lane
    cumsum; Up is one vector add; Average/Paeth carry a left-neighbor
    dependency, so those rows walk pixels with small per-channel vector
    ops (decode stage, not the 100 TB hot path — a C codec replaces this
    whole module in production)."""
    stride = w * ch
    lines = raw.reshape(h, 1 + stride)
    ftypes = lines[:, 0]
    out = np.zeros((h, stride), np.int16)
    prev = np.zeros(stride, np.int16)
    for y in range(h):
        f = int(ftypes[y])
        r = lines[y, 1:].astype(np.int16)
        if f == 0:
            cur = r
        elif f == 1:  # Sub: out[x] = raw[x] + out[x-bpp] → cumsum mod 256
            cur = np.cumsum(r.reshape(w, ch), axis=0, dtype=np.int64) % 256
            cur = cur.reshape(stride).astype(np.int16)
        elif f == 2:  # Up
            cur = (r + prev) % 256
        elif f == 3:  # Average
            cur = np.empty(stride, np.int16)
            rp = r.reshape(w, ch)
            pp = prev.reshape(w, ch)
            left = np.zeros(ch, np.int16)
            cp = cur.reshape(w, ch)
            for x in range(w):
                left = (rp[x] + ((left + pp[x]) >> 1)) % 256
                cp[x] = left
        elif f == 4:  # Paeth
            cur = np.empty(stride, np.int16)
            rp = r.reshape(w, ch)
            pp = prev.reshape(w, ch)
            left = np.zeros(ch, np.int16)
            ul = np.zeros(ch, np.int16)
            cp = cur.reshape(w, ch)
            for x in range(w):
                left = (rp[x] + _paeth(left, pp[x], ul)) % 256
                cp[x] = left
                ul = pp[x]
        else:
            raise ValueError(f"PNG filter type {f} invalid")
        out[y] = cur
        prev = out[y]
    return out.astype(np.uint8)


def _png_decode(b: bytes) -> np.ndarray:
    """PNG → (H, W, C) uint8: critical chunks (IHDR/PLTE/IDAT/IEND), bit
    depth 8, color types 0/2/3/4/6, no interlace, filters 0-4, inflate via
    stdlib zlib. Ancillary chunks are skipped; CRCs are not verified (a
    truncated/garbled stream still fails loudly at inflate or size
    checks)."""
    if b[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos:pos + 4], "big")
        typ = bytes(b[pos + 4:pos + 8])
        data = b[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + data + CRC
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"PNG depth={depth}/interlace={interlace} unsupported")
    ch = _PNG_CHANNELS.get(ctype)
    if ch is None:
        raise ValueError(f"PNG color type {ctype} invalid")
    stride = w * ch
    expected = h * (1 + stride)
    # bounded inflate: the output size is known from IHDR, so cap the
    # decompressor there — an untrusted few-KB bomb whose IDAT inflates to
    # gigabytes hits the cap and quarantines instead of OOM-killing the
    # worker before the size check
    try:
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), expected + 1)
    except zlib.error as ex:
        raise ValueError(f"PNG inflate failed: {ex}")
    if len(raw) != expected or dec.unconsumed_tail:
        raise ValueError("PNG data size mismatch")
    img = _png_unfilter(np.frombuffer(raw, np.uint8), h, w, ch)
    if ctype == 3:
        if plte is None or len(plte) < 3:
            raise ValueError("PNG palette image missing PLTE")
        pal = np.frombuffer(plte[: len(plte) - len(plte) % 3],
                            np.uint8).reshape(-1, 3)
        flat = img.reshape(h, w)
        if int(flat.max(initial=0)) >= len(pal):
            raise ValueError("PNG palette index out of range")
        return pal[flat]
    return img.reshape(h, w, ch)


def encode_png(img: np.ndarray, *, filter_type: int = 0,
               level: int = 6) -> bytes:
    """Minimal PNG writer (8-bit gray/gray+alpha/RGB/RGBA, one filter for
    all scanlines) — the write-path counterpart of ``_png_decode`` and the
    fixture generator for its tests. Filtering in the ENCODER is fully
    vectorized (it sees original values, no sequential dependency)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    rows = img.reshape(h, w * ch).astype(np.int16)
    prev = np.vstack([np.zeros((1, w * ch), np.int16), rows[:-1]])
    if filter_type == 0:
        filt = rows
    elif filter_type == 1:
        left = np.zeros_like(rows)
        left[:, ch:] = rows[:, :-ch]
        filt = rows - left
    elif filter_type == 2:
        filt = rows - prev
    elif filter_type == 3:
        left = np.zeros_like(rows)
        left[:, ch:] = rows[:, :-ch]
        filt = rows - ((left + prev) >> 1)
    elif filter_type == 4:
        left = np.zeros_like(rows)
        left[:, ch:] = rows[:, :-ch]
        ul = np.zeros_like(rows)
        ul[:, ch:] = prev[:, :-ch]
        filt = rows - _paeth(left, prev, ul)
    else:
        raise ValueError(f"filter_type {filter_type} invalid")
    scan = np.hstack([np.full((h, 1), filter_type, np.uint8),
                      (filt % 256).astype(np.uint8)])
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, ctype, 0, 0, 0]))
    idat = zlib.compress(scan.tobytes(), level)

    def chunk(typ: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return (len(data).to_bytes(4, "big") + typ + data
                + crc.to_bytes(4, "big"))

    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def decode_image(b: bytes):
    """Pure-numpy decode of PPM (P6), PGM (P5), uncompressed 24-bit BMP and
    PNG (8-bit, stdlib zlib) payloads → (H, W, C) uint8 array. Raises
    ValueError on any other codec — route those rows to quarantine, or
    plug a library decoder in via ``decode_images(decoder=...)``."""
    if len(b) < 2:
        raise ValueError("payload too short")
    magic = bytes(b[:2])
    if magic == _PNG_SIG[:2]:
        return _png_decode(b)
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


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pixel-center nearest-neighbor resize: src row for output row i is
    floor((i + 0.5) * in_h / out_h), all-integer index math
    ((2i+1)*in // 2*out) — no float rounding, so a SQL oracle reproduces
    the sampled grid exactly. Works for (H, W) and (H, W, C) uint8."""
    h, w = img.shape[:2]
    ri = ((np.arange(out_h, dtype=np.int64) * 2 + 1) * h) // (2 * out_h)
    ci = ((np.arange(out_w, dtype=np.int64) * 2 + 1) * w) // (2 * out_w)
    return img[ri][:, ci]


class ImageResizer:
    """Actor-pool resize stage: decode → nearest-neighbor resize →
    re-encode PNG. Corrupt payloads surface ``decode_error`` with zeroed
    dims (the standard quarantine contract) instead of failing the task.
    Output: (doc_id, width, height, channels, mean_luma, payload,
    payload_bytes, decode_error) where mean_luma is the EXACT integer
    pixel mean of the RESIZED image (one double division,
    SQL-reproducible) and payload is the re-encoded PNG."""

    def __init__(self, out_h: int = 4, out_w: int = 5,
                 filter_type: int = 0):
        self.out_h = out_h
        self.out_w = out_w
        self.filter_type = filter_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        w = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        c = np.zeros(n, np.int64)
        luma = np.zeros(n, np.float64)
        out_pay: list = [None] * n
        errs: list = [None] * n
        for i, p in enumerate(payloads):
            try:
                img = decode_image(p or b"")
            except ValueError as ex:
                errs[i] = str(ex)
                continue
            if img.ndim == 2:
                img = img[:, :, None]
            r = resize_nearest(img, self.out_h, self.out_w)
            h[i], w[i], c[i] = r.shape
            luma[i] = float(int(r.sum(dtype=np.int64))) / r.size
            out_pay[i] = encode_png(r, filter_type=self.filter_type)
        pay = pa.array(out_pay, pa.binary())
        return pa.table({
            "doc_id": batch["doc_id"],
            "width": pa.array(w),
            "height": pa.array(h),
            "channels": pa.array(c),
            "mean_luma": pa.array(luma),
            "payload": pay,
            "payload_bytes": pa.compute.fill_null(
                pa.compute.binary_length(pay).cast(pa.int64()), 0),
            "decode_error": pa.array(errs, pa.string()),
        })


# ---------------------------------------------------------------- audio
def encode_wav(samples: np.ndarray, *, sample_rate: int = 8000,
               channels: int = 1) -> bytes:
    """Minimal RIFF/WAVE PCM16 writer (interleaved int16 samples)."""
    body = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    block = 2 * channels
    hdr = (b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little")                   # PCM
           + channels.to_bytes(2, "little")
           + sample_rate.to_bytes(4, "little")
           + (sample_rate * block).to_bytes(4, "little")
           + block.to_bytes(2, "little")
           + (16).to_bytes(2, "little")
           + b"data" + len(body).to_bytes(4, "little"))
    return hdr + body


def decode_wav(b: bytes):
    """RIFF/WAVE PCM16 → (sample_rate, channels, int16 sample array).
    Chunk-walks the container (fmt may be followed by LIST/fact chunks);
    anything that is not canonical PCM16 raises ValueError into the
    standard quarantine path."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        sz = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + sz]
        if pos + 8 + sz > len(b):
            raise ValueError("truncated wav chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16 or channels < 1:
        raise ValueError(f"unsupported wav: fmt={audio_format} bits={bits}")
    n = len(data) // 2
    return rate, channels, np.frombuffer(data[:n * 2], dtype="<i2")


class AudioFeatures:
    """Actor-pool audio stage: WAV decode → per-payload features
    (sample_rate, channels, n_samples per channel, exact integer mean
    amplitude and sum of squares → one double division each, so a SQL
    oracle reproduces them bit-for-bit). Corrupt payloads surface
    ``decode_error`` with zeroed fields — the quarantine contract."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        rate = np.zeros(n, np.int64)
        ch = np.zeros(n, np.int64)
        ns = np.zeros(n, np.int64)
        mean = np.zeros(n, np.float64)
        rms = np.zeros(n, np.float64)
        errs: list = [None] * n
        for i, p in enumerate(payloads):
            try:
                r, c, s = decode_wav(p or b"")
            except ValueError as ex:
                errs[i] = str(ex)
                continue
            rate[i], ch[i] = r, c
            ns[i] = len(s) // c
            if len(s):
                tot = int(s.sum(dtype=np.int64))
                sq = int((s.astype(np.int64) ** 2).sum())
                mean[i] = float(tot) / len(s)
                rms[i] = float(sq) / len(s)  # mean square (sqrt-free: exact)
        return pa.table({
            "doc_id": batch["doc_id"],
            "sample_rate": pa.array(rate),
            "channels": pa.array(ch),
            "n_samples": pa.array(ns),
            "mean_amp": pa.array(mean),
            "mean_square": pa.array(rms),
            "decode_error": pa.array(errs, pa.string()),
        })


# ---------------------------------------------------------------- video
_VID_MAGIC = b"VID0"


def encode_video(frames, *, fps: int = 10) -> bytes:
    """Minimal frame-container writer: magic, fps, frame count, an offset
    index, then each frame as an embedded PNG. Stands in for a real
    container format — the parsing/sampling shape (index seek, per-frame
    decode) is what a production demuxer stage looks like."""
    blobs = [encode_png(f) for f in frames]
    hdr = _VID_MAGIC + fps.to_bytes(4, "little") + \
        len(blobs).to_bytes(4, "little")
    off = len(hdr) + 8 * len(blobs)
    idx = b""
    for b in blobs:
        idx += off.to_bytes(4, "little") + len(b).to_bytes(4, "little")
        off += len(b)
    return hdr + idx + b"".join(blobs)


def decode_video_index(b: bytes):
    """Container → (fps, [(offset, size), ...]) WITHOUT decoding frames —
    the cheap demux pass sampling decisions are made on."""
    if len(b) < 12 or b[:4] != _VID_MAGIC:
        raise ValueError("not a VID0 container")
    fps = int.from_bytes(b[4:8], "little")
    n = int.from_bytes(b[8:12], "little")
    if len(b) < 12 + 8 * n:
        raise ValueError("truncated frame index")
    idx = []
    for i in range(n):
        off = int.from_bytes(b[12 + 8 * i:16 + 8 * i], "little")
        sz = int.from_bytes(b[16 + 8 * i:20 + 8 * i], "little")
        if off + sz > len(b):
            raise ValueError("frame offset past end of payload")
        idx.append((off, sz))
    return fps, idx


class VideoFrameSampler:
    """Actor-pool video stage: demux the frame index, decode ONLY every
    ``every_nth`` frame plus the last (the tcpinfo thinning rule applied
    to frames — skipped frames are never even PNG-decoded), emit one row
    per sampled frame with its exact pixel mean. 1→N fan-out inside
    map_batches; corrupt containers surface ``decode_error`` on a single
    row with frame_idx = -1."""

    def __init__(self, every_nth: int = 4):
        self.every_nth = every_nth

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "frame_idx": [], "n_frames": [], "fps": [],
                "width": [], "height": [], "mean_luma": [],
                "decode_error": []}

        def emit(d, fi, nf, fps, w, h, luma, err):
            rows["doc_id"].append(d)
            rows["frame_idx"].append(fi)
            rows["n_frames"].append(nf)
            rows["fps"].append(fps)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["mean_luma"].append(luma)
            rows["decode_error"].append(err)

        for d, p in zip(batch["doc_id"].to_pylist(),
                        batch["payload"].to_pylist()):
            # per-doc rows are staged locally so a frame failing mid-loop
            # discards the doc's partial good rows — a doc is either
            # decoded (its sampled frames) or quarantined (one error
            # row), never contradictorily both
            staged = []
            try:
                fps, idx = decode_video_index(p or b"")
                take = list(range(0, len(idx), self.every_nth))
                if idx and take[-1] != len(idx) - 1:
                    take.append(len(idx) - 1)
                for fi in take:
                    off, sz = idx[fi]
                    img = decode_image(p[off:off + sz])
                    staged.append((d, fi, len(idx), fps, img.shape[1],
                                   img.shape[0],
                                   float(int(img.sum(dtype=np.int64)))
                                   / img.size, None))
                if not idx:  # valid but empty container: one row, no
                    staged.append((d, -1, 0, fps, 0, 0, 0.0, None))
            except ValueError as ex:
                staged = [(d, -1, 0, 0, 0, 0, 0.0, str(ex))]
            for r in staged:
                emit(*r)
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "frame_idx": pa.array(rows["frame_idx"], pa.int64()),
            "n_frames": pa.array(rows["n_frames"], pa.int64()),
            "fps": pa.array(rows["fps"], pa.int64()),
            "width": pa.array(rows["width"], pa.int64()),
            "height": pa.array(rows["height"], pa.int64()),
            "mean_luma": pa.array(rows["mean_luma"], pa.float64()),
            "decode_error": pa.array(rows["decode_error"], pa.string()),
        })
