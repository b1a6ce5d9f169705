"""PNG decode (stdlib zlib, filters 0-4) — round-trip against encode_png
and hand-built palette/corrupt fixtures."""
import numpy as np
import pytest
import zlib

from etl_ray.ops.multimodal import (_PNG_SIG, _png_decode, decode_image,
                                    encode_png)


def ref_image(h, w, ch, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_filters_and_channels(filter_type, ch):
    img = ref_image(13, 7, ch, seed=filter_type * 10 + ch)
    out = decode_image(encode_png(img, filter_type=filter_type))
    assert out.shape == (13, 7, ch)
    assert np.array_equal(out, img)


def test_png_roundtrip_gradient_paeth():
    # gradients exercise every branch of the Paeth predictor
    y, x = np.mgrid[0:32, 0:17]
    img = ((y * 11 + x * 7) % 256).astype(np.uint8)[:, :, None]
    img = np.repeat(img, 3, axis=2)
    img[:, :, 1] = (255 - img[:, :, 1])
    for f in (3, 4):
        assert np.array_equal(decode_image(encode_png(img, filter_type=f)),
                              img)


def test_png_palette_decode():
    # hand-build a color-type-3 PNG: 2x3 image indexing a 4-entry palette
    idx = np.array([[0, 1, 2], [3, 2, 1]], np.uint8)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]],
                   np.uint8)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = (3).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes(
        [8, 3, 0, 0, 0])

    def chunk(typ, data):
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return len(data).to_bytes(4, "big") + typ + data + crc.to_bytes(
            4, "big")

    b = (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", pal.tobytes())
         + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    out = _png_decode(b)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out, pal[idx])


def test_png_ancillary_chunks_skipped():
    img = ref_image(4, 4, 3, seed=9)
    b = encode_png(img, filter_type=2)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    crc = zlib.crc32(b"tEXtk\x00v") & 0xFFFFFFFF
    text = (3).to_bytes(4, "big") + b"tEXtk\x00v" + crc.to_bytes(4, "big")
    spliced = b[:ihdr_end] + text + b[ihdr_end:]
    assert np.array_equal(decode_image(spliced), img)


@pytest.mark.parametrize("breakage", ["sig", "truncated", "depth", "inflate"])
def test_png_corrupt_raises_value_error(breakage):
    img = ref_image(5, 5, 3)
    b = bytearray(encode_png(img))
    if breakage == "sig":
        b[1] = 0x51
    elif breakage == "truncated":
        b = b[: len(b) // 2]
        # drop IDAT entirely so decode sees missing data, not short inflate
        b = bytearray(_PNG_SIG) + b[8: 8 + 25]
    elif breakage == "depth":
        b[8 + 8 + 8] = 16  # IHDR bit depth byte
    elif breakage == "inflate":
        b[8 + 25 + 12] ^= 0xFF  # first IDAT payload byte
    with pytest.raises(ValueError):
        _png_decode(bytes(b))


def test_decoder_stage_handles_png(ray_session):
    import ray.data as rd

    from etl_ray.ops.multimodal import RealImageDecoder, decode_images

    imgs = [ref_image(6, 9, 3, seed=s) for s in range(4)]
    rows = [{"doc_id": i, "payload": encode_png(m, filter_type=i % 5),
             "media_type": "image/png", "payload_bytes": 0}
            for i, m in enumerate(imgs)]
    rows.append({"doc_id": 99, "payload": b"\xff\xd8jpeg",
                 "media_type": "image/jpeg", "payload_bytes": 0})
    out = decode_images(rd.from_items(rows), decoder=RealImageDecoder(),
                        concurrency=2).to_pandas().sort_values("doc_id")
    ok = out[out.doc_id < 99]
    assert list(ok.width) == [9] * 4 and list(ok.height) == [6] * 4
    exp_means = [float(int(m.sum(dtype=np.int64))) / m.size for m in imgs]
    assert np.allclose(ok.mean_luma, exp_means)
    bad = out[out.doc_id == 99].iloc[0]
    assert bad.decode_error is not None and bad.width == 0


@pytest.mark.usefixtures("ray_session")
def test_resize_nearest_grid_and_stage():
    import numpy as np
    import pyarrow as pa

    from etl_ray.ops.multimodal import (ImageResizer, decode_image,
                                        encode_png, resize_nearest)

    # pixel-center mapping, hand-computed: 4 -> 2 samples rows/cols 1, 3
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    r = resize_nearest(img, 2, 2)
    assert r[:, :, 0].tolist() == [[15, 21], [39, 45]]
    # upscale: 1x1 -> 3x3 replicates the single pixel
    one = np.full((1, 1, 1), 7, np.uint8)
    assert (resize_nearest(one, 3, 3) == 7).all()

    # the stage: decode -> resize -> PNG re-encode round-trips exactly,
    # corrupt payload surfaces decode_error with zeroed dims
    ppm = b"P5\n4 4\n255\n" + bytes(range(16))
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([ppm, b"\xff\xd8junk"], pa.binary()),
    })
    out = ImageResizer(out_h=2, out_w=2)(batch)
    assert out["width"].to_pylist() == [2, 0]
    assert out["decode_error"].to_pylist()[0] is None
    assert out["decode_error"].to_pylist()[1] is not None
    back = decode_image(out["payload"].to_pylist()[0])
    src = np.frombuffer(bytes(range(16)), np.uint8).reshape(4, 4, 1)
    assert (back == resize_nearest(src, 2, 2)).all()
    # exact integer mean contract
    exp = resize_nearest(src, 2, 2)
    assert out["mean_luma"].to_pylist()[0] == int(exp.sum()) / exp.size


def test_wav_chunk_walker_and_features():
    import numpy as np
    import pyarrow as pa

    from etl_ray.ops.multimodal import AudioFeatures, decode_wav, encode_wav

    s = np.array([5, 5, 5, -7], np.int16)
    wav = encode_wav(s, sample_rate=8000, channels=2)
    # odd-sized chunk before data: the walker must word-align past it
    extra = b"LIST" + (3).to_bytes(4, "little") + b"IN\x00" + b"\x00"
    wav2 = wav[:36] + extra + wav[36:]
    wav2 = wav2[:4] + (len(wav2) - 8).to_bytes(4, "little") + wav2[8:]
    r, c, back = decode_wav(wav2)
    assert (r, c) == (8000, 2) and (back == s).all()

    out = AudioFeatures()(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([wav, b"OggScorrupt"], pa.binary()),
    }))
    assert out["n_samples"].to_pylist() == [2, 0]  # per channel
    assert out["mean_amp"].to_pylist()[0] == (5 + 5 + 5 - 7) / 4
    assert out["mean_square"].to_pylist()[0] == (25 * 3 + 49) / 4
    assert out["decode_error"].to_pylist()[1] is not None
    # non-PCM and wrong-bit-depth rejections
    bad = bytearray(encode_wav(s))
    bad[20] = 3  # float format
    import pytest as _pt
    with _pt.raises(ValueError):
        decode_wav(bytes(bad))


def test_video_container_sampling():
    import numpy as np
    import pyarrow as pa

    from etl_ray.ops.multimodal import (VideoFrameSampler,
                                        decode_video_index, encode_video)

    frames = [np.full((2, 3, 1), i * 10, np.uint8) for i in range(9)]
    v = encode_video(frames, fps=5)
    fps, idx = decode_video_index(v)
    assert fps == 5 and len(idx) == 9
    out = VideoFrameSampler(every_nth=4)(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([v, b"bad"], pa.binary()),
    })).to_pandas()
    good = out[out.doc_id == 1]
    assert good["frame_idx"].tolist() == [0, 4, 8]  # every 4th + last
    assert good["mean_luma"].tolist() == [0.0, 40.0, 80.0]
    bad = out[out.doc_id == 2]
    assert bad["frame_idx"].tolist() == [-1]
    assert bad["decode_error"].iloc[0] is not None

    # truncated index / out-of-range offsets must raise, not segfault-read
    import pytest as _pt
    with _pt.raises(ValueError):
        decode_video_index(v[:14])
    corrupt = bytearray(v)
    corrupt[12] = 0xFF  # first frame offset -> way past end
    corrupt[13] = 0xFF
    with _pt.raises(ValueError):
        decode_video_index(bytes(corrupt))


def test_png_malformed_quarantines_not_crashes():
    import struct

    from etl_ray.ops.multimodal import _PNG_SIG, decode_image

    def chunk(typ, data):
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    # palette image whose pixel index exceeds the 2-entry PLTE: must raise
    # ValueError (quarantine path), not IndexError (task death)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    raw = b"\x00" + bytes([0, 5])  # filter 0, indexes 0 and 5
    png = (_PNG_SIG + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", bytes([10, 10, 10, 20, 20, 20]))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index"):
        decode_image(png)

    # decompression bomb: tiny IDAT inflating to ~100 MB must be rejected
    # by the bounded inflate (size mismatch), never fully decompressed
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)  # claims 2x1 gray
    bomb = zlib.compress(b"\x00" * 100_000_000, 9)  # ~95 KB compressed
    png = (_PNG_SIG + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="size mismatch"):
        decode_image(png)


def test_wav_truncated_chunk_rejected():
    import numpy as np

    from etl_ray.ops.multimodal import decode_wav, encode_wav

    wav = encode_wav(np.array([1, 2, 3, 4], np.int16))
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(wav[:-4])  # data chunk declares more than remains


def test_video_zero_frames_and_partial_corruption():
    import numpy as np
    import pyarrow as pa

    from etl_ray.ops.multimodal import VideoFrameSampler, encode_video

    empty = encode_video([], fps=7)
    frames = [np.full((2, 2, 1), i, np.uint8) for i in range(5)]
    good = encode_video(frames, fps=5)
    # garble frame 4's PNG bytes but keep the index valid: the doc must
    # surface ONE error row, not good-rows-plus-error
    _, idx = __import__("etl_ray.ops.multimodal",
                        fromlist=["decode_video_index"]
                        ).decode_video_index(good)
    off, sz = idx[4]
    bad = good[:off] + b"\x00" * sz + good[off + sz:]
    out = VideoFrameSampler(every_nth=4)(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([empty, good, bad], pa.binary()),
    })).to_pandas()
    e = out[out.doc_id == 1]
    assert len(e) == 1 and e["n_frames"].iloc[0] == 0 \
        and e["fps"].iloc[0] == 7 and e["decode_error"].iloc[0] is None
    g = out[out.doc_id == 2]
    assert g["frame_idx"].tolist() == [0, 4]
    b3 = out[out.doc_id == 3]
    assert len(b3) == 1 and b3["decode_error"].iloc[0] is not None
