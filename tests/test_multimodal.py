"""Multimodal conventions: the decode seam is a REAL byte format (24-bit
BMP via tinymr_spark/tinybmp.py) that must fail loudly on anything it
cannot actually decode, and the two-stage mapInPandas pipeline must keep
its Arrow batch shape."""

from __future__ import annotations

import numpy as np
import pytest

from tinymr_spark.operators.multimodal import (
    GRID_H,
    GRID_W,
    TARGET,
    VID_FRAMES_BASE,
    VID_FRAMES_MOD,
    VID_SCENE_LEN,
    _luma_grid_batches,
    _synth_pixels,
    _synth_video,
    decode_image,
    q61_multimodal_decode,
    q65_multimodal_resize,
    q68_phash_dedup,
    q69_scene_cuts,
)
from tinymr_spark.tinybmp import BmpError, encode_bmp, iter_bmp_stream


def test_decode_image_is_real():
    img = _synth_pixels(doc_id=7, n_chars=100)
    w, h, rgb = decode_image(encode_bmp(img))
    assert (h, w, 3) == rgb.shape
    assert np.array_equal(rgb, img)


def test_decode_image_rejects_non_bmp_loudly():
    with pytest.raises(BmpError, match="magic"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 48)


def test_decode_emits_real_header_dims(spark, sf_dir):
    rows = q61_multimodal_decode(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # dims come from the BMP header the decoder parsed
        assert 8 <= r["width"] <= 31 and 8 <= r["height"] <= 23
        assert r["topleft_r"] == (r["doc_id"] * 7) % 256


def test_resize_dims_fit_target(spark, sf_dir):
    rows = q65_multimodal_resize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["out_w"] <= TARGET and 1 <= r["out_h"] <= TARGET
        # the longest decoded edge maps to exactly TARGET
        assert max(r["out_w"], r["out_h"]) == TARGET


def test_luma_grid_runs_on_decoded_pixels():
    """q68's grid stage must reflect the DECODED array: derive the
    expected luma grid independently from the source pixels (same floor
    mapping, BT.601 x1000 weights) and compare against what the batch fn
    produced from the encoded BMP payload."""
    import pandas as pd

    img = _synth_pixels(doc_id=11, n_chars=137)
    pdf = pd.DataFrame({"doc_id": [11], "payload": [encode_bmp(img)]})
    (out,) = list(_luma_grid_batches(iter([pdf])))
    h, w, _ = img.shape
    ys = (np.arange(GRID_H) * h) // GRID_H
    xs = (np.arange(GRID_W) * w) // GRID_W
    grid = img[ys][:, xs].astype(np.int64)
    expected = (grid[:, :, 0] * 299 + grid[:, :, 1] * 587 + grid[:, :, 2] * 114).reshape(-1)
    assert out["lumas"][0] == expected.tolist()


def test_phash_is_sensitive_to_decode_correctness():
    """A decoder that silently skipped the bottom-up row flip or the
    BGR->RGB swap must change the hash for an image that is not
    symmetric under those bugs (gradient down rows / across channels)."""
    img = _synth_pixels(doc_id=3, n_chars=55)

    def phash(arr):
        h, w, _ = arr.shape
        ys = (np.arange(GRID_H) * h) // GRID_H
        xs = (np.arange(GRID_W) * w) // GRID_W
        g = arr[ys][:, xs].astype(np.int64)
        luma = (g[:, :, 0] * 299 + g[:, :, 1] * 587 + g[:, :, 2] * 114).reshape(-1)
        mean = luma.sum() / luma.size
        return sum(1 << i for i, v in enumerate(luma) if v > mean)

    good = phash(img)
    assert good != phash(img[::-1])  # forgot the row un-flip
    assert good != phash(img[:, :, ::-1])  # forgot the BGR->RGB swap
    # and the real decode path agrees with the direct-array derivation
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [3], "payload": [encode_bmp(img)]})
    (out,) = list(_luma_grid_batches(iter([pdf])))
    luma = np.asarray(out["lumas"][0], dtype=np.int64)
    mean = luma.sum() / luma.size
    assert sum(1 << i for i, v in enumerate(luma) if v > mean) == good


def test_phash_dedup_partitions_all_docs(spark, sf_dir):
    df = q68_phash_dedup(spark, sf_dir)
    rows = df.collect()
    assert rows
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_images"] for r in rows) == n_docs
    assert all(r["phash"] >= 0 for r in rows)  # 56 bits stay positive


def test_video_payload_is_a_real_bmp_stream():
    payload = _synth_video(doc_id=9, n_chars=70)
    frames = list(iter_bmp_stream(payload))
    assert len(frames) == VID_FRAMES_BASE + 9 % VID_FRAMES_MOD
    means = []
    for frame in frames:
        w, h, rgb = decode_image(frame)
        assert (w, h) == (8 + 70 % 24, 8 + 9 % 16)  # q61 dims
        means.append(rgb.astype(np.int64).sum() / rgb.size)
    # within a scene the flicker delta is exactly 1
    for f in range(1, len(means)):
        if f % VID_SCENE_LEN != 0:
            assert abs(means[f] - means[f - 1]) == 1.0


def test_scene_cuts_fire_only_at_scene_boundaries(spark, sf_dir):
    rows = q69_scene_cuts(spark, sf_dir).collect()
    assert rows
    # cuts only ever land on scene-boundary frames
    assert all(r["frame_no"] % VID_SCENE_LEN == 0 and r["frame_no"] > 0 for r in rows)
    # ... but not every boundary is a cut: the detector discriminates
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").collect()
    boundaries = sum(
        (VID_FRAMES_BASE + r["doc_id"] % VID_FRAMES_MOD - 1) // VID_SCENE_LEN
        for r in docs
    )
    assert 0 < len(rows) < boundaries


def test_wav_round_trip_is_real():
    import numpy as np

    from tinymr_spark.operators.multimodal import AUDIO_RATE, decode_wav, encode_wav

    samples = np.arange(1000, dtype=np.uint8)
    payload = encode_wav(samples)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    rate, channels, out = decode_wav(payload)
    assert (rate, channels) == (AUDIO_RATE, 1)
    assert np.array_equal(out, samples)


def test_wav_rejects_garbage_loudly():
    import wave

    from tinymr_spark.operators.multimodal import decode_wav

    with pytest.raises(wave.Error):
        decode_wav(b"\x89PNG not audio at all" + b"\x00" * 40)


def test_wav_error_surface_is_single_typed():
    """Garbage and bit-flipped payloads must decode or raise wave.Error —
    nothing else (the bare stdlib parser leaks EOFError/RuntimeError on
    adversarial chunks; decode_wav normalizes them)."""
    import random
    import wave

    import numpy as np

    from tinymr_spark.operators.multimodal import decode_wav, encode_wav

    rng = random.Random(7)
    for _ in range(400):
        data = bytes(rng.randrange(256) for _ in range(rng.randint(0, 120)))
        try:
            decode_wav(data)
        except wave.Error:
            pass
    base = bytearray(encode_wav(np.arange(300, dtype=np.uint8)))
    for _ in range(400):
        p = bytearray(base)
        for _f in range(rng.randint(1, 8)):
            p[rng.randrange(len(p))] ^= rng.randrange(1, 256)
        try:
            decode_wav(bytes(p))
        except wave.Error:
            pass
