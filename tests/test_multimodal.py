"""Multimodal conventions: the decode seam is a REAL byte format (24-bit
BMP via tinymr_spark/tinybmp.py) that must fail loudly on anything it
cannot actually decode, and the two-stage mapInPandas pipeline must keep
its Arrow batch shape."""

from __future__ import annotations

import numpy as np
import pytest

from tinymr_spark.operators.multimodal import (
    TARGET,
    _synth_pixels,
    decode_image,
    q61_multimodal_decode,
    q65_multimodal_resize,
)
from tinymr_spark.tinybmp import BmpError, encode_bmp


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
