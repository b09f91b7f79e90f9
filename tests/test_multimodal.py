"""Multimodal conventions: the real-codec seam must fail loudly (no
silent fake pixels), and the two-stage mapInPandas pipeline must keep its
Arrow batch shape."""

from __future__ import annotations

import pytest

from tinymr_spark.operators.multimodal import decode_image, q65_multimodal_resize


def test_decode_image_stub_raises_actionably():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_resize_dims_fit_target(spark, sf_dir):
    rows = q65_multimodal_resize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["out_w"] <= 224 and 0 <= r["out_h"] <= 224
        # the longest decoded edge maps to exactly TARGET
        assert max(r["out_w"], r["out_h"]) == 224 or max(r["width"], r["height"]) <= 1
