"""Bit-parity tests for the native JPEG decode core (native/jpeg_core.cpp).

Contract under test (exact mode): ``decode_resize_batch(paths, hw)`` is
BIT-IDENTICAL to the reference's per-frame PIL path
``np.asarray(Image.open(p).convert("RGB").resize((hw, hw)))``
(reference: vidsitu_code/dat_loader.py:183-191, paid per frame inside
torch DataLoader workers at dat_loader.py:454-475). Covers:

* decode parity (system libjpeg vs Pillow's bundled libjpeg-turbo),
* resample parity (the C++ reimplementation of Pillow's fixed-point
  BICUBIC two-pass resample) across down/up/same-size/aspect cases,
* thread-count invariance, error surfacing, fast-mode shape contract,
  and the PIL fallback when the core is disabled.
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from vidsitu_tpu.data.frames import read_img, read_img_batch
from vidsitu_tpu.native import (
    decode_resize_batch,
    load_jpeg_core,
    pillow_resize_rgb,
)

pytestmark = pytest.mark.skipif(
    load_jpeg_core() is None,
    reason="native jpeg core unavailable (no toolchain or libjpeg)",
)


def _structured_rgb(h, w, seed):
    """Gradient + noise image: exercises both smooth DCT blocks and
    high-frequency content."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(h + w - 2, 1)),
        ],
        axis=-1,
    ).astype(np.uint8)
    noise = rng.integers(0, 64, size=(h, w, 3), dtype=np.uint8)
    return (base.astype(np.int16) + noise).clip(0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    """A spread of JPEGs: sizes around the 224 target, quality levels,
    chroma subsampling variants, and a grayscale file."""
    d = tmp_path_factory.mktemp("jpegs")
    specs = [
        ("big", 720, 1280, 85, 2),     # downscale, 4:2:0 (ffmpeg default)
        ("mid", 360, 640, 95, 0),      # downscale, 4:4:4
        ("small", 96, 128, 75, 1),     # upscale, 4:2:2
        ("same", 224, 224, 85, 2),     # same-size short-circuit
        ("tall", 400, 150, 85, 2),     # aspect: h-down, w-up
    ]
    paths = []
    for i, (name, h, w, q, subs) in enumerate(specs):
        p = d / f"{name}.jpg"
        Image.fromarray(_structured_rgb(h, w, seed=i)).save(
            p, quality=q, subsampling=subs
        )
        paths.append(p)
    g = d / "gray.jpg"
    Image.fromarray(
        _structured_rgb(300, 500, seed=99)[:, :, 0], mode="L"
    ).save(g, quality=85)
    paths.append(g)
    return paths


def test_decode_resize_bit_parity(jpeg_dir):
    """End-to-end: native batch == PIL per-frame, bit for bit."""
    want = np.stack([read_img(p, out_hw=224) for p in jpeg_dir])
    got = decode_resize_batch(jpeg_dir, 224)
    assert got is not None
    assert got.dtype == np.uint8 and got.shape == want.shape
    assert np.array_equal(got, want), (
        f"mismatch at {np.argwhere(got != want)[:5]}"
    )


def test_decode_resize_other_sizes(jpeg_dir):
    for hw in (112, 256):
        want = np.stack([read_img(p, out_hw=hw) for p in jpeg_dir])
        got = decode_resize_batch(jpeg_dir, hw)
        assert np.array_equal(got, want), hw


def test_thread_count_invariance(jpeg_dir):
    one = decode_resize_batch(jpeg_dir, 224, n_threads=1)
    four = decode_resize_batch(jpeg_dir, 224, n_threads=4)
    assert np.array_equal(one, four)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((480, 640), (224, 224)),   # downscale both
        ((100, 80), (224, 224)),    # upscale both
        ((224, 224), (224, 224)),   # identity copy path
        ((224, 640), (224, 224)),   # horizontal pass only
        ((480, 224), (224, 224)),   # vertical pass only
        ((57, 301), (17, 111)),     # odd sizes
        ((3, 5), (97, 131)),        # tiny input, large upscale
    ],
)
def test_resample_bit_parity(in_hw, out_hw):
    """Resize-only hook vs Pillow's own resample on raw arrays —
    isolates the Resample.c reimplementation from the decoder."""
    rng = np.random.default_rng(hash(in_hw + out_hw) % 2**32)
    img = rng.integers(0, 256, size=(*in_hw, 3), dtype=np.uint8)
    want = np.asarray(
        Image.fromarray(img).resize((out_hw[1], out_hw[0]))
    )
    got = pillow_resize_rgb(img, out_hw[1], out_hw[0])
    assert got is not None
    assert np.array_equal(got, want)


def test_fast_mode_shape_and_closeness(jpeg_dir):
    """fast=True (DCT-scaled decode) keeps the output contract and
    stays visually close, but is documented as not bit-identical."""
    exact = decode_resize_batch(jpeg_dir, 224)
    fast = decode_resize_batch(jpeg_dir, 224, fast=True)
    assert fast.shape == exact.shape and fast.dtype == np.uint8
    diff = np.abs(fast.astype(np.int16) - exact.astype(np.int16))
    assert diff.mean() < 8.0, diff.mean()


def test_missing_file_raises(jpeg_dir, tmp_path):
    with pytest.raises(FileNotFoundError):
        decode_resize_batch([jpeg_dir[0], tmp_path / "nope.jpg"], 224)


def test_corrupt_file_falls_back_then_pil_raises(tmp_path):
    """Undecodable-but-existing files return None (PIL fallback: some
    files the native core rejects — CMYK/YCCK — PIL decodes fine); for
    genuinely corrupt data the PIL path then raises, so garbage never
    reaches the model either way."""
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8 this is not a jpeg")
    assert decode_resize_batch([bad], 224) is None
    with pytest.raises(Exception):
        read_img_batch([bad], out_hw=224)


def test_empty_batch():
    out = decode_resize_batch([], 224)
    assert out.shape == (0, 224, 224, 3)


def test_read_img_batch_falls_back_without_native(jpeg_dir, monkeypatch):
    """VIDSITU_NO_NATIVE=1 routes read_img_batch through pure PIL and
    yields the same pixels (the fallback the loader relies on)."""
    native = read_img_batch(jpeg_dir, out_hw=224)
    monkeypatch.setenv("VIDSITU_NO_NATIVE", "1")
    assert decode_resize_batch(jpeg_dir, 224) is None
    pil = read_img_batch(jpeg_dir, out_hw=224)
    assert np.array_equal(native, pil)


def test_truncated_stream_never_returns_garbage(jpeg_dir, tmp_path):
    """A JPEG cut off mid-scan must not return garbage: the native core
    reports it (None -> PIL fallback) and PIL raises too (unless
    LOAD_TRUNCATED_IMAGES is set)."""
    data = jpeg_dir[0].read_bytes()
    trunc = tmp_path / "trunc.jpg"
    trunc.write_bytes(data[: len(data) // 3])
    assert decode_resize_batch([trunc], 224) is None
    with pytest.raises(Exception):
        read_img_batch([trunc], out_hw=224)
