"""The optional PIL / PyAV codec seams (functions/multimodal.py).

VERDICT r13 #7: these were `pragma: no cover` because Pillow and PyAV
are absent in this container — an untested path users with those libs
installed would hit silently. These tests exercise the REAL seam code
(open/load/mode-convert/array-shape for `_pil_decode`; demux loop,
cadence arithmetic, netpbm re-encode for `_av_sample_frames`) by
injecting stub modules into ``sys.modules`` — driver-side, because
the kernels are plain Python functions and the Spark-side plumbing
around them is already pinned by the netpbm/WAV oracles
(`m_image`/`m_audio`/`m_dhash`). When the real libraries ARE
installed, the import-gated tests at the bottom run against them.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from cayley_spark.functions.multimodal import (
    _av_sample_frames,
    _pil_decode,
    _ppm_decode,
)


class _FakeImg:
    def __init__(self, arr, mode):
        self._arr = arr
        self.mode = mode
        self.loaded = False

    def load(self):
        self.loaded = True

    def convert(self, mode):
        assert mode == "RGB"
        a = self._arr
        if a.ndim == 2:
            a = np.repeat(a[:, :, None], 3, axis=2)
        return _FakeImg(a, "RGB")

    def __array__(self, dtype=None, copy=None):
        return self._arr


def _install_fake_pil(monkeypatch, img):
    fake_image = types.ModuleType("PIL.Image")
    fake_image.open = lambda bio: img
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image)


def test_pil_decode_rgb_passthrough(monkeypatch):
    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    img = _FakeImg(arr, "RGB")
    _install_fake_pil(monkeypatch, img)
    w, h, c, got = _pil_decode(b"\x89PNG...")
    assert (w, h, c) == (3, 2, 3)
    assert img.loaded  # the seam must force the lazy decode
    assert np.array_equal(got, arr)


def test_pil_decode_palette_converts_and_gray_gains_axis(monkeypatch):
    # palette mode -> convert("RGB")
    arr = np.full((4, 5), 7, dtype=np.uint8)
    _install_fake_pil(monkeypatch, _FakeImg(arr, "P"))
    w, h, c, got = _pil_decode(b"GIF89a...")
    assert (w, h, c) == (5, 4, 3)
    assert got.shape == (4, 5, 3)
    # grayscale "L" stays 1-channel but gains the channel axis
    _install_fake_pil(monkeypatch, _FakeImg(arr, "L"))
    w, h, c, got = _pil_decode(b"\x89PNG...")
    assert (w, h, c) == (5, 4, 1)
    assert got.shape == (4, 5, 1)


def test_pil_decode_corrupt_payload_returns_none(monkeypatch):
    def _boom(bio):
        raise OSError("cannot identify image file")

    fake_image = types.ModuleType("PIL.Image")
    fake_image.open = _boom
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image)
    assert _pil_decode(b"not an image") is None


class _FakeFrame:
    def __init__(self, t, arr):
        self.time = t
        self._arr = arr

    def to_ndarray(self, format):
        assert format == "rgb24"
        return self._arr


class _FakeContainer:
    def __init__(self, frames):
        self._frames = frames
        self.streams = types.SimpleNamespace(video=[object()])

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def decode(self, stream):
        return iter(self._frames)


def test_av_sample_frames_cadence_and_ppm_roundtrip(monkeypatch):
    mk = lambda v: np.full((2, 2, 3), v, dtype=np.uint8)  # noqa: E731
    frames = [
        _FakeFrame(0.0, mk(1)),
        _FakeFrame(0.4, mk(2)),   # < next_ts 1000 -> skipped
        _FakeFrame(1.05, mk(3)),  # >= 1000 -> taken, next 2000
        _FakeFrame(1.5, mk(4)),   # skipped
        _FakeFrame(2.2, mk(5)),   # taken
        _FakeFrame(None, mk(6)),  # missing pts -> treated as t=0, late
    ]
    fake_av = types.ModuleType("av")
    fake_av.open = lambda bio: _FakeContainer(frames)
    monkeypatch.setitem(sys.modules, "av", fake_av)
    out = _av_sample_frames(b"\x00\x00\x00 ftypmp42", every_ms=1000)
    assert [ts for ts, _ in out] == [0, 1050, 2200]
    # each sampled frame re-encodes as netpbm the image operators read
    for (ts, blob), v in zip(out, (1, 3, 5)):
        w, h, c, arr = _ppm_decode(blob)
        assert (w, h, c) == (2, 2, 3)
        assert arr.min() == arr.max() == v


def test_av_sample_frames_unreadable_container_returns_none(monkeypatch):
    fake_av = types.ModuleType("av")

    def _boom(bio):
        raise ValueError("moov atom not found")

    fake_av.open = _boom
    monkeypatch.setitem(sys.modules, "av", fake_av)
    assert _av_sample_frames(b"garbage", 1000) is None


def test_seams_return_none_when_libs_absent(monkeypatch):
    """The documented contract in THIS container: no PIL/av -> None,
    so callers take the deterministic-fake path."""
    monkeypatch.setitem(sys.modules, "PIL", None)
    monkeypatch.setitem(sys.modules, "av", None)
    assert _pil_decode(b"\x89PNG") is None
    assert _av_sample_frames(b"\x00ftyp", 500) is None


# ---- real-library fixtures: run wherever Pillow / PyAV exist ------


def test_pil_decode_real_png_when_available(tmp_path):
    Image = pytest.importorskip("PIL.Image")
    import io

    arr = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, format="PNG")
    w, h, c, got = _pil_decode(buf.getvalue())
    assert (w, h, c) == (3, 4, 3)
    assert np.array_equal(got, arr)


def test_av_sample_frames_real_container_when_available(tmp_path):
    av = pytest.importorskip("av")
    import io

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=10)
        stream.width, stream.height, stream.pix_fmt = 32, 32, "yuv420p"
        for i in range(25):
            arr = np.full((32, 32, 3), i * 10 % 256, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(arr, format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    out = _av_sample_frames(buf.getvalue(), every_ms=1000)
    assert out and all(_ppm_decode(b) is not None for _, b in out)
