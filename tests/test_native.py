"""Native C++ image kernels (native/imageproc.cpp via ctypes):
self-building load path + numeric parity with PIL (VERDICT r2 item 7 —
the .so is gitignored, so a fresh clone must build it on first use, and
its resize must be verified against the PIL filters it replaces;
reference torchvision/PIL dependency, training/dataset.py:238-316).
"""
import os
import subprocess
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from view_neti_tpu.data import native

NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"


def _toolchain_available() -> bool:
    try:
        subprocess.run(["g++", "--version"], capture_output=True,
                       timeout=30, check=True)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


pytestmark = pytest.mark.skipif(
    not (_toolchain_available() or
         (NATIVE_DIR / "libimageproc.so").exists()),
    reason="no g++ and no prebuilt libimageproc.so")


class TestSelfBuild:
    def test_library_builds_and_loads_from_source(self):
        lib = native.load_library()
        assert lib is not None, \
            "load_library() must build native/libimageproc.so on demand"
        assert native.available()

    def test_no_native_env_forces_fallback(self, monkeypatch):
        monkeypatch.setenv("VIEW_NETI_NO_NATIVE", "1")
        monkeypatch.setattr(native, "_lib", None)
        assert native.load_library() is None
        assert not native.available()
        monkeypatch.delenv("VIEW_NETI_NO_NATIVE")
        monkeypatch.setattr(native, "_lib", None)
        assert native.available()

    def test_corrupt_library_degrades_to_pil(self, tmp_path, monkeypatch):
        """A truncated .so (build killed mid-link) passes the exists+mtime
        check; load_library must degrade to the PIL path (return None) and
        remove the corrupt file so a later process rebuilds — never raise
        into Coach.__init__."""
        bad = tmp_path / "libimageproc.so"
        bad.write_bytes(b"\x7fELF not really")
        monkeypatch.setattr(native, "_NATIVE_DIR", tmp_path)
        monkeypatch.setattr(native, "_LIB_PATH", bad)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_build_attempted", False)
        assert native.load_library() is None
        assert not bad.exists(), "corrupt .so must be removed for rebuild"


def _rand_img(h, w, seed=0):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3), dtype=np.uint8)


class TestResizeParityWithPIL:
    """The C++ resize implements PIL's antialiased filters (Catmull-Rom
    bicubic / triangle bilinear with support widened by the downscale
    factor). PIL quantizes intermediates differently, so parity is
    tolerance-based: mean |diff| well under 1 LSB-equivalent, max a few
    counts."""

    @pytest.mark.parametrize("mode,pil_filter", [
        ("bicubic", Image.Resampling.BICUBIC),
        ("bilinear", Image.Resampling.BILINEAR)])
    @pytest.mark.parametrize("src,dst", [
        ((1200, 1600), (384, 512)),     # DTU preprocess-1 downscale
        ((48, 64), (300, 400)),         # metric-protocol upscale
        ((100, 100), (77, 131))])       # odd sizes
    def test_resize_matches_pil(self, mode, pil_filter, src, dst):
        if native.load_library() is None:
            pytest.skip("native build failed")
        img = _rand_img(*src)
        ours = native.resize(img, dst[0], dst[1], mode=mode)
        ref = np.asarray(Image.fromarray(img).resize(
            (dst[1], dst[0]), pil_filter))
        assert ours.shape == ref.shape == (dst[0], dst[1], 3)
        diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
        assert diff.mean() < 1.0, f"mean diff {diff.mean()}"
        assert np.percentile(diff, 99) <= 3, "p99 diff high"
        # PIL quantizes each 1-D pass to uint8; Catmull-Rom overshoot at
        # sharp random-noise edges then disagrees by up to ~20 counts on
        # isolated pixels (p99 is still <=3)
        assert diff.max() <= 32, f"max diff {diff.max()}"

    def test_identity_resize_is_exact(self):
        if native.load_library() is None:
            pytest.skip("native build failed")
        img = _rand_img(40, 56, seed=1)
        np.testing.assert_array_equal(
            native.resize(img, 40, 56, mode="bilinear"), img)


class TestNormalizeAndFlip:
    def test_normalize_matches_numpy(self):
        if native.load_library() is None:
            pytest.skip("native build failed")
        img = _rand_img(17, 23, seed=2)
        np.testing.assert_allclose(
            native.normalize(img), img.astype(np.float32) / 127.5 - 1.0,
            atol=1e-6)

    def test_hflip_matches_numpy(self):
        if native.load_library() is None:
            pytest.skip("native build failed")
        img = _rand_img(9, 13, seed=3)
        np.testing.assert_array_equal(native.hflip(img), img[:, ::-1])
