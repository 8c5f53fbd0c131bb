"""Native C++ library: build, and parity with the numpy/JAX fallbacks."""

import os
import numpy as np
import pytest

from tandem_tpu import native_bridge as nb


@pytest.fixture(scope="module")
def lib():
    lib = nb.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_version(lib):
    assert lib.tandem_native_version() >= 1


def test_remap_identity(lib, rng):
    img = (rng.rand(40, 50, 3) * 255).astype(np.uint8)
    ys, xs = np.mgrid[0:40, 0:50].astype(np.float32)
    out = nb.remap_u8(img, xs, ys)
    np.testing.assert_allclose(out[:39, :49], img[:39, :49].astype(np.float32),
                               atol=1e-3)


def test_remap_matches_numpy(lib, rng):
    img = (rng.rand(40, 50) * 255).astype(np.uint8)
    mx = (rng.rand(30, 30) * 48).astype(np.float32)
    my = (rng.rand(30, 30) * 38).astype(np.float32)
    native = nb.remap_u8(img, mx, my)

    x0 = np.floor(mx).astype(int)
    y0 = np.floor(my).astype(int)
    wx = mx - x0
    wy = my - y0
    s = img.astype(np.float32)
    expect = (s[y0, x0] * (1 - wx) * (1 - wy) + s[y0, x0 + 1] * wx * (1 - wy)
              + s[y0 + 1, x0] * (1 - wx) * wy + s[y0 + 1, x0 + 1] * wx * wy)
    np.testing.assert_allclose(native, expect, atol=1e-3)


def test_remap_lut(lib, rng):
    img = np.full((8, 8), 100, np.uint8)
    ys, xs = np.mgrid[0:8, 0:8].astype(np.float32)
    lut = (np.arange(256, dtype=np.float32) * 2.0)
    out = nb.remap_u8(img, xs, ys, lut256=lut)
    np.testing.assert_allclose(out[:7, :7], 200.0, atol=1e-3)


def test_pyramid_matches_jax(lib, rng):
    img = (rng.rand(64, 96) * 255).astype(np.float32)
    native = nb.build_pyramid_native(img, 4)

    import jax.numpy as jnp
    from tandem_tpu.core.pyramid import build_pyramid
    ref = build_pyramid(jnp.asarray(img), 4)
    for l in range(4):
        np.testing.assert_allclose(native[l][0], np.asarray(ref[l]["img"]),
                                   atol=1e-4)
        np.testing.assert_allclose(native[l][1], np.asarray(ref[l]["gx"]),
                                   atol=1e-4)
        np.testing.assert_allclose(native[l][2], np.asarray(ref[l]["gy"]),
                                   atol=1e-4)


def test_bgr_to_rgb(lib, rng):
    bgr = (rng.rand(16, 20, 3) * 255).astype(np.uint8)
    out = nb.bgr_to_rgb_chw(bgr)
    expect = (bgr[..., ::-1].astype(np.float32) / 255.0).transpose(2, 0, 1)
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_prefetch_image_loader(tmp_path):
    """Native background decoder delivers byte-identical frames and
    tolerates out-of-order skips (seek-forward semantics)."""
    import cv2
    from tandem_tpu.native_bridge import PrefetchImageLoader

    rng = np.random.RandomState(0)
    paths = []
    for i in range(12):
        img = rng.randint(0, 255, (32, 40, 3)).astype(np.uint8)
        p = str(tmp_path / f"{i:03d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    pl = PrefetchImageLoader(paths, ahead=3)
    try:
        # Forward skips AND backward seeks: the worker only decodes
        # forward; backward reads must fall back (not deadlock).
        for i in (0, 1, 2, 5, 6, 3, 11, 0):
            a = pl.read(i)
            b = cv2.imread(paths[i], cv2.IMREAD_COLOR)
            assert np.array_equal(a, b), i
    finally:
        pl.close()


def test_reader_uses_prefetch(tmp_path):
    """ImageFolderReader picks up the native prefetcher on plain folders."""
    import cv2
    from tandem_tpu.data.reader import ImageFolderReader
    from tandem_tpu.native_bridge import get_lib

    rng = np.random.RandomState(1)
    for i in range(4):
        cv2.imwrite(str(tmp_path / f"{i:02d}.png"),
                    rng.randint(0, 255, (32, 64, 3)).astype(np.uint8))
    r = ImageFolderReader(str(tmp_path))
    lib = get_lib()
    if lib is not None and lib.tandem_loader_available():
        assert r._prefetch is not None
    gray, ts, exp = r.get_image(0)
    bgr = r.get_image_bgr(0)
    assert gray.shape == (32, 64) and bgr.shape == (32, 64, 3)


def test_bgr_pack_u8_matches_numpy():
    from tandem_tpu.native_bridge import bgr_pack_u8

    rng = np.random.RandomState(11)
    bgrs = [rng.randint(0, 255, (32, 48, 3)).astype(np.uint8)
            for _ in range(5)]
    out = bgr_pack_u8(bgrs)
    ref = np.ascontiguousarray(np.transpose(
        np.stack([np.ascontiguousarray(b[..., ::-1]) for b in bgrs]),
        (0, 3, 1, 2)))
    assert out.dtype == np.uint8 and np.array_equal(out, ref)


@pytest.mark.slow
def test_tsan_race_detection():
    """Host-threading race CI (SURVEY.md §5.2): builds the native lib +
    stress harness under -fsanitize=thread and fails on any data race.
    The harness already caught one real bug: concurrent external
    ParallelFor callers raced on the dispatch slots (fixed with the
    submit lock, tandem_native.cpp ThreadPool::ParallelFor)."""
    import subprocess
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "tsan_check.sh")
    probe = subprocess.run(
        ["g++", "-fsanitize=thread", "-x", "c++", "-", "-o", "/dev/null"],
        input=b"int main(){return 0;}", capture_output=True)
    if probe.returncode != 0:
        pytest.skip("toolchain lacks -fsanitize=thread")
    r = subprocess.run(["bash", script], capture_output=True, timeout=600)
    assert r.returncode == 0, r.stdout.decode() + r.stderr.decode()
