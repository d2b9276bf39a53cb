"""Native C++ loader/prefetcher vs the NumPy reference loader."""

import numpy as np
import pytest

from aloam_tpu.io import kitti, native_loader


pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="no C++ toolchain")


def _write_bins(tmp_path, rng, n_frames=5, n_pts=200):
    paths = []
    clouds = []
    for i in range(n_frames):
        pts = rng.normal(size=(n_pts + i, 4)).astype(np.float32)
        p = str(tmp_path / f"{i:06d}.bin")
        pts.tofile(p)
        paths.append(p)
        clouds.append(pts)
    return paths, clouds


def test_native_read_matches_numpy(tmp_path, rng):
    paths, clouds = _write_bins(tmp_path, rng, n_frames=1)
    xyz, mask, refl = native_loader.read_bin_padded(paths[0], 512)
    ref = kitti.read_bin(paths[0])
    n = ref.shape[0]
    assert mask.sum() == n
    np.testing.assert_allclose(xyz[:n], ref[:, :3])
    np.testing.assert_allclose(refl[:n], ref[:, 3])
    assert not mask[n:].any()
    np.testing.assert_allclose(xyz[n:], 0.0)


def test_native_read_truncates_to_pad(tmp_path, rng):
    paths, clouds = _write_bins(tmp_path, rng, n_frames=1, n_pts=300)
    xyz, mask, refl = native_loader.read_bin_padded(paths[0], 100)
    assert mask.sum() == 100
    np.testing.assert_allclose(xyz, clouds[0][:100, :3])


def test_prefetcher_in_order(tmp_path, rng):
    paths, clouds = _write_bins(tmp_path, rng)
    pf = native_loader.Prefetcher(paths, n_pad=512, depth=3, n_threads=3)
    frames = list(pf)
    pf.close()
    assert len(frames) == len(paths)
    for (xyz, mask, refl), ref in zip(frames, clouds):
        n = ref.shape[0]
        assert mask.sum() == n
        np.testing.assert_allclose(xyz[:n], ref[:, :3])
        np.testing.assert_allclose(refl[:n], ref[:, 3])
