"""Recorded-input regression: a synthetic scan serialized to a KITTI
``.bin`` and read back through BOTH loaders must produce bit-identical
frontend features to the in-memory path (VERDICT r4 item 7 — the binary
ingest path is the one a real-KITTI user hits first,
kittiHelper.cpp:25-35 reads the same float32 x/y/z/r rows)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aloam_tpu.config import PRESETS
from aloam_tpu.frontend.registration import register_scan
from aloam_tpu.frontend.features import extract_features
from aloam_tpu.io import kitti, native_loader, synthetic as syn


CFG = PRESETS["VLP-16"]


@pytest.fixture(scope="module")
def bin_scan(tmp_path_factory):
    """One synthetic VLP-16 scan serialized as a KITTI velodyne .bin."""
    scans, _ = syn.make_sequence(1, scan_lines=16, n_azimuth=512, seed=7)
    scan = scans[0].astype(np.float32)           # (N, 4) x y z intensity
    path = str(tmp_path_factory.mktemp("velo") / "000000.bin")
    scan.tofile(path)
    return path, scan


def _features_of(xyz, mask):
    rc, curv, ovf = jax.jit(register_scan, static_argnums=2)(
        jnp.asarray(xyz), jnp.asarray(mask), CFG)
    feats = jax.jit(extract_features, static_argnums=2)(rc, curv, CFG)
    assert int(ovf) == 0
    return jax.device_get(feats)


def _assert_feats_equal(a, b):
    for name in ("sharp", "less_sharp", "flat", "less_flat"):
        pa, pb = getattr(a, name), getattr(b, name)
        np.testing.assert_array_equal(np.asarray(pa.mask),
                                      np.asarray(pb.mask), err_msg=name)
        m = np.asarray(pa.mask)
        np.testing.assert_array_equal(np.asarray(pa.xyz)[m],
                                      np.asarray(pb.xyz)[m], err_msg=name)


def test_numpy_binpath_features_bitexact(bin_scan):
    path, scan = bin_scan
    back = kitti.read_bin(path)
    np.testing.assert_array_equal(back, scan)

    xyz_mem, mask_mem = syn.pad_scan(scan, CFG.n_raw)
    xyz_bin, mask_bin = syn.pad_scan(back, CFG.n_raw)
    np.testing.assert_array_equal(xyz_bin, xyz_mem)

    _assert_feats_equal(_features_of(xyz_bin, mask_bin),
                        _features_of(xyz_mem, mask_mem))


@pytest.mark.skipif(not native_loader.available(),
                    reason="no C++ toolchain")
def test_native_binpath_features_bitexact(bin_scan):
    path, scan = bin_scan
    xyz_nat, mask_nat, refl = native_loader.read_bin_padded(path, CFG.n_raw)
    xyz_mem, mask_mem = syn.pad_scan(scan, CFG.n_raw)
    np.testing.assert_array_equal(xyz_nat, xyz_mem)
    np.testing.assert_array_equal(mask_nat, mask_mem)
    np.testing.assert_array_equal(refl[mask_nat], scan[:, 3])

    _assert_feats_equal(_features_of(xyz_nat, mask_nat),
                        _features_of(xyz_mem, mask_mem))


def test_iter_sequence_binpath_features_bitexact(bin_scan, tmp_path):
    """The full sequence-layout path (times.txt + velodyne dir) feeds the
    frontend identically to the in-memory scan."""
    path, scan = bin_scan
    seq = "09"
    velo = tmp_path / "velodyne" / "sequences" / seq / "velodyne"
    seqd = tmp_path / "sequences" / seq
    os.makedirs(velo)
    os.makedirs(seqd)
    np.savetxt(seqd / "times.txt", [0.0])
    scan.tofile(str(velo / "000000.bin"))

    (frame,) = list(kitti.iter_sequence(str(tmp_path), seq,
                                        n_pad=CFG.n_raw))
    xyz_mem, mask_mem = syn.pad_scan(scan, CFG.n_raw)
    np.testing.assert_array_equal(frame.xyz, xyz_mem)
    np.testing.assert_array_equal(frame.mask, mask_mem)
    _assert_feats_equal(_features_of(frame.xyz, frame.mask),
                        _features_of(xyz_mem, mask_mem))
