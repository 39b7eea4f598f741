"""Eval-metric tests: inside-mesh vs brute force, SIV on known geometry,
PSKL-J properties, FID sanity, CR pipeline."""

import numpy as np
import pytest

from oakink2_tamf_tpu.eval import metrics as ME
from oakink2_tamf_tpu.eval.inside_mesh import check_mesh_contains, _inside_mesh_numpy


def make_box(center=(0, 0, 0), half=0.5):
    c = np.asarray(center, float)
    h = half
    verts = np.array(
        [
            [-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
            [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h],
        ]
    ) + c
    faces = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # bottom
            [4, 5, 6], [4, 6, 7],  # top
            [0, 1, 5], [0, 5, 4],
            [1, 2, 6], [1, 6, 5],
            [2, 3, 7], [2, 7, 6],
            [3, 0, 4], [3, 4, 7],
        ],
        np.int32,
    )
    return verts, faces


def test_inside_mesh_box():
    verts, faces = make_box()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(500, 3))
    inside = check_mesh_contains(verts, faces, pts)
    expect = np.all(np.abs(pts) < 0.5, axis=1)
    # boundary-adjacent points can differ; interior/exterior clear points match
    clear = np.all((np.abs(pts) < 0.45) | (np.abs(pts) > 0.55), axis=1)
    np.testing.assert_array_equal(inside[clear], expect[clear])


def test_inside_mesh_native_matches_numpy():
    verts, faces = make_box(center=(0.2, -0.1, 0.3), half=0.3)
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, size=(300, 3))
    a = check_mesh_contains(verts, faces, pts, hash_resolution=128)
    b = _inside_mesh_numpy(verts, faces, pts, resolution=128)
    assert (a == b).mean() > 0.99  # identical algorithm; allow fp-order jitter


def test_object_interior_grid_volume():
    verts, faces = make_box(half=0.5)  # unit cube, volume 1
    pts, tick = ME.object_interior_grid(verts, faces, bbox_expand_ratio=1.2, resolution=40)
    vol = len(pts) * float(np.prod(tick))
    # strict containment drops the boundary cell layer (same bias as the
    # reference's sdf>0 mask): expect a mild undercount
    assert 0.75 < vol <= 1.02


def test_siv_full_overlap():
    """Object box fully inside a big hand box -> SIV ~ object volume in cm^3."""
    overts, ofaces = make_box(half=0.1)  # vol 8e-3 m^3 = 8000 cm^3
    hverts, hfaces = make_box(half=0.5)
    pts, tick = ME.object_interior_grid(overts, ofaces, resolution=30)
    X = np.eye(4)
    siv = ME.solid_intersection_volume(hverts, hfaces, [pts], [tick], [X])
    assert 0.6 * 8e-3 * 1e6 < siv <= 1.05 * 8e-3 * 1e6

    # moved far away -> zero
    X2 = np.eye(4)
    X2[:3, 3] = [10, 0, 0]
    siv2 = ME.solid_intersection_volume(hverts, hfaces, [pts], [tick], [X2])
    assert siv2 == 0.0


def test_contact_ratio_pipeline():
    rng = np.random.default_rng(2)
    hv = rng.normal(size=(6, 50, 3)).astype(np.float32)
    pc = rng.normal(size=(2, 100, 3)).astype(np.float32)
    traj = np.zeros((2, 6, 9), np.float32)
    traj[..., 3] = 1.0  # identity rot6d
    traj[..., 7] = 1.0
    merged = ME.transf_merge_obj_pointcloud(pc, traj)
    assert merged.shape == (6, 200, 3)
    d = ME.contact_min_dists(hv, merged)
    assert d.shape == (6,)
    cr = ME.contact_ratio(np.array([0.001, 0.01, 0.004]))
    assert cr == pytest.approx(2 / 3)


def test_psklj_identical_is_zero():
    rng = np.random.default_rng(3)
    seqs = [rng.normal(size=(30, 21, 3)) for _ in range(4)]
    a, b = ME.psklj(seqs, seqs)
    assert abs(a) < 1e-9 and abs(b) < 1e-9
    # different distributions -> positive
    seqs2 = [s * 3.0 + rng.normal(size=s.shape) for s in seqs]
    a2, b2 = ME.psklj(seqs, seqs2)
    assert a2 > 0 and b2 > 0


def test_pad_tail():
    j = np.arange(5 * 2 * 3, dtype=float).reshape(5, 2, 3)
    out = ME.pad_tail_with_last(j, 3)
    np.testing.assert_array_equal(out[3], j[2])
    np.testing.assert_array_equal(out[4], j[2])


def test_fid_properties():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(200, 16))
    b = rng.normal(size=(200, 16))
    same = ME.calculate_fid(a, a)
    diff = ME.calculate_fid(a, b + 3.0)
    assert abs(same) < 1e-6
    assert diff > 100
