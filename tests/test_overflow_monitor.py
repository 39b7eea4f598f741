"""The live cluster-exactness certificate wired into train_r's val pass
(round-3 verdict #2): a scene outside the cluster kernel's tuned candidate
budget must trip the WARNING; a benign grasp-like scene must certify clean.

Runs the stage-1 selection forced onto the cluster route (backend="cluster")
so the certificate is exercised on CPU.
"""

from __future__ import annotations

import logging

import numpy as np
import jax.numpy as jnp
import pytest

from oakink2_tamf_tpu.core import mano as M
from oakink2_tamf_tpu.launch.train_r import make_overflow_probe, report_cluster_overflow
from oakink2_tamf_tpu.models.refine_r import stack_mano_models


@pytest.fixture(scope="module")
def mano_stack():
    return stack_mano_models(
        M.synthetic_mano_model("right"), M.synthetic_mano_model("left")
    )


def _batch(obj_points: np.ndarray) -> dict:
    """One-sample batch around a near-rest hand; obj_points [1, nobj, P, 3]."""
    rng = np.random.default_rng(0)
    L = 2
    pose = np.zeros((1, L, 99), np.float32)
    pose[..., 3:] = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), 16)
    pose += rng.normal(size=pose.shape).astype(np.float32) * 0.01
    traj = np.zeros((1, 1, L, 9), np.float32)
    traj[..., 3:] = np.array([1, 0, 0, 0, 1, 0], np.float32)  # identity rot
    return {
        "sample_pose_repr": jnp.asarray(pose),
        "shape": jnp.zeros((1, L, 10), jnp.float32),
        "hand_side": jnp.zeros((1,), jnp.int32),
        "obj_traj": jnp.asarray(traj),
        "obj_points": jnp.asarray(obj_points, jnp.float32),
        "obj_mask": jnp.ones((1, 1), bool),
    }


def test_overflowing_scene_trips_warning(mano_stack, caplog):
    """A spherical-shell cloud centered on the hand makes every spatial cell
    equidistant — far more cells qualify than the tuned budget (k_cells=24 at
    P=4096 -> 32 cells), so the certificate must count overflow and WARN."""
    rng = np.random.default_rng(1)
    P = 4096
    d = rng.normal(size=(P, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    shell = (d * 2.0).astype(np.float32)[None, None]  # radius 2 m around hand
    probe = make_overflow_probe(mano_stack, chunk=2048, backend="cluster")
    with caplog.at_level(logging.INFO, logger="oakink2_tamf_tpu.launch.train_r"):
        count = report_cluster_overflow(probe, _batch(shell), "val", 0, None, 0)
    assert count > 0
    assert any(
        r.levelno == logging.WARNING and "overflow" in r.message
        for r in caplog.records
    )


def test_small_cloud_scene_certifies_clean(mano_stack, caplog):
    """At the repo-default cloud size (n_obj_points=2048 -> 16 cells <=
    k_cells=24) the candidate budget covers every cell, so ANY geometry —
    full MANO hand included — certifies exact: zero overflow, INFO only.
    (Round-4 measurement: with a real full-size hand, larger clouds need
    k_cells ~= C — the pruned kernel certifies only in this regime; see
    tests/test_chamfer_cluster.py adversarial suite.)"""
    rng = np.random.default_rng(2)
    P = 2048
    ball = (rng.normal(size=(P, 3)) * 0.03 + np.array([0.0, 0.0, 0.05])).astype(
        np.float32
    )[None, None]
    probe = make_overflow_probe(mano_stack, chunk=2048, backend="cluster")
    with caplog.at_level(logging.INFO, logger="oakink2_tamf_tpu.launch.train_r"):
        count = report_cluster_overflow(probe, _batch(ball), "val", 0, None, 0)
    assert count == 0
    assert not any(r.levelno >= logging.WARNING for r in caplog.records)
    assert any("certificate ok" in r.message for r in caplog.records)
