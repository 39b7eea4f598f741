"""Asset integrity pins (utils/integrity.py): presence gates became
integrity gates in round 4 — a corrupted pinned asset must FAIL the load,
an unpinned asset warns once, and the fetch-script helper records pins."""

from __future__ import annotations

import logging
import os

import numpy as np
import pytest

from oakink2_tamf_tpu.utils import integrity as I


def _write(path, data: bytes):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


def test_pin_roundtrip_and_mismatch(tmp_path):
    asset = tmp_path / "grabnet" / "weights.npy"
    _write(str(asset), b"hello-weights")
    pin_file = str(tmp_path / I.PIN_BASENAME)
    I.record_pin(str(asset), pin_file)

    assert I.verify_pinned(str(asset)) is True  # pinned + match

    _write(str(asset), b"CORRUPTED!!!")
    with pytest.raises(ValueError, match="integrity pin"):
        I.verify_pinned(str(asset))


def test_unpinned_warns_once(tmp_path, caplog):
    asset = tmp_path / "lonely.bin"
    _write(str(asset), b"data")
    with caplog.at_level(logging.WARNING, logger="oakink2_tamf_tpu.utils.integrity"):
        assert I.verify_pinned(str(asset)) is False
        assert I.verify_pinned(str(asset)) is False  # second call: no new warn
    assert sum("UNPINNED" in r.message for r in caplog.records) == 1


def test_contact_asset_gate_rejects_corruption(tmp_path):
    """The load_contact_assets gate (models/losses.py) must refuse a pinned
    grabnet file whose bytes changed after pinning."""
    from oakink2_tamf_tpu.models.losses import load_contact_assets

    vpe = tmp_path / "verts_per_edge.npy"
    w = tmp_path / "rhand_weight.npy"
    np.save(str(vpe), np.zeros((10, 2), np.int32))
    np.save(str(w), np.ones((778,), np.float32))
    pin_file = str(tmp_path / I.PIN_BASENAME)
    I.record_pin(str(vpe), pin_file)
    I.record_pin(str(w), pin_file)
    # sanity: intact files load
    assets = load_contact_assets(str(vpe), str(w))
    assert assets.v_weights.shape == (778,)

    np.save(str(w), np.full((778,), 7.0, np.float32))  # corrupt after pinning
    with pytest.raises(ValueError, match="integrity pin"):
        load_contact_assets(str(vpe), str(w))
