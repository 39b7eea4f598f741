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


def test_committed_pins_present_and_wellformed():
    """asset/SHA256SUMS ships IN the repo with the published CLIP pins
    (round-4 verdict #4: first fetch must verify, not record)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pins = I.load_pins(os.path.join(here, "asset", I.PIN_BASENAME))
    assert pins["clip/bpe_simple_vocab_16e6.txt.gz"] == (
        "924691ac288e54409236115652ad4aa250f48203de50a9e4722a6ecd48d6804a"
    )
    assert pins["clip/ViT-B-32.pt"] == (
        "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af"
    )


def test_record_pin_refuses_overwrite_and_keeps_comments(tmp_path):
    """A TOFU re-pin must never silently replace a committed pin, and the
    pin file's documentation header survives appends."""
    a = tmp_path / "a.bin"
    _write(str(a), b"v1")
    pin_file = str(tmp_path / I.PIN_BASENAME)
    with open(pin_file, "w") as f:
        f.write("# header line one\n# header line two\n")
    I.record_pin(str(a), pin_file)
    with open(pin_file) as f:
        content = f.read()
    assert content.startswith("# header line one\n# header line two\n")

    _write(str(a), b"v2-different-bytes")
    with pytest.raises(ValueError, match="refusing to overwrite"):
        I.record_pin(str(a), pin_file)
    # same-digest re-pin is a no-op, not an error
    _write(str(a), b"v1")
    I.record_pin(str(a), pin_file)
