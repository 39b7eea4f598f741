"""Viz module: headless renders + the interactive HTML viewer export."""

import base64
import json
import re

import numpy as np
import pytest

from oakink2_tamf_tpu.viz.html_viewer import export_html_viewer, _quantize
from oakink2_tamf_tpu.viz.render import render_sequence_grid, save_sequence_gif


def _synthetic_joints(L=6):
    rng = np.random.default_rng(0)
    base = rng.normal(size=(21, 3)).astype(np.float32) * 0.05
    drift = np.linspace(0, 0.2, L, dtype=np.float32)[:, None, None]
    return base[None] + drift * np.array([1.0, 0.0, 0.0], np.float32)


def test_render_sequence_grid(tmp_path):
    joints = _synthetic_joints()
    obj = np.random.default_rng(1).normal(size=(6, 64, 3)).astype(np.float32)
    out = tmp_path / "strip.png"
    render_sequence_grid(joints, obj_points_seq=obj, joints_ref_seq=joints + 0.01,
                         n_frames=4, out_path=str(out))
    assert out.stat().st_size > 1000


def test_save_sequence_gif(tmp_path):
    out = tmp_path / "seq.gif"
    save_sequence_gif(_synthetic_joints(4), str(out), fps=5)
    assert out.read_bytes()[:6] in (b"GIF87a", b"GIF89a")


def test_quantize_roundtrip():
    rng = np.random.default_rng(2)
    pos = rng.normal(size=(5, 30, 3)).astype(np.float32) * 0.3 + 1.0
    enc = _quantize(pos)
    q = np.frombuffer(base64.b64decode(enc["b64"]), dtype="<i2").astype(np.float32)
    dec = (q.reshape(-1, 3) * np.array(enc["scale"]) + np.array(enc["offset"])).reshape(pos.shape)
    # ~1.8 m spread / 65000 levels => worst-case half-step ~1.4e-5 per axis
    np.testing.assert_allclose(dec, pos, atol=5e-5)


def test_export_html_viewer(tmp_path):
    joints = _synthetic_joints(8)
    cloud = np.random.default_rng(3).normal(size=(8, 5000, 3)).astype(np.float32)
    out = tmp_path / "seg.html"
    export_html_viewer(
        str(out),
        [
            {"name": "GT", "pos": joints, "kind": "skeleton", "color": "#2ca02c"},
            {"name": "obj", "pos": cloud, "kind": "cloud", "alpha": 0.5},
        ],
        title="test seg", max_points=512,
    )
    html = out.read_text()
    assert html.startswith("<!DOCTYPE html>") and html.rstrip().endswith("</html>")
    # the embedded payload parses as JSON with both tracks; the cloud was
    # subsampled to <= max_points
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    data = json.loads(m.group(1))
    assert data["n_frames"] == 8
    names = [t["name"] for t in data["tracks"]]
    assert names == ["GT", "obj"]
    assert data["tracks"][1]["n_points"] <= 512
    assert data["tracks"][0]["n_points"] == 21
    assert len(data["hand_links"]) == 20
    # payload decodes to the right element count
    raw = base64.b64decode(data["tracks"][0]["b64"])
    assert len(raw) == 8 * 21 * 3 * 2


def test_export_html_viewer_validates(tmp_path):
    with pytest.raises(ValueError):
        export_html_viewer(str(tmp_path / "x.html"), [])
    with pytest.raises(ValueError):
        export_html_viewer(
            str(tmp_path / "x.html"),
            [{"name": "bad", "pos": np.zeros((4, 3)), "kind": "points"}],
        )
    with pytest.raises(ValueError):
        export_html_viewer(
            str(tmp_path / "x.html"),
            [
                {"name": "a", "pos": np.zeros((4, 2, 3))},
                {"name": "b", "pos": np.zeros((5, 2, 3))},
            ],
        )
