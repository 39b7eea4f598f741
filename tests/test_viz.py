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


def test_camera_overlay_projection_and_drawing():
    """RGB camera-frame skeleton overlay (viz/overlay.py — the
    vis_cv2_util.py capability): projection math is exact, drawing touches
    the projected pixels, behind-camera points are dropped."""
    import numpy as np
    from oakink2_tamf_tpu.viz.overlay import (
        draw_skeleton_overlay, draw_verts_overlay, project_points,
    )

    cam_intr = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    # a known point: (0.1, -0.05, 0.5) -> u = 100*0.2+64 = 84, v = 100*-0.1+48 = 38
    uv, z = project_points(np.array([[0.1, -0.05, 0.5], [0.0, 0.0, -1.0]]), cam_intr)
    np.testing.assert_allclose(uv[0], [84.0, 38.0], atol=1e-9)
    assert np.all(np.isnan(uv[1]))  # behind the camera

    # world->camera extrinsics: camera at z=-1 looking +z == points shift +1 z
    extr = np.eye(4)
    extr[2, 3] = 1.0
    uv2, _ = project_points(np.array([[0.0, 0.0, 0.0]]), cam_intr, extr)
    np.testing.assert_allclose(uv2[0], [64.0, 48.0], atol=1e-9)

    rng = np.random.default_rng(0)
    joints = rng.normal(size=(21, 3)) * 0.05 + [0.0, 0.0, 0.5]
    img = np.zeros((96, 128, 3), np.uint8)
    out = draw_skeleton_overlay(img, joints, cam_intr)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.all(img == 0)  # input untouched (copy semantics)
    assert (out != 0).any(axis=2).sum() > 50  # skeleton actually drawn
    # wrist joint pixel is painted (white dot)
    uvj, _ = project_points(joints, cam_intr)
    u0, v0 = int(round(uvj[0, 0])), int(round(uvj[0, 1]))
    assert np.all(out[v0, u0] == 255)

    verts = rng.normal(size=(50, 3)) * 0.05 + [0.0, 0.0, 0.5]
    out2 = draw_verts_overlay(img, verts, cam_intr)
    assert (out2 != 0).any(axis=2).sum() >= 30  # most verts inside the frame
