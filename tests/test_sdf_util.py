"""sdf_util parity tests: SDF grid construction + marching-tetrahedra
reconstruction (reference dev_fn/util/sdf_util.py)."""

import numpy as np

from oakink2_tamf_tpu.eval import sdf_util as S


def icosphere(r=0.1, n=2, center=(0.0, 0.0, 0.0)):
    """Subdivided octahedron sphere (verts, faces)."""
    verts = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]], float
    )
    faces = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4], [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]]
    )
    for _ in range(n):
        new_faces = []
        cache = {}
        verts = list(map(np.asarray, verts))

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = verts[i] + verts[j]
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        faces = np.asarray(new_faces)
        verts = np.stack(verts)
    return verts * r + np.asarray(center), faces


def test_process_sdf_sphere_sign_and_magnitude():
    verts, faces = icosphere(r=0.1, center=(0.3, -0.2, 0.5))
    data = S.process_sdf(verts, faces, resolution=20, n_surface_samples=2000)

    assert data.sdf.shape == (20**3,)
    assert data.point.shape == (20**3, 3)
    np.testing.assert_allclose(data.mesh_center, [0.3, -0.2, 0.5], atol=1e-6)

    # sign convention: positive INSIDE
    d_center = np.linalg.norm(data.point - data.mesh_center, axis=1)
    inside = data.sdf > 0
    assert inside[d_center < 0.065].mean() > 0.9
    assert (~inside)[d_center > 0.135].mean() > 0.9
    # magnitude ~= |r - distance to center| for a sphere
    sel = (d_center > 0.025) & (d_center < 0.115)
    np.testing.assert_allclose(
        np.abs(data.sdf[sel]), np.abs(0.1 - d_center[sel]), atol=0.02
    )


def test_reconstruct_sdf_recovers_sphere():
    verts, faces = icosphere(r=0.1, center=(0.3, -0.2, 0.5))
    data = S.process_sdf(verts, faces, resolution=20, n_surface_samples=2000)
    rec = S.reconstruct_sdf(
        data.sdf, data.mesh_center, data.extent_expanded, data.resolution
    )
    assert len(rec.vert) > 100 and len(rec.face) > 100
    # reconstructed verts lie on the r=0.1 sphere around the center
    rad = np.linalg.norm(rec.vert - data.mesh_center, axis=1)
    np.testing.assert_allclose(rad, 0.1, atol=0.03)  # ~half a 12 mm cell
    # faces index valid verts; normals unit and mostly outward
    assert rec.face.min() >= 0 and rec.face.max() < len(rec.vert)
    np.testing.assert_allclose(np.linalg.norm(rec.normal, axis=1), 1.0, atol=1e-6)
    outward = (rec.vert - data.mesh_center) / rad[:, None]
    assert (np.sum(rec.normal * outward, axis=1) > 0).mean() > 0.9


def test_sdf_data_pickle_roundtrip(tmp_path):
    verts, faces = icosphere(r=0.05, n=1)
    data = S.process_sdf(verts, faces, resolution=12, n_surface_samples=500)
    fp = tmp_path / "sdf.pkl"
    S.save_sdf_data(str(fp), data)
    back = S.load_sdf_data(str(fp))
    np.testing.assert_allclose(back.sdf, data.sdf)
    np.testing.assert_allclose(back.point, data.point)
    assert back.resolution == 12
