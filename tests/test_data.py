"""Data-pipeline tests: slicing edge cases, cache_dict round-trip, collate
static shapes, adaptors, sharded loader."""

import numpy as np
import pytest

from oakink2_tamf_tpu.data.adaptors import (
    ACTION_LIST,
    ActionRecognitionAdapter,
    ConcatDataset,
    GaussianPerturbSampleAdaptor,
    IdentitySampleAdaptor,
)
from oakink2_tamf_tpu.data.collate import SegmentCollate
from oakink2_tamf_tpu.data.loader import DataLoader
from oakink2_tamf_tpu.data.segment import InteractionSegmentData
from oakink2_tamf_tpu.data.slice import segment_slice_from_gap


# ---------------------------------------------------------------------------
# slicing
# ---------------------------------------------------------------------------


def test_slice_normal_case():
    traj = np.arange(320 * 2).reshape(320, 2).astype(np.float32)
    res, lens = segment_slice_from_gap(traj, gap=12, max_len=160, min_len=16)
    # 320 frames / gap 12 -> traj_len < min_len*gap (192)? 320 >= 192, 320 <= 1920 -> keep 12
    assert len(res) == 12
    assert all(r.shape == (160, 2) for r in res)
    np.testing.assert_array_equal(res[0][: lens[0]], traj[0::12])


def test_slice_short_segment_shrinks_gap():
    traj = np.arange(40).reshape(40, 1).astype(np.float32)
    res, lens = segment_slice_from_gap(traj, gap=12, max_len=160, min_len=16)
    # 40 < 16*12 -> gap = 40//16 = 2
    assert len(res) == 2
    assert lens == [20, 20]


def test_slice_long_segment_grows_gap():
    traj = np.zeros((4000, 1), np.float32)
    res, lens = segment_slice_from_gap(traj, gap=12, max_len=160, min_len=16)
    # 4000 > 160*12 -> gap = ceil(4000/160) = 25
    assert len(res) == 25
    assert all(16 <= n <= 160 for n in lens)


def test_slice_exact_fit_no_pad():
    traj = np.zeros((160, 3), np.float32)
    res, lens = segment_slice_from_gap(traj, gap=1, max_len=160, min_len=16)
    assert len(res) == 1 and lens == [160]


# ---------------------------------------------------------------------------
# synthetic cache_dict in the reference format
# ---------------------------------------------------------------------------


def make_cache_dict(n_seg=6, L=20, seed=0):
    rng = np.random.default_rng(seed)
    info, lens, poses, tsls, shapes, hss, texts, otrajs, fids = (
        [], [], [], [], [], [], [], [], [],
    )
    for i in range(n_seg):
        n = int(rng.integers(8, L + 1))
        # rotmats: identity + noise orthonormalized is overkill; use identity
        pose = np.tile(np.eye(3, dtype=np.float32), (L, 16, 1, 1))
        info.append((f"scene_x/seq_{i}", f"{ACTION_LIST[i % len(ACTION_LIST)]}:0042", "rh" if i % 2 == 0 else "lh"))
        lens.append(n)
        poses.append(pose)
        tsls.append(rng.normal(size=(L, 3)).astype(np.float32))
        shapes.append(rng.normal(size=(L, 10)).astype(np.float32))
        hss.append("rh" if i % 2 == 0 else "lh")
        texts.append(f"do the thing {i}")
        n_obj = 1 + i % 2
        otrajs.append(
            {
                f"obj_{j:02d}": np.tile(np.eye(4, dtype=np.float32), (L, 1, 1))
                for j in range(n_obj)
            }
        )
        fids.append(list(range(n)))
    return {
        "interaction_segment_info_list": info,
        "interaction_segment_len_list": lens,
        "interaction_segment_pose_list": poses,
        "interaction_segment_tsl_list": tsls,
        "interaction_segment_shape_list": shapes,
        "interaction_segment_hand_side_list": hss,
        "interaction_segment_text_list": texts,
        "interaction_segment_obj_traj_list": otrajs,
        "interaction_segment_frame_id_list": fids,
        "interaction_object_list": ["obj_00", "obj_01"],
    }


@pytest.fixture()
def dataset(tmp_path):
    cache = make_cache_dict()
    # embeddings + pointclouds on disk
    emb_dir = tmp_path / "emb"
    pc_dir = tmp_path / "pc"
    emb_dir.mkdir()
    pc_dir.mkdir()
    rng = np.random.default_rng(1)
    for oid in cache["interaction_object_list"]:
        np.save(emb_dir / f"{oid}.npy", rng.normal(size=(768,)).astype(np.float32))
        np.savez(pc_dir / f"{oid}.npz", point=rng.normal(size=(300, 3)).astype(np.float32))
    return InteractionSegmentData(
        cache_dict=cache,
        slice_max_len=20,
        obj_embedding_prefix=str(emb_dir),
        obj_pointcloud_prefix=str(pc_dir),
    )


def test_dataset_getitem(dataset):
    s = dataset[0]
    assert s["pose_repr"].shape == (20, 99)
    assert s["mask"].shape == (20,) and s["mask"][: s["len"]].all()
    assert s["obj_traj"].shape[1:] == (20, 9)
    assert s["obj_embedding"].shape[1:] == (768,)
    assert s["obj_pointcloud"].shape[1:] == (300, 3)
    # identity rotmat -> rot6d = [1,0,0, 0,1,0]
    np.testing.assert_allclose(s["pose_repr"][0, 3:9], [1, 0, 0, 0, 1, 0], atol=1e-6)


def test_dataset_reverse_augmentation():
    cache = make_cache_dict()
    base = InteractionSegmentData(cache_dict=cache, slice_max_len=20)
    aug = InteractionSegmentData(cache_dict=cache, slice_max_len=20, append_reverse_segment=True)
    assert len(aug) == 2 * len(base)
    s0 = base[0]
    sr = aug[len(base)]
    n = s0["len"]
    np.testing.assert_allclose(
        sr["pose_repr"][:n, 0:3], s0["pose_repr"][:n, 0:3][::-1], atol=1e-6
    )
    # padded tail untouched
    np.testing.assert_allclose(sr["pose_repr"][n:], s0["pose_repr"][n:], atol=1e-6)


def test_cache_roundtrip(dataset, tmp_path):
    fp = tmp_path / "cache.pkl"
    dataset.save_cache(str(fp))
    ds2 = InteractionSegmentData(cache_dict_filepath=str(fp), slice_max_len=20)
    assert len(ds2) == len(dataset)
    np.testing.assert_allclose(ds2[1]["pose_repr"], dataset[1]["pose_repr"])


def test_collate_static_shapes(dataset):
    collate = SegmentCollate(max_nobj=3, n_obj_points=128)
    batch = collate([dataset[i] for i in range(4)])
    assert batch["pose_repr"].shape == (4, 20, 99)
    assert batch["obj_traj"].shape == (4, 3, 20, 9)
    assert batch["obj_embedding"].shape == (4, 3, 768)
    assert batch["obj_points"].shape == (4, 3, 128, 3)
    assert batch["obj_mask"].shape == (4, 3)
    assert batch["obj_mask"].sum(axis=1).tolist() == [b["obj_num"] for b in (dataset[i] for i in range(4))]
    assert batch["hand_side"].dtype == np.int32
    assert isinstance(batch["text"], list) and len(batch["text"]) == 4


def test_adaptors(dataset):
    ident = IdentitySampleAdaptor(dataset)
    s = ident[0]
    np.testing.assert_array_equal(s["sample_pose_repr"], s["pose_repr"])

    perturb = GaussianPerturbSampleAdaptor(dataset, (0.02, 0.1), seed=0)
    sp = perturb[0]
    n = sp["len"]
    assert not np.allclose(sp["sample_pose_repr"][:n], sp["pose_repr"][:n])
    np.testing.assert_allclose(sp["sample_pose_repr"][n:], sp["pose_repr"][n:])
    # rot6d re-normalized
    d6 = sp["sample_pose_repr"][:n, 3:].reshape(n, 16, 6)
    np.testing.assert_allclose(np.linalg.norm(d6[..., :3], axis=-1), 1.0, atol=1e-5)

    act = ActionRecognitionAdapter(ident)
    sa = act[0]
    assert 0 <= sa["action_label_id"] < 70
    assert sa["action_onehot"].sum() == 1

    cc = ConcatDataset([ident, perturb])
    assert len(cc) == 2 * len(dataset)
    _ = cc[len(dataset) + 1]


class _Prim:
    """Primitive-task record with the oakink2_toolkit access pattern
    (attribute AND item access; reference interaction_segment.py:32-54)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __getitem__(self, k):
        return self.__dict__[k]


class _Complex:
    def __init__(self, exec_path):
        self.exec_path = exec_path


class _Affordance:
    def __init__(self, mesh):
        self.obj_mesh = mesh


class _BoxMesh:
    def __init__(self):
        self.vertices = np.zeros((8, 3), np.float32)
        self.faces = np.zeros((12, 3), np.int32)


class FakeToolkit:
    """Minimal oakink2_toolkit stand-in: one complex task with three
    primitives — rh-only, bimanual, and an lh primitive with no objects
    (must be skipped)."""

    RAW = 12  # raw frames per primitive

    def _prim(self, pid, hand_involved, obj_ids, beg):
        n = self.RAW
        rng = np.random.default_rng(beg)  # deterministic per primitive
        eye = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        quat = np.zeros((n, 16, 4), np.float32)
        quat[..., 0] = 1.0  # identity (w,x,y,z)
        kw = dict(
            frame_range=(beg, beg + n),
            hand_involved=hand_involved,
            task_desc=f"task {pid}",
            obj_transf={oid: eye + 0 for oid in obj_ids},
        )
        for hs in ("lh", "rh"):
            kw[f"frame_range_{hs}"] = (beg, beg + n)
            kw[f"{hs}_obj_list"] = list(obj_ids) if hand_involved in ("bh", hs) else []
            # in_range_mask longer than the window: mask selects the segment
            kw[f"{hs}_in_range_mask"] = np.concatenate(
                [np.ones(n, bool), np.zeros(3, bool)]
            )
            kw[f"{hs}_param"] = {
                "pose_coeffs": np.concatenate([quat, np.zeros((3, 16, 4), np.float32)]),
                "tsl": rng.normal(size=(n + 3, 3)).astype(np.float32),
                "betas": rng.normal(size=(n + 3, 10)).astype(np.float32),
            }
        return _Prim(**kw)

    def load_complex_task(self, seq_key):
        assert seq_key == "scene/seq_a"
        return _Complex(["grip:0001", "place_onto:0002", "hold:0003"])

    def load_primitive_task(self, complex_task_data):
        return [
            self._prim("grip:0001", "rh", ["obj_A"], beg=100),
            self._prim("place_onto:0002", "bh", ["obj_A", "obj_B"], beg=200),
            self._prim("hold:0003", "lh", [], beg=300),  # no objects -> skipped
        ]

    def load_affordance(self, obj_id):
        return _Affordance(_BoxMesh())


def test_raw_toolkit_extraction():
    """The complex->primitive walk (segment.py:145-201 / ref :56-158) on a
    fake toolkit: hand gating, in_range_mask, gap slicing, frame ids."""
    tk = FakeToolkit()
    ds = InteractionSegmentData(
        process_range_list=["scene/seq_a"],
        toolkit=tk,
        target_fps=60.0,  # gap = 120/60 = 2
        slice_min_len=4,
        slice_max_len=8,
        enable_obj_model=True,
    )
    # rh-only prim -> 1 hand, bh prim -> 2 hands, empty-obj prim skipped;
    # each (prim, hand) emits gap=2 phase-shifted slices
    assert len(ds) == (1 + 2) * 2
    infos = {tuple(i) for i in ds.info_list}
    assert infos == {
        ("scene/seq_a", "grip:0001", "rh"),
        ("scene/seq_a", "place_onto:0002", "rh"),
        ("scene/seq_a", "place_onto:0002", "lh"),
    }
    assert ds.object_list == ["obj_A", "obj_B"]

    s = ds[0]  # grip, rh, phase 0
    assert s["len"] == 6  # 12 raw frames / gap 2
    assert s["pose_repr"].shape == (8, 99)
    # identity quats -> identity rot6d
    np.testing.assert_allclose(s["pose_repr"][0, 3:9], [1, 0, 0, 0, 1, 0], atol=1e-6)
    # frame ids: raw window [100, 112) downsampled by gap 2, phase 0
    assert s["frame_id"] == [100, 102, 104, 106, 108, 110]
    # tsl matches the masked raw stream at those offsets
    prim = tk.load_primitive_task(None)[0]
    raw_tsl = prim["rh_param"]["tsl"][prim["rh_in_range_mask"]]
    np.testing.assert_allclose(s["pose_repr"][:6, :3], raw_tsl[0::2], atol=1e-6)
    # phase-1 slice starts one raw frame later
    s1 = ds[1]
    assert s1["frame_id"][0] == 101

    # obj stores: bimanual prim has both objects, identity transf -> tslrot6d
    sb = next(ds[i] for i in range(len(ds)) if ds.info_list[i][1] == "place_onto:0002")
    assert sb["obj_num"] == 2 and sb["obj_list"] == ["obj_A", "obj_B"]
    np.testing.assert_allclose(sb["obj_traj"][0, 0], [0, 0, 0, 1, 0, 0, 0, 1, 0], atol=1e-6)
    # affordance meshes loaded through enable_obj_model
    assert len(sb["obj_verts"]) == 2 and sb["obj_verts"][0].shape == (8, 3)

    # cache round-trip preserves the toolkit-extracted store
    cache = ds.get_cache()
    ds2 = InteractionSegmentData(cache_dict=cache, slice_max_len=8)
    assert len(ds2) == len(ds)
    np.testing.assert_allclose(ds2[3]["pose_repr"], ds[3]["pose_repr"])


def test_reverse_augmentation_equivalence_toolkit():
    """Reverse augmentation on the toolkit-built store matches a hand-computed
    reversal of every field (ref load_reverse_segment :160-265 reverses the
    SLICED arrays in place, exactly like _append_reverse)."""
    ds = InteractionSegmentData(
        process_range_list=["scene/seq_a"], toolkit=FakeToolkit(),
        target_fps=60.0, slice_min_len=4, slice_max_len=8,
        append_reverse_segment=True,
    )
    n0 = len(ds) // 2
    for i in range(n0):
        fwd, rev = ds[i], ds[n0 + i]
        n = fwd["len"]
        assert rev["len"] == n and rev["info"] == fwd["info"]
        np.testing.assert_allclose(rev["pose_repr"][:n], fwd["pose_repr"][:n][::-1], atol=1e-6)
        np.testing.assert_allclose(rev["pose_repr"][n:], fwd["pose_repr"][n:], atol=1e-6)
        np.testing.assert_allclose(rev["obj_traj"][:, :n], fwd["obj_traj"][:, :n][:, ::-1], atol=1e-6)
        assert rev["frame_id"] == fwd["frame_id"][::-1]
        np.testing.assert_allclose(rev["shape"][:n], fwd["shape"][:n][::-1], atol=1e-6)


def test_perturb_adaptor_threaded_determinism(dataset):
    """The perturb noise must be reproducible under the threaded DataLoader
    (per-index derived Generators; a shared stream raced across workers)."""
    collate = SegmentCollate(max_nobj=3, n_obj_points=64)

    def run_epoch(epoch):
        perturb = GaussianPerturbSampleAdaptor(dataset, (0.02, 0.1), seed=7)
        loader = DataLoader(
            perturb, batch_size=2, collate_fn=collate, shuffle=True, seed=3,
            num_shards=1, shard_index=0, num_workers=4,
        )
        loader.set_epoch(epoch)
        return [np.asarray(b["sample_pose_repr"]) for b in loader]

    a, b = run_epoch(0), run_epoch(0)
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    # set_epoch refreshes the noise
    c = run_epoch(1)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))

    # epoch-0 draws differ across indices (not one repeated stream)
    perturb = GaussianPerturbSampleAdaptor(dataset, (0.02, 0.1), seed=7)
    s0, s1 = perturb[0], perturb[1]
    assert not np.array_equal(
        s0["sample_pose_repr"] - s0["pose_repr"], s1["sample_pose_repr"] - s1["pose_repr"]
    )


def test_generated_sample_adaptor(dataset, tmp_path):
    from oakink2_tamf_tpu.data.adaptors import GeneratedPoseReprSampleAdaptor

    d = tmp_path / "samples" / "run_a"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(len(dataset)):
        np.save(d / f"{i:06d}.npy", rng.normal(size=(20, 99)).astype(np.float32))
    gen = GeneratedPoseReprSampleAdaptor(dataset, [str(d)])
    s = gen[2]
    assert s["sample_pose_repr"].shape == (20, 99)
    assert s["sample_info"] == ("run_a", 2)


def test_loader_shards_and_epochs(dataset):
    collate = SegmentCollate(max_nobj=2, n_obj_points=64)
    dl0 = DataLoader(dataset, 2, collate, seed=5, num_shards=2, shard_index=0)
    dl1 = DataLoader(dataset, 2, collate, seed=5, num_shards=2, shard_index=1)
    b0 = list(dl0)
    b1 = list(dl1)
    assert len(b0) == len(dl0) and len(b0) > 0
    # shards are disjoint: compare infos
    i0 = {tuple(i) for b in b0 for i in b["info"]}
    i1 = {tuple(i) for b in b1 for i in b["info"]}
    # (wrap-padding can duplicate at most num_shards-1 samples)
    assert len(i0 & i1) <= 1

    # reshuffle changes order
    dl0.set_epoch(1)
    b0e1 = list(dl0)
    order0 = [tuple(i) for b in b0 for i in b["info"]]
    order1 = [tuple(i) for b in b0e1 for i in b["info"]]
    assert order0 != order1


def test_loader_shard_lengths_equal_when_shards_exceed_dataset():
    """num_shards > 2n: a single wrap-pad slice runs dry — the tiling pad
    must still hand every shard the SAME number of indices, else some
    processes skip the global-mesh collectives and the run hangs."""
    ds = [{"i": i} for i in range(3)]
    lens = set()
    for w in range(8):
        dl = DataLoader(ds, 1, lambda l: np.array([d["i"] for d in l]),
                        shuffle=False, drop_last=False, seed=0,
                        num_shards=8, shard_index=w, num_workers=0)
        batches = list(dl)
        lens.add(len(batches))
        # every served index is a real dataset index
        assert all(0 <= int(b[0]) < 3 for b in batches)
    assert lens == {1}, lens
