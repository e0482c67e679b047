"""Data-engine tests: synthetic articulated generator, sample contract,
pose-consistency invariants, loader."""
import numpy as np
import pytest

from equi_articulated_pose_tpu.data import DataLoader, SyntheticDataset, build_sample
from equi_articulated_pose_tpu.data.synthetic import make_shape
from equi_articulated_pose_tpu.data.mesh import sample_points_on_mesh, triangle_areas


@pytest.mark.parametrize("shape_type", ["oven", "laptop", "eyeglasses", "drawer", "safe"])
def test_make_shape(shape_type):
    rng = np.random.RandomState(0)
    v, f, s, joints = make_shape(shape_type, rng)
    assert v.shape[1] == 3 and f.shape[1] == 3
    assert s.shape[0] == f.shape[0]
    assert len(joints) == s.max() + 1
    assert triangle_areas(v, f).min() > 0


def test_sample_contract_and_pose_consistency():
    ds = SyntheticDataset("oven", npoints=128, n_shapes=2, n_samples=4, seed=3)
    item = ds[5]
    N, P = 128, 2
    assert item["pc"].shape == (N, 3)
    assert item["label"].shape == (N,)
    assert item["pose"].shape == (N, 4, 4)
    assert item["pose_segs"].shape == (P, 4, 4)
    assert item["part_axis"].shape[1] == 3
    assert item["oorr_pc"].shape == (4096, 3)
    assert set(np.unique(item["label"])) <= {0, 1}

    # Pose consistency: pc == R_label @ (canonical mesh-frame pts) + T_label.
    # Since build_sample recentres, verify via the per-point pose acting on
    # ori_pc (the canonical-state bbox-normalised points):
    pc, ori, pose = item["pc"], item["ori_pc"], item["pose"]
    recon = np.einsum("nij,nj->ni", pose[:, :3, :3], ori) + pose[:, :3, 3]
    np.testing.assert_allclose(recon, pc, atol=1e-4)

    # axis is unit length
    np.testing.assert_allclose(
        np.linalg.norm(item["part_axis"], axis=-1), 1.0, atol=1e-5
    )


def test_canonical_input_mode():
    ds = SyntheticDataset(
        "oven", split="train", npoints=96, n_shapes=1, n_samples=2,
        canonical_input=True,
    )
    item = ds[0]
    # canonical input: no global rotation; pc should equal the canonical
    # cloud up to the recentring offset
    d = item["pc"] - item["canon_pc"]
    np.testing.assert_allclose(d - d.mean(0), 0.0, atol=1e-4)


def test_multi_sample_determinism():
    ds = SyntheticDataset("laptop", npoints=64, n_shapes=2, n_samples=3)
    a, b = ds[4], ds[4]
    np.testing.assert_allclose(a["pc"], b["pc"])
    # different joint-state samples differ
    c = ds[3]
    assert np.abs(a["part_angles"] - c["part_angles"]).max() > 1e-4


def test_prismatic_drawer():
    ds = SyntheticDataset("drawer", npoints=96, n_shapes=1, n_samples=2)
    item = ds[1]
    assert item["pose_segs"].shape[0] == 4
    # drawers translate, do not rotate
    for p in range(1, 4):
        np.testing.assert_allclose(
            item["pose_segs"][p, :3, :3] @ item["pose_segs"][p, :3, :3].T,
            np.eye(3),
            atol=1e-5,
        )


def test_indep_prismatic_decorrelates_drawer_states():
    """Tied grid: every drawer of a sample opens the same distance (motion
    cannot separate them — RESULTS r5 finding 9); indep_prismatic: per-part
    independent openings, deterministic per index."""
    tied = SyntheticDataset("drawer", npoints=96, n_shapes=1, n_samples=4)
    ang = tied[2]["part_angles"]
    mov = ang[np.abs(ang) > 1e-9]
    assert mov.size >= 2 and np.ptp(mov) < 1e-9  # all equal

    ind = SyntheticDataset(
        "drawer", npoints=96, n_shapes=1, n_samples=4, indep_prismatic=True
    )
    ang_i = ind[2]["part_angles"]
    mov_i = ang_i[np.abs(ang_i) > 1e-9]
    assert np.ptp(mov_i) > 1e-3  # distinct per part
    np.testing.assert_allclose(ind[2]["part_angles"], ang_i)  # deterministic


def test_loader_shapes_and_sharding():
    ds = SyntheticDataset("oven", npoints=64, n_shapes=2, n_samples=8)
    dl = DataLoader(ds, batch_size=4, seed=1, prefetch=0)
    batch = next(iter(dl))
    assert batch["pc"].shape == (4, 64, 3)
    assert batch["pose_segs"].shape == (4, 2, 4, 4)

    # shards partition the index space
    d0 = DataLoader(ds, batch_size=4, seed=1, shard_id=0, num_shards=2, prefetch=0)
    d1 = DataLoader(ds, batch_size=4, seed=1, shard_id=1, num_shards=2, prefetch=0)
    assert len(d0) == len(d1) == 2

    # prefetch thread path yields the same batches
    dl_p = DataLoader(ds, batch_size=4, seed=1, prefetch=2)
    b2 = next(iter(dl_p))
    np.testing.assert_allclose(b2["pc"], batch["pc"])


def test_factory_seed_override_regenerates_test_split():
    """run.py eval --data-seed plumbs a fresh shape seed through the factory
    (repeat-seed evals, VERDICT r4 weak #6): same contract, different shapes."""
    import dataclasses

    from equi_articulated_pose_tpu.config import get_config
    from equi_articulated_pose_tpu.data import build_dataset

    data_cfg = dataclasses.replace(
        get_config("tiny").data, dataset_type="synthetic"
    )
    a = build_dataset(data_cfg, split="test")
    b = build_dataset(data_cfg, split="test", seed=1)
    sa, sb = a[0], b[0]
    assert sa["pc"].shape == sb["pc"].shape
    assert not np.allclose(sa["pc"], sb["pc"])
    # same-seed rebuild is deterministic
    a2 = build_dataset(data_cfg, split="test")
    np.testing.assert_allclose(a2[0]["pc"], sa["pc"])
