"""Giant-cloud (CP) model path on the 8-virtual-device mesh (VERDICT r1
#7): the N-touching half of an SA layer routed through the sharded ops
must match the unsharded single-device program BITWISE, end to end —
FPS picks, grouping indices, grouped features, and the pooled SA output.
"""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from tpu3dsad import ops
from tpu3dsad.parallel import make_mesh
from tpu3dsad.parallel.point_sharded import (
    sharded_group,
    sharded_query_and_group,
    sharded_sa_stage,
)


def _mesh():
    return make_mesh((-1,), ("points",))


def test_sharded_group_matches_gather(rng):
    B, N, M, K, C = 2, 512, 32, 8, 6
    pts = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (B, M, K)).astype(np.int32))
    got = sharded_group(pts, idx, _mesh())
    want = ops.group(pts, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_query_and_group_bitwise(rng):
    B, N, M, K = 2, 512, 32, 16
    xyz = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, N, 4)).astype(np.float32))
    centers = xyz[:, :M]
    mask = np.ones((B, N), bool)
    mask[:, 480:] = False
    m = jnp.asarray(mask)

    gs, is_, ms = sharded_query_and_group(
        xyz, centers, 0.5, K, _mesh(), features=feats, mask=m,
        normalize_xyz=True,
    )
    gw, iw, mw = ops.query_and_group(
        xyz, centers, 0.5, K, features=feats, mask=m, normalize_xyz=True,
        exact=True,
    )
    np.testing.assert_array_equal(np.asarray(is_), np.asarray(iw))
    np.testing.assert_array_equal(np.asarray(ms), np.asarray(mw))
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(gw))


def test_sharded_sa_stage_end_to_end_bitwise(rng):
    """Full giant-cloud SA stage (sharded FPS -> grouping -> replicated
    masked-max pool) == the unsharded composition, bitwise."""
    B, N, M, K = 1, 1024, 64, 16
    xyz = jnp.asarray(rng.uniform(-4, 4, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, N, 4)).astype(np.float32))
    mask = np.ones((B, N), bool)
    mask[:, 1000:] = False
    m = jnp.asarray(mask)

    new_xyz, grouped, inds, gmask, new_mask = sharded_sa_stage(
        xyz, feats, M, 0.4, K, _mesh(), mask=m
    )

    inds_w = ops.furthest_point_sample(xyz, M, mask=m)
    new_xyz_w = ops.gather(xyz, inds_w)
    grouped_w, _, gmask_w = ops.query_and_group(
        xyz, new_xyz_w, 0.4, K, features=feats, mask=m, normalize_xyz=True,
        exact=True,
    )
    new_mask_w = jnp.take_along_axis(m, inds_w, axis=1)
    gmask_w = gmask_w & new_mask_w[:, :, None]

    np.testing.assert_array_equal(np.asarray(inds), np.asarray(inds_w))
    np.testing.assert_array_equal(np.asarray(new_xyz), np.asarray(new_xyz_w))
    np.testing.assert_array_equal(np.asarray(gmask), np.asarray(gmask_w))
    np.testing.assert_array_equal(np.asarray(grouped), np.asarray(grouped_w))

    # pooled SA output (replicated compute) also matches bitwise
    pooled = ops.masked_max(grouped, gmask, axis=2)
    pooled_w = ops.masked_max(grouped_w, gmask_w, axis=2)
    np.testing.assert_array_equal(np.asarray(pooled), np.asarray(pooled_w))


def test_hybrid_dp_cp_sa_stage_bitwise(rng):
    """Hybrid DP x CP on ONE 2x4 mesh (('data','points')): batch sharded
    over 'data', N sharded over 'points'. Collectives ride the points axis
    only; the result must still be bitwise the unsharded program."""
    mesh2d = make_mesh((2, 4), ("data", "points"))
    B, N, M, K = 4, 512, 32, 16
    xyz = jnp.asarray(rng.uniform(-3, 3, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((B, N, 4)).astype(np.float32))
    mask = np.ones((B, N), bool)
    mask[:, 490:] = False
    m = jnp.asarray(mask)

    new_xyz, grouped, inds, gmask, new_mask = sharded_sa_stage(
        xyz, feats, M, 0.5, K, mesh2d, mask=m, batch_axis="data"
    )

    inds_w = ops.furthest_point_sample(xyz, M, mask=m)
    new_xyz_w = ops.gather(xyz, inds_w)
    grouped_w, _, gmask_w = ops.query_and_group(
        xyz, new_xyz_w, 0.5, K, features=feats, mask=m, normalize_xyz=True,
        exact=True,
    )
    new_mask_w = jnp.take_along_axis(m, inds_w, axis=1)
    gmask_w = gmask_w & new_mask_w[:, :, None]

    np.testing.assert_array_equal(np.asarray(inds), np.asarray(inds_w))
    np.testing.assert_array_equal(np.asarray(new_xyz), np.asarray(new_xyz_w))
    np.testing.assert_array_equal(np.asarray(gmask), np.asarray(gmask_w))
    np.testing.assert_array_equal(np.asarray(grouped), np.asarray(grouped_w))


def test_hybrid_dp_cp_knn_bitwise(rng):
    from tpu3dsad.parallel.point_sharded import sharded_knn

    mesh2d = make_mesh((2, 4), ("data", "points"))
    B, M, N, k = 2, 33, 512, 3
    q = jnp.asarray(rng.uniform(-1, 1, (B, M, 3)).astype(np.float32))
    s = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, N)) < 0.85)

    want_d2, want_idx = ops.knn(q, s, k, support_mask=mask)
    got_d2, got_idx = sharded_knn(
        q, s, k, mesh2d, support_mask=mask, batch_axis="data"
    )
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))
    np.testing.assert_allclose(
        np.asarray(got_d2), np.asarray(want_d2), atol=1e-6
    )


def test_detector_forward_with_cp_mesh_bitwise(rng):
    """The FLAGSHIP MODEL in giant-cloud mode: SizeAdaptiveDetector with
    cp_mesh runs its first cfg.cp_stages SA level(s) point-sharded over the
    mesh and must reproduce the unsharded exact-grouping forward bitwise
    (same params, same inputs)."""
    from tpu3dsad.config import ModelConfig
    from tpu3dsad.models.detector import SizeAdaptiveDetector

    old_fast = ops.get_fast_grouping()
    ops.set_fast_grouping(False)  # CP grouping is exact; match it
    try:
        cfg = ModelConfig(
            num_classes=4,
            sa_npoints=(64, 32, 16, 8),
            sa_nsamples=(8, 8, 4, 4),
            sa_channels=((16, 16), (16, 32), (16, 32), (16, 32)),
            fp_channels=((32, 32), (32, 32)),
            seed_feat_dim=32,
            num_proposals=16,
            cluster_nsample=4,
            cp_stages=2,
        )
        model = SizeAdaptiveDetector(cfg)
        B, N = 2, 512
        pts = jnp.asarray(rng.uniform(-3, 3, (B, N, 3)).astype(np.float32))
        mask = np.ones((B, N), bool)
        mask[:, 500:] = False
        m = jnp.asarray(mask)
        variables = model.init(jax.random.key(0), pts, mask=m, train=False)

        want = model.apply(variables, pts, mask=m, train=False)
        got = model.apply(
            variables, pts, mask=m, train=False, cp_mesh=_mesh()
        )
        for k in ("seed_inds", "proposal_xyz", "raw_params",
                  "objectness_scores"):
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(want[k]), err_msg=k
            )
    finally:
        ops.set_fast_grouping(old_fast)


@pytest.mark.slow
def test_detector_cp_stages2_giant_cloud_bitwise(rng):
    """VERDICT r2 next #9: the flagship detector in giant-cloud mode at
    KITTI scale (~122880 points, B=1) with cp_stages=2 — BOTH leading SA
    levels point-sharded over the 8-device mesh — must reproduce the
    unsharded exact-grouping forward bitwise. Proves the CP composition
    (shard -> SA1 -> reshard -> SA2 -> unsharded tail) holds beyond SA1."""
    from tpu3dsad.config import ModelConfig
    from tpu3dsad.models.detector import SizeAdaptiveDetector

    old_fast = ops.get_fast_grouping()
    ops.set_fast_grouping(False)  # CP grouping is exact; match it
    try:
        cfg = ModelConfig(
            num_classes=3,
            sa_npoints=(256, 64, 16, 8),
            sa_nsamples=(8, 8, 4, 4),
            sa_channels=((8, 16), (16, 16), (16, 16), (16, 16)),
            fp_channels=((16, 16), (16, 16)),
            seed_feat_dim=16,
            num_proposals=16,
            cluster_nsample=4,
            cp_stages=2,
        )
        model = SizeAdaptiveDetector(cfg)
        B, N = 1, 122880  # config-#4 cloud scale; 122880 % 8 == 0
        pts = jnp.asarray(rng.uniform(-35, 35, (B, N, 3)).astype(np.float32))
        mask = np.ones((B, N), bool)
        mask[:, N - 1000:] = False  # ragged tail rides along
        m = jnp.asarray(mask)
        variables = model.init(jax.random.key(0), pts, mask=m, train=False)

        want = model.apply(variables, pts, mask=m, train=False)
        got = model.apply(
            variables, pts, mask=m, train=False, cp_mesh=_mesh()
        )
        for k in ("seed_inds", "seed_xyz", "proposal_xyz", "raw_params",
                  "objectness_scores"):
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(want[k]), err_msg=k
            )
    finally:
        ops.set_fast_grouping(old_fast)
