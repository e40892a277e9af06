"""Training-step tests: loss computation, gradients, and data-parallel execution on
the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdqe_cvpr2023_tpu.models import MDQEModelCfg, detr_init
from mdqe_cvpr2023_tpu.losses import CriterionCfg
from mdqe_cvpr2023_tpu.parallel import (TrainCfg, make_mesh, make_optimizer,
                                        make_train_step, shard_batch)
from mdqe_cvpr2023_tpu.parallel.train import replicate

TINY = MDQEModelCfg(backbone="resnet50", num_classes=5, hidden_dim=64, n_heads=4,
                    enc_layers=1, dec_layers=1, n_frames=2, n_query=16,
                    query_embed_dim=8, dec_temporal=True)
CRIT = CriterionCfg(num_classes=5, n_frames=2, n_query=16,
                    window_inter_frame_asso=5, num_points=64)


def make_batch(B, T, Hp=64, Wp=64, N=3, seed=0):
    rng = np.random.default_rng(seed)
    masks = np.zeros((B, N, T, Hp, Wp), np.float32)
    boxes = np.zeros((B, N, T, 4), np.float32)
    labels = np.zeros((B, N), np.int32)
    ids = np.full((B, N, T), -1, np.int32)
    valid = np.zeros((B, N), bool)
    for b in range(B):
        for n in range(2):  # 2 of 3 slots valid
            x0, y0 = rng.integers(0, Hp // 2, 2)
            w, h = rng.integers(10, 28, 2)
            masks[b, n, :, y0:y0 + h, x0:x0 + w] = 1.0
            boxes[b, n, :] = [x0 / Wp, y0 / Hp, min(x0 + w, Wp) / Wp,
                              min(y0 + h, Hp) / Hp]
            labels[b, n] = rng.integers(0, 5)
            ids[b, n, :] = n
            valid[b, n] = True
    return {
        "images": rng.standard_normal((B * T, Hp, Wp, 3)).astype(np.float32),
        "image_sizes": np.tile([[Hp, Wp]], (B * T, 1)).astype(np.int32),
        "labels": labels, "ids": ids, "boxes": boxes,
        "masks": masks, "valid": valid,
    }


def test_frozen_leaf_mask_structure():
    """The mask must cover exactly what the reference never optimizes: FrozenBN
    stats dicts, the decoder's fixed sampling grid buffer, lvl_spatial_scales,
    and (freeze_at=2) the stem+res2 stages — while the encoder's LEARNED
    sampling_offsets linear stays trainable."""
    from mdqe_cvpr2023_tpu.parallel.train import frozen_leaf_mask
    params = detr_init(jax.random.PRNGKey(0), TINY)
    mask = frozen_leaf_mask(params, freeze_at=2)
    bb = mask["backbone"]
    # whole frozen stages
    assert all(jax.tree_util.tree_leaves(bb["stem"]))
    assert all(jax.tree_util.tree_leaves(bb["res2"]))
    # unfrozen stage: only its FrozenBN stats dicts are marked
    res3 = mask["backbone"]["res3"]
    flat = jax.tree_util.tree_flatten_with_path(res3)[0]
    for kp, v in flat:
        keys = [getattr(k, "key", None) for k in kp]
        assert v == ("norm" in keys), jax.tree_util.keystr(kp)
    # decoder fixed grid buffer + lvl scales frozen; learned offsets trainable
    layer0 = mask["transformer_dec"]["decoder"]["layers"][0]
    assert layer0["cross_attn"]["sampling_offsets"] is True
    assert layer0["cross_attn"]["lvl_spatial_scales"] is True
    enc_attn = mask["transformer_enc"]["encoder"]["layers"][0]["self_attn"]
    assert enc_attn["sampling_offsets"]["weight"] is False
    assert enc_attn["lvl_spatial_scales"] is True

    # freeze_at=0 keeps the stages trainable but still freezes BN stats
    mask0 = frozen_leaf_mask(params, freeze_at=0)
    assert not all(jax.tree_util.tree_leaves(mask0["backbone"]["res2"]))
    assert all(jax.tree_util.tree_leaves(
        mask0["backbone"]["stem"]["conv1"]["norm"]))


@pytest.mark.slow
def test_train_step_runs_and_decreases_loss():
    from mdqe_cvpr2023_tpu.parallel.train import frozen_leaf_mask
    params = detr_init(jax.random.PRNGKey(0), TINY)
    params0 = jax.tree.map(np.asarray, params)
    tc = TrainCfg(base_lr=1e-3, steps=(1000,), max_iter=100, clip_norm=1.0)
    tx = make_optimizer(tc)
    opt_state = tx.init(params)
    step = make_train_step(TINY, CRIT, tx)
    batch = jax.tree.map(jnp.asarray, make_batch(B=2, T=2))
    rng = jax.random.PRNGKey(1)

    losses = []
    for i in range(3):
        params, opt_state, total, ldict = step(params, opt_state, batch,
                                               jax.random.fold_in(rng, i))
        losses.append(float(total))
    assert all(np.isfinite(losses))
    for k, v in jax.tree.map(float, ldict).items():
        assert np.isfinite(v), k
    assert losses[-1] < losses[0]  # overfitting a fixed batch reduces loss

    # frozen leaves (buffers, freeze_at stages) must be bit-identical after 3
    # optimizer steps — the reference never updates or weight-decays them
    mask = frozen_leaf_mask(params, tc.freeze_at)
    n_frozen = n_trained = 0
    for (kp, new), old, fz in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_leaves(params0),
            jax.tree_util.tree_leaves(mask)):
        if fz:
            assert np.array_equal(np.asarray(new), old), \
                f"frozen leaf changed: {jax.tree_util.keystr(kp)}"
            n_frozen += 1
        elif not np.array_equal(np.asarray(new), old):
            n_trained += 1
    assert n_frozen > 10 and n_trained > 10


@pytest.mark.slow
def test_train_step_data_parallel_mesh():
    mesh = make_mesh()
    assert len(mesh.devices.reshape(-1)) == 8
    params = detr_init(jax.random.PRNGKey(0), TINY)
    tc = TrainCfg(base_lr=1e-4)
    tx = make_optimizer(tc)
    opt_state = tx.init(params)
    step = make_train_step(TINY, CRIT, tx)

    batch = make_batch(B=8, T=2, seed=1)
    with mesh:
        sharded = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
        params_r = replicate(params, mesh)
        opt_r = replicate(opt_state, mesh)
        params2, opt2, total, _ = step(params_r, opt_r, sharded,
                                       jax.random.PRNGKey(2))
    assert np.isfinite(float(total))


@pytest.mark.slow
def test_train_step_amp_decreases_loss():
    """AMP mode (bf16 model + bf16-matmul criterion, fp32 islands — the reference
    SOLVER.AMP analog): finite losses that decrease when overfitting a batch."""
    params = detr_init(jax.random.PRNGKey(0), TINY)
    tc = TrainCfg(base_lr=1e-3, steps=(1000,), max_iter=100, clip_norm=1.0)
    tx = make_optimizer(tc)
    opt_state = tx.init(params)
    step = make_train_step(TINY, CRIT, tx, amp=True)
    batch = jax.tree.map(jnp.asarray, make_batch(B=2, T=2))
    rng = jax.random.PRNGKey(1)

    losses = []
    for i in range(3):
        params, opt_state, total, ldict = step(params, opt_state, batch,
                                               jax.random.fold_in(rng, i))
        losses.append(float(total))
    assert all(np.isfinite(losses))
    # fp32 masters: params must stay f32 even though the fwd ran bf16
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype != jnp.bfloat16 for l in leaves)
    assert losses[-1] < losses[0]


def test_amp_forward_close_to_f32():
    """The bf16 model forward under AMP must track the f32 forward closely
    (same weights/inputs; fp32 islands keep boxes exactly comparable). Guards
    the dtype plumbing: a silent promotion back to f32 would pass, but a
    missing fp32 island (box path, softmax, norms) or a bf16 leak into the
    criterion's accumulations would drift far beyond these tolerances."""
    import jax
    import jax.numpy as jnp
    from mdqe_cvpr2023_tpu.models.detr import detr_apply_backbone

    params = detr_init(jax.random.PRNGKey(0), TINY)
    T = TINY.n_frames
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((T, 64, 64, 3)), jnp.float32)
    sizes = jnp.asarray([[64, 64]] * T, jnp.int32)

    outs = {}
    for amp in (False, True):
        outs[amp] = detr_apply_backbone(params, TINY, images, sizes,
                                        n_frames=T, training=True, amp=amp)
    assert outs[True]["boxes"].dtype == jnp.float32  # fp32 box island
    # Discrete decisions (grid-guided per-cell argmax, inter-frame argmax
    # association) can legitimately flip under bf16 rounding, replacing a few
    # queries wholesale — so assert that the OVERWHELMING majority of entries
    # track the f32 path closely rather than all of them. A missing fp32
    # island corrupts every entry and fails these fractions immediately.
    db = np.abs(np.asarray(outs[True]["boxes"], np.float32)
                - np.asarray(outs[False]["boxes"], np.float32))
    assert (db < 0.05).mean() > 0.85, f"box agreement {(db < 0.05).mean():.3f}"
    dc = np.abs(np.asarray(outs[True]["cls"], np.float32)
                - np.asarray(outs[False]["cls"], np.float32))
    assert (dc < 0.35).mean() > 0.85, f"cls agreement {(dc < 0.35).mean():.3f}"
    assert np.median(dc) < 0.05
