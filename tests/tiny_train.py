"""Deterministic tiny-model train-step setup shared by the 2-process cluster
worker (tests/dist_worker.py) and its single-process oracle
(tests/test_dist_multiprocess.py): both sides must build bit-identical configs,
params, and global batch so the only difference under test is WHERE the
gradient all-reduce runs (gloo across processes vs XLA within one process) —
the reference's DDP grad all-reduce (/root/reference/train_net.py:264-271)."""
import numpy as np


def tiny_cfgs():
    from mdqe_cvpr2023_tpu.losses import CriterionCfg
    from mdqe_cvpr2023_tpu.models import MDQEModelCfg

    cfg = MDQEModelCfg(backbone="resnet50", num_classes=5, hidden_dim=64,
                       n_heads=4, enc_layers=1, dec_layers=1, n_frames=2,
                       n_query=16, query_embed_dim=8, dec_temporal=True)
    crit = CriterionCfg(num_classes=cfg.num_classes, n_frames=cfg.n_frames,
                        n_query=cfg.n_query, num_points=64)
    return cfg, crit


def tiny_batch(B=2, T=2, Hp=64, Wp=64, N=3):
    """Global batch as numpy: B videos with per-video distinct pixel content so
    a sharding mix-up (wrong video on a process) cannot cancel out."""
    rng = np.random.default_rng(0)
    masks = np.zeros((B, N, T, Hp, Wp), np.float32)
    masks[:, :2, :, 8:24, 8:24] = 1.0
    images = rng.integers(0, 255, (B * T, Hp, Wp, 3)).astype(np.uint8)
    return {
        "images": images,
        "image_sizes": np.tile([[Hp, Wp]], (B * T, 1)).astype(np.int32),
        "labels": np.zeros((B, N), np.int32),
        "ids": (np.where(np.arange(N)[None, :, None] < 2,
                         np.arange(N)[None, :, None], -1)
                * np.ones((B, 1, T), np.int64)).astype(np.int32),
        "boxes": np.tile([[8 / Wp, 8 / Hp, 24 / Wp, 24 / Hp]],
                         (B, N, T, 1)).astype(np.float32),
        "masks": masks,
        "valid": (np.arange(N)[None] < 2).repeat(B, 0),
    }


def tiny_train_setup():
    """(params, tx, opt_state, step_fn) — everything PRNG-deterministic."""
    import jax
    from mdqe_cvpr2023_tpu.models.detr import detr_init
    from mdqe_cvpr2023_tpu.parallel import (TrainCfg, make_optimizer,
                                            make_train_step)

    cfg, crit = tiny_cfgs()
    params = detr_init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainCfg())
    opt_state = tx.init(params)
    step = make_train_step(cfg, crit, tx)
    return params, tx, opt_state, step


def main():
    """Single-process oracle: the SAME global-batch-2 optimizer step the
    2-process cluster runs (tests/dist_worker.py), on a 2-device
    single-process mesh — identical psum reduction structure, only the
    collective transport differs (in-process XLA vs cross-process gloo).
    Writes <workdir>/params_oracle.npz for the parent test to compare.
    Run as a subprocess so float precision matches the workers (the pytest
    conftest enables x64 in-process)."""
    import os
    import sys

    workdir = sys.argv[1]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    params, tx, opt_state, step = tiny_train_setup()
    batch = tiny_batch(B=2)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    gbatch = {k: jax.device_put(v, data) for k, v in batch.items()}
    params = jax.tree.map(lambda x: jax.device_put(x, rep), params)
    opt_state = jax.tree.map(lambda x: jax.device_put(x, rep), opt_state)
    with mesh:
        params2, _, total, _ = step(params, opt_state, gbatch,
                                    jax.random.PRNGKey(1))
        jax.block_until_ready(total)
    flat, _ = jax.tree_util.tree_flatten(params2)
    np.savez(os.path.join(workdir, "params_oracle.npz"),
             **{str(i): np.asarray(x) for i, x in enumerate(flat)})
    with open(os.path.join(workdir, "oracle_total.txt"), "w") as f:
        f.write(repr(float(np.asarray(total))))


if __name__ == "__main__":
    main()
