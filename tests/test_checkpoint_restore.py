"""load_checkpoint failure modes: a mismatched or legacy checkpoint must fail
loudly instead of silently dropping the optimizer state (a silent optimizer
restart changes training results invisibly). Params-only restore is allowed only
behind the explicit params_only flag.

detr_init is faked with a tiny param tree (shaped by num_classes so config
mismatches are real): the checkpoint logic under test — orbax round-trip,
template validation, shape checks, optimizer re-init — never touches the
backbone, and a real R50 init costs ~40 s of XLA:CPU compiles."""
import os

import numpy as np
import pytest


def _tiny_cfg(out_dir, num_classes=5):
    from mdqe_cvpr2023_tpu.engine import load_config
    cfg = load_config("configs/R50_ovis_360.yaml")
    cfg.merge_from_list([
        "MODEL.MDQE.HIDDEN_DIM", "64", "MODEL.MDQE.NHEADS", "4",
        "MODEL.MDQE.ENC_LAYERS", "1", "MODEL.MDQE.DEC_LAYERS", "1",
        "MODEL.MDQE.NUM_OBJECT_QUERIES", "16",
        "MODEL.MDQE.QUERY_EMBED_DIM", "8",
        "MODEL.MDQE.NUM_CLASSES", str(num_classes),
        "MODEL.MDQE.MAX_NUM_INSTANCES", "6",
        "INPUT.SAMPLING_FRAME_NUM", "2",
        "DATALOADER.NUM_WORKERS", "0",
        "OUTPUT_DIR", str(out_dir),
    ])
    return cfg


@pytest.fixture
def fake_init(monkeypatch):
    import jax
    import jax.numpy as jnp
    from mdqe_cvpr2023_tpu.engine import trainer as trainer_mod

    def _fake_detr_init(key, model_cfg):
        k1, k2 = jax.random.split(key)
        return {
            "backbone": {"stem": jax.random.normal(k1, (3, 8))},
            "transformer_dec": {
                "cls_embed": {"w": jax.random.normal(
                    k2, (model_cfg.hidden_dim, model_cfg.num_classes)),
                    "b": jnp.zeros((model_cfg.num_classes,))},
            },
        }

    monkeypatch.setattr(trainer_mod, "detr_init", _fake_detr_init)
    return _fake_detr_init


def test_mismatched_checkpoint_raises(tmp_path, fake_init):
    from mdqe_cvpr2023_tpu.engine.trainer import Trainer

    t_a = Trainer(_tiny_cfg(tmp_path / "a", num_classes=5))
    t_a.iteration = 3
    t_a.save_checkpoint()
    ckpt = os.path.join(str(tmp_path / "a"), "ckpt_0000003")
    assert os.path.exists(ckpt)

    t_b = Trainer(_tiny_cfg(tmp_path / "b", num_classes=3))  # different model
    with pytest.raises(RuntimeError, match="params_only"):
        t_b.load_checkpoint(ckpt)
    # explicit params-only restore also rejects the shape mismatch, by name
    with pytest.raises(ValueError, match="shape"):
        t_b.load_checkpoint(ckpt, params_only=True)


def test_legacy_params_only_checkpoint(tmp_path, fake_init):
    import orbax.checkpoint as ocp
    from mdqe_cvpr2023_tpu.engine.trainer import Trainer

    t_a = Trainer(_tiny_cfg(tmp_path / "a"))
    legacy = os.path.abspath(str(tmp_path / "legacy_ckpt"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(legacy, {"params": t_a.params, "step": 7})
    ckptr.wait_until_finished()

    t_b = Trainer(_tiny_cfg(tmp_path / "b"))
    with pytest.raises(RuntimeError):  # default restore must NOT silently work
        t_b.load_checkpoint(legacy)

    t_b.load_checkpoint(legacy, params_only=True)
    assert t_b.iteration == 7
    import jax
    for ref, got in zip(jax.tree.leaves(t_a.params), jax.tree.leaves(t_b.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # optimizer state re-initialized against the restored params
    leaves = [np.asarray(x) for x in jax.tree.leaves(t_b.opt_state)
              if hasattr(x, "shape") and np.ndim(x) > 0]
    assert all((l == 0).all() for l in leaves)


def test_corrupted_checkpoint_raises(tmp_path, fake_init):
    from mdqe_cvpr2023_tpu.engine.trainer import Trainer

    t = Trainer(_tiny_cfg(tmp_path / "a"))
    bad = tmp_path / "not_a_checkpoint"
    bad.mkdir()
    (bad / "garbage").write_text("nope")
    with pytest.raises(Exception):
        t.load_checkpoint(str(bad))


@pytest.mark.slow
def test_real_model_checkpoint_round_trip(tmp_path):
    """Same round-trip with the REAL tiny R50 model (no fakes): save, restore
    into a fresh Trainer, verify params and step survive."""
    import jax
    from mdqe_cvpr2023_tpu.engine.trainer import Trainer

    t_a = Trainer(_tiny_cfg(tmp_path / "a"))
    t_a.iteration = 2
    t_a.save_checkpoint()
    t_b = Trainer(_tiny_cfg(tmp_path / "b"))
    t_b.load_checkpoint(os.path.join(str(tmp_path / "a"), "ckpt_0000002"))
    assert t_b.iteration == 2
    for ref, got in zip(jax.tree.leaves(t_a.params), jax.tree.leaves(t_b.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
