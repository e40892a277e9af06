"""Checkpoint converter tests: name mapping, temporal inflation, .pth round trip."""
import numpy as np
import pytest

from mdqe_cvpr2023_tpu.engine.checkpoint import (convert_torch_state_dict,
                                                 inflate_temporal_weights)


def test_convert_nesting_and_listify():
    sd = {
        "detr.transformer_enc.level_embed": np.zeros((4, 8)),
        "detr.transformer_enc.encoder.layers.0.norm1.weight": np.ones(8),
        "detr.transformer_enc.encoder.layers.1.norm1.weight": np.ones(8) * 2,
        "detr.input_proj.0.0.weight": np.zeros((8, 4, 1, 1)),
        "detr.input_proj.0.1.bias": np.zeros(8),
        "detr.transformer_dec.cpbtest.cpb_mlp.0.weight": np.zeros((4, 2)),
        "detr.transformer_dec.cpbtest.cpb_mlp.2.weight": np.zeros((2, 4)),
        "detr.transformer_dec.query_relpos_grid": np.zeros((4, 4, 2)),  # skipped
        "criterion.something": np.zeros(3),  # skipped
    }
    tree = convert_torch_state_dict(sd)
    assert tree["transformer_enc"]["level_embed"].shape == (4, 8)
    layers = tree["transformer_enc"]["encoder"]["layers"]
    assert isinstance(layers, list) and len(layers) == 2
    assert float(layers[1]["norm1"]["weight"][0]) == 2.0
    assert tree["input_proj"][0]["conv"]["weight"].shape == (8, 4, 1, 1)
    assert tree["input_proj"][0]["gn"]["bias"].shape == (8,)
    # non-contiguous Sequential indices stay dict-keyed
    cpb = tree["transformer_dec"]["cpbtest"]["cpb_mlp"]
    assert set(cpb.keys()) == {"0", "2"}
    assert "query_relpos_grid" not in tree["transformer_dec"].get("cpbtest", {})


def test_temporal_inflation():
    H, P = 8, 4
    f_pre, f_tgt = 1, 4
    sd = {
        "detr.transformer_dec.decoder.layers.0.temp_attn_inst.attention_weights.weight":
            np.arange(H * f_pre * P * 256, dtype=np.float32).reshape(H * f_pre * P, 256),
        "detr.transformer_dec.decoder.layers.0.temp_attn_inst.attention_weights.bias":
            np.arange(H * f_pre * P, dtype=np.float32),
        "detr.transformer_dec.decoder.layers.0.temp_attn_inst.sampling_offsets":
            np.arange(1 * 1 * H * f_pre * P * 2, dtype=np.float32).reshape(
                1, 1, H, f_pre, P, 2),
        "detr.transformer_dec.decoder.layers.0.temp_attn_inst.lvl_spatial_scales":
            np.full((f_pre,), 2.0),
        "other.weight": np.ones(3),
    }
    out = inflate_temporal_weights(sd, f_pre, f_tgt)
    w = out["detr.transformer_dec.decoder.layers.0.temp_attn_inst.attention_weights.weight"]
    assert w.shape == (H * f_tgt * P, 256)
    # frame axis is tiled: all frames of a head repeat the pretrain frame
    w5 = w.reshape(H, f_tgt, P, 256)
    for t in range(1, f_tgt):
        np.testing.assert_array_equal(w5[:, t], w5[:, 0])
    b = out["detr.transformer_dec.decoder.layers.0.temp_attn_inst.attention_weights.bias"]
    assert b.shape == (H * f_tgt * P,)
    so = out["detr.transformer_dec.decoder.layers.0.temp_attn_inst.sampling_offsets"]
    assert so.shape == (1, 1, H, f_tgt, P, 2)
    ls = out["detr.transformer_dec.decoder.layers.0.temp_attn_inst.lvl_spatial_scales"]
    assert ls.shape == (f_tgt,)
    np.testing.assert_array_equal(out["other.weight"], np.ones(3))


def test_pth_round_trip(tmp_path):
    torch = pytest.importorskip("torch")
    from mdqe_cvpr2023_tpu.engine.checkpoint import load_torch_checkpoint

    sd = {"detr.transformer_enc.level_embed": torch.arange(12.0).reshape(4, 3)}
    path = tmp_path / "m.pth"
    torch.save({"model": sd}, str(path))
    tree = load_torch_checkpoint(str(path))
    np.testing.assert_allclose(np.asarray(tree["transformer_enc"]["level_embed"]),
                               np.arange(12.0).reshape(4, 3))
