"""End-to-end Trainer smoke test: synthetic on-disk dataset -> config -> train loop
-> orbax checkpoint -> eval with AP computation. Tiny model, CPU."""
import os

import pytest


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    from synth_dataset import build_mini_dataset
    return build_mini_dataset(tmp_path_factory.mktemp("ds"))


@pytest.mark.slow
def test_trainer_end_to_end(mini_dataset, tmp_path, monkeypatch):
    from mdqe_cvpr2023_tpu.data import builtin
    monkeypatch.setitem(builtin.DATASET_SPLITS, "ytvis_ovis_train",
                        ("ovis/train", "ovis/annotations_train.json"))
    monkeypatch.setitem(builtin.DATASET_SPLITS, "ytvis_ovis_dev",
                        ("ovis/train", "ovis/valid_sub.json"))

    from mdqe_cvpr2023_tpu.engine import load_config
    from mdqe_cvpr2023_tpu.engine.trainer import Trainer

    cfg = load_config("configs/R50_ovis_360.yaml")
    cfg.merge_from_list([
        "MODEL.MDQE.HIDDEN_DIM", "64", "MODEL.MDQE.NHEADS", "4",
        "MODEL.MDQE.ENC_LAYERS", "1", "MODEL.MDQE.DEC_LAYERS", "1",
        "MODEL.MDQE.NUM_OBJECT_QUERIES", "16", "MODEL.MDQE.QUERY_EMBED_DIM", "8",
        "MODEL.MDQE.NUM_CLASSES", "1", "MODEL.MDQE.MAX_NUM_INSTANCES", "6",
        "MODEL.MDQE.SAMPLING_FRAME_NUM_TEST", "2",
        "MODEL.MDQE.WINDOW_FRAME_NUM_TEST", "4",
        "INPUT.SAMPLING_FRAME_NUM", "2",
        "INPUT.MIN_SIZE_TRAIN", "[64]", "INPUT.MAX_SIZE_TRAIN", "64",
        "INPUT.MIN_SIZE_TEST", "64", "INPUT.CROP.ENABLED", "False",
        "DATASETS.TRAIN", "[ytvis_ovis_train]",
        "DATASETS.TEST", "[ytvis_ovis_dev]",
        "SOLVER.IMS_PER_BATCH", "8", "SOLVER.CHECKPOINT_PERIOD", "1000",
        "TEST.EVAL_PERIOD", "0",
        "OUTPUT_DIR", str(tmp_path / "out"),
    ])
    trainer = Trainer(cfg, datasets_root=str(mini_dataset))
    trainer.train(max_iter=2, log_every=1)
    assert trainer.iteration == 2
    assert os.path.exists(tmp_path / "out" / "metrics.jsonl")

    trainer.save_checkpoint()
    ckpts = [p for p in os.listdir(tmp_path / "out") if p.startswith("ckpt_")]
    assert ckpts

    metrics, preds = trainer.test(max_videos=1)
    assert metrics is not None and "AP" in metrics
    assert isinstance(preds, list)

    # checkpoint restore round-trip
    trainer2 = Trainer(cfg, datasets_root=str(mini_dataset))
    trainer2.load_checkpoint(str(tmp_path / "out" / sorted(ckpts)[-1]))
    assert trainer2.iteration == 2
