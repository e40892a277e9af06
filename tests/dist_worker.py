"""Worker for tests/test_dist_multiprocess.py: one real JAX process in a 2-process
CPU cluster. Exercises the actual multi-host path the reference runs via launch()
(/root/reference/train_net.py:264-271) and the rank-0 eval gather
(/root/reference/mdqe/data/ytvis_eval.py:122-128):

  - jax.distributed.initialize against a shared coordinator (train_net.py:42-43)
  - per-process video sharding (engine/trainer.py::Trainer.test)
  - all_gather_objects reassembly across processes (utils/dist.py)
  - results-file writing gated to the main process only

Invoked: python dist_worker.py <coordinator> <num_procs> <proc_id> <workdir>
Writes <workdir>/report_<proc_id>.json with everything the test asserts on.
"""
import json
import os
import sys


def main():
    coordinator, num_procs, proc_id, workdir = sys.argv[1:5]
    num_procs, proc_id = int(num_procs), int(proc_id)

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    # the image's sitecustomize imports jax and pins JAX_PLATFORMS=axon at
    # interpreter startup, so the platform must be overridden via jax.config
    # (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    # CPU cross-process collectives ride gloo (the TPU path rides ICI; this is
    # the single-host test harness for the same code)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_procs, process_id=proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.process_index() == proc_id
    assert len(jax.devices()) == 2 * num_procs  # 2 local CPU devices per proc

    # --- all_gather_objects: rank-dependent sizes exercise the padding path ---
    from mdqe_cvpr2023_tpu.utils.dist import all_gather_objects, is_main_process
    payload = {"rank": proc_id, "blob": "x" * (10 + 1000 * proc_id)}
    gathered = all_gather_objects(payload)
    assert [g["rank"] for g in gathered] == list(range(num_procs)), gathered
    assert all(len(g["blob"]) == 10 + 1000 * g["rank"] for g in gathered)

    # --- Trainer.test: video sharding + gather + single-writer results file ---
    root = os.path.join(workdir, "ds")
    from mdqe_cvpr2023_tpu.data import builtin
    builtin.DATASET_SPLITS["ytvis_ovis_dev"] = ("ovis/train", "ovis/valid_sub.json")

    from mdqe_cvpr2023_tpu.engine import load_config
    from mdqe_cvpr2023_tpu.engine.trainer import Trainer

    out_dir = os.path.join(workdir, f"out_rank{proc_id}")
    cfg = load_config("configs/R50_ovis_360.yaml")
    cfg.merge_from_list([
        "MODEL.MDQE.HIDDEN_DIM", "64", "MODEL.MDQE.NHEADS", "4",
        "MODEL.MDQE.ENC_LAYERS", "1", "MODEL.MDQE.DEC_LAYERS", "1",
        "MODEL.MDQE.NUM_OBJECT_QUERIES", "16", "MODEL.MDQE.QUERY_EMBED_DIM", "8",
        "MODEL.MDQE.NUM_CLASSES", "1", "MODEL.MDQE.MAX_NUM_INSTANCES", "6",
        "DATASETS.TEST", "[ytvis_ovis_dev]", "OUTPUT_DIR", out_dir,
    ])

    seen = []

    def fake_predict(self, records):
        seen.extend(r["video_id"] for r in records)
        return [{"video_id": r["video_id"], "category_id": 1, "score": 0.5,
                 "segmentations": []} for r in records]

    Trainer.predict_videos = fake_predict
    trainer = Trainer(cfg, datasets_root=root)
    metrics, predictions = trainer.test()

    # --- cross-process gradient all-reduce: ONE real optimizer step ---
    # (reference DDP all-reduces grads every step, train_net.py:264-271; until
    # round 5 our grad psum had only ever run on a single-process mesh). Global
    # batch = num_procs videos, mesh = one device per process, so every grad
    # psum crosses the gloo transport. The parent test compares the updated
    # params against a single-process run of the SAME step (tests/tiny_train.py
    # guarantees bit-identical configs/params/batch on both sides).
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tiny_train import tiny_batch, tiny_train_setup

    params, tx, opt_state, step = tiny_train_setup()
    batch = tiny_batch(B=num_procs)
    T = 2

    one_per_proc = [next(d for d in jax.devices() if d.process_index == p)
                    for p in range(num_procs)]
    mesh = Mesh(np.asarray(one_per_proc), ("data",))

    def to_global(x, local_rows):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), local_rows, np.shape(x))

    gbatch = {}
    for k, v in batch.items():
        rows_per_video = T if v.shape[0] == num_procs * T else 1
        local = v[proc_id * rows_per_video:(proc_id + 1) * rows_per_video]
        gbatch[k] = to_global(v, local)
    rep = NamedSharding(mesh, P())
    params_r = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        params)
    opt_r = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        opt_state)

    with mesh:
        params2, _, total, _ = step(params_r, opt_r, gbatch,
                                    jax.random.PRNGKey(1))
        jax.block_until_ready(total)
    flat, _ = jax.tree_util.tree_flatten(params2)
    np.savez(os.path.join(workdir, f"params_after_{proc_id}.npz"),
             **{str(i): np.asarray(x.addressable_data(0)) for i, x in
                enumerate(flat)})

    results_path = os.path.join(out_dir, "results_ytvis_ovis_dev.json")
    report = {
        "rank": proc_id,
        "seen_video_ids": sorted(seen),
        "gathered_video_ids": sorted(p["video_id"] for p in predictions),
        "is_main": is_main_process(),
        "wrote_results": os.path.exists(results_path),
        "train_total_loss": float(np.asarray(total.addressable_data(0))),
    }
    with open(os.path.join(workdir, f"report_{proc_id}.json"), "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
