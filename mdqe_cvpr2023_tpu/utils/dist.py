"""Multi-host collectives for host-side Python objects.

Behavioral spec: the reference gathers per-video predictions to rank 0 before
evaluation (/root/reference/mdqe/data/ytvis_eval.py:122-128, Detectron2
comm.gather over torch.distributed; pickle-based all_gather in
/root/reference/mdqe/util/misc.py:89-129).

TPU-native equivalent: serialize to bytes and ride XLA collectives via
jax.experimental.multihost_utils.process_allgather — no NCCL/MPI analog
needed; the byte tensors ride ICI/DCN like any other array. Single-process
(the common case, and anything the driver runs here) degenerates to identity.
"""
from __future__ import annotations

import pickle
from typing import Any, List


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather a picklable object from every JAX process; returns the list in
    process order (length jax.process_count())."""
    import jax

    if jax.process_count() == 1:
        return [obj]

    import numpy as np
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    # lengths first (fixed shape), then the padded payloads
    n = np.asarray([payload.size], np.int64)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    max_len = int(sizes.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[:payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(jax.process_count(), max_len)
    return [pickle.loads(gathered[i, :int(sizes[i])].tobytes())
            for i in range(jax.process_count())]


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0
