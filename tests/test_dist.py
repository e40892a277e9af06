"""Multi-host gather helpers (utils/dist.py). Real multi-process gather can't
run in a single-host test env; the degenerate world (process_count == 1) and
the serialization roundtrip are covered."""
import numpy as np

from mdqe_cvpr2023_tpu.utils.dist import all_gather_objects, is_main_process


def test_single_process_identity():
    obj = {"video_id": 3, "segs": [np.arange(5)], "s": "x"}
    out = all_gather_objects(obj)
    assert len(out) == 1
    assert out[0]["video_id"] == 3
    np.testing.assert_array_equal(out[0]["segs"][0], np.arange(5))
    assert is_main_process()
