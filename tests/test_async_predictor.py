"""AsyncPredictor (demo/predictor.py): ordered results, sync __call__,
exception propagation — the reference demo/predictor.py:123-211 contract."""
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "demo"))

from predictor import AsyncPredictor  # noqa: E402


def test_results_come_back_in_submission_order():
    def predict(x):
        # later submissions finish faster; get() must still return in order
        time.sleep(0.05 if x == 0 else 0.0)
        return x * 10

    p = AsyncPredictor(predict)
    for i in range(5):
        p.put(i)
    assert [p.get() for _ in range(5)] == [0, 10, 20, 30, 40]
    assert len(p) == 0
    p.shutdown()


def test_call_is_synchronous_and_reusable():
    p = AsyncPredictor(lambda x: x + 1)
    assert p(41) == 42
    assert p(1) == 2
    p.shutdown()


def test_worker_exception_reraised_from_get():
    def predict(x):
        if x == "bad":
            raise ValueError("boom")
        return x

    p = AsyncPredictor(predict)
    p.put("ok")
    p.put("bad")
    assert p.get() == "ok"
    with pytest.raises(ValueError, match="boom"):
        p.get()
    # the worker survives an exception and keeps serving
    assert p("after") == "after"
    p.shutdown()
