import pytest

from deepwmh_tpu.utils.parallel import run_parallel


def test_run_parallel_results_in_order():
    out = run_parallel(lambda x: x * 2, list(range(20)), num_workers=4,
                       show_progress=False)
    assert out == [x * 2 for x in range(20)]


def test_run_parallel_fail_fast():
    def worker(x):
        if x == 5:
            raise ValueError("boom")
        return x

    with pytest.raises(ValueError, match="boom"):
        run_parallel(worker, list(range(10)), num_workers=3, show_progress=False)


def test_run_parallel_empty():
    assert run_parallel(lambda x: x, [], show_progress=False) == []
