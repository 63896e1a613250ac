"""E2 retry policy (embed/backends.py with_retries) — offline, no provider."""

import pytest

from vectorflow_spark.embed.backends import with_retries


class Flaky:
    def __init__(self, fail_times: int):
        self.fail_times = fail_times
        self.calls = 0

    def __call__(self, texts):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ConnectionError(f"transient #{self.calls}")
        return [[1.0] for _ in texts]


def test_succeeds_after_transient_failures():
    sleeps: list[float] = []
    fn = Flaky(fail_times=3)
    call = with_retries(fn, retries=5, sleep=sleeps.append)
    assert call(["a", "b"]) == [[1.0], [1.0]]
    assert fn.calls == 4
    # the reference's exponential backoff: 2^0, 2^1, 2^2
    assert sleeps == [1, 2, 4]


def test_raises_after_final_attempt_without_trailing_sleep():
    sleeps: list[float] = []
    fn = Flaky(fail_times=10)
    call = with_retries(fn, retries=3, sleep=sleeps.append)
    with pytest.raises(RuntimeError, match="failed after 3 attempts"):
        call(["a"])
    assert fn.calls == 3
    assert sleeps == [1, 2]  # no sleep after the last failure


def test_first_try_success_never_sleeps():
    sleeps: list[float] = []
    call = with_retries(Flaky(fail_times=0), retries=5, sleep=sleeps.append)
    assert call(["x"]) == [[1.0]]
    assert sleeps == []
