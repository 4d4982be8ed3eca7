"""run_with_backend_retry: transient accelerator errors re-run the job,
everything else propagates immediately."""

import pytest

from lstm_ctc_tpu.cli import (
    is_transient_backend_error,
    run_with_backend_retry,
)


class FakeJaxRuntimeError(Exception):
    pass


# classifier keys on the exception type NAME (jax's real class is
# jax.errors.JaxRuntimeError; importing it here would init a backend)
FakeJaxRuntimeError.__name__ = "JaxRuntimeError"


def test_classifier():
    assert is_transient_backend_error(
        FakeJaxRuntimeError("INTERNAL: http 500 remote_compile failed"))
    assert is_transient_backend_error(
        FakeJaxRuntimeError("FAILED_PRECONDITION: chip busy"))
    # model-side NaN/shape errors are not transient
    assert not is_transient_backend_error(
        FakeJaxRuntimeError("got nan loss"))
    # arbitrary exception types are never retried
    assert not is_transient_backend_error(
        ValueError("FAILED_PRECONDITION lookalike"))


def _stub_reset(monkeypatch):
    # the real reset tears down live jax backends — keep unit tests
    # hermetic (other tests in the process hold live arrays)
    import jax.extend.backend
    calls = []
    monkeypatch.setattr(jax.extend.backend, "clear_backends",
                        lambda: calls.append(1))
    return calls


def test_retries_then_succeeds(monkeypatch):
    monkeypatch.setenv("LSTM_CTC_TPU_BACKEND_RETRIES", "3")
    monkeypatch.setattr("time.sleep", lambda s: None)
    resets = _stub_reset(monkeypatch)
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise FakeJaxRuntimeError("UNAVAILABLE: socket closed")
        return "done"

    assert run_with_backend_retry(flaky, what="test") == "done"
    assert len(calls) == 3
    assert len(resets) == 2  # backend reset between attempts


def test_retry_budget_exhausted(monkeypatch):
    monkeypatch.setenv("LSTM_CTC_TPU_BACKEND_RETRIES", "1")
    monkeypatch.setattr("time.sleep", lambda s: None)
    _stub_reset(monkeypatch)
    calls = []

    def always_fails():
        calls.append(1)
        raise FakeJaxRuntimeError("ABORTED: tunnel dropped")

    with pytest.raises(FakeJaxRuntimeError):
        run_with_backend_retry(always_fails, what="test")
    assert len(calls) == 2  # initial + 1 retry


def test_non_transient_not_retried(monkeypatch):
    monkeypatch.setenv("LSTM_CTC_TPU_BACKEND_RETRIES", "5")
    calls = []

    def nan_loss():
        calls.append(1)
        raise RuntimeError("got nan loss, exiting")

    with pytest.raises(RuntimeError):
        run_with_backend_retry(nan_loss, what="test")
    assert len(calls) == 1
