"""run_with_backend_retry: transient accelerator errors re-run the job,
everything else propagates immediately."""

import pytest

from lstm_ctc_tpu.cli import (
    is_transient_backend_error,
    note_output_emitted,
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


def test_no_retry_after_streamed_output(monkeypatch):
    """A transient failure AFTER a record has been streamed must fail
    hard: re-running main() would re-emit every record into the
    already-consumed stdout pipe (decode_ctc_lat.sh's ark:- wspecifier),
    silently corrupting the archive downstream."""
    monkeypatch.setenv("LSTM_CTC_TPU_BACKEND_RETRIES", "5")
    monkeypatch.setattr("time.sleep", lambda s: None)
    _stub_reset(monkeypatch)
    calls = []

    def streams_then_dies():
        calls.append(1)
        note_output_emitted()  # one record went out the pipe
        raise FakeJaxRuntimeError("UNAVAILABLE: socket closed")

    with pytest.raises(FakeJaxRuntimeError):
        run_with_backend_retry(streams_then_dies, what="test")
    assert len(calls) == 1  # no retry once output was emitted


def test_fence_resets_between_attempts(monkeypatch):
    """The fence belongs to one attempt: a retry that happens BEFORE
    output is emitted proceeds normally, and the successful attempt may
    then stream freely."""
    monkeypatch.setenv("LSTM_CTC_TPU_BACKEND_RETRIES", "3")
    monkeypatch.setattr("time.sleep", lambda s: None)
    _stub_reset(monkeypatch)
    calls = []

    def fails_before_output_then_streams():
        calls.append(1)
        if len(calls) == 1:
            raise FakeJaxRuntimeError("FAILED_PRECONDITION: chip busy")
        note_output_emitted()
        return "done"

    assert run_with_backend_retry(
        fails_before_output_then_streams, what="test") == "done"
    assert len(calls) == 2
