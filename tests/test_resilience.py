"""Step-level crash recovery (`renderih_tpu/train/resilience.py`).

Motivated by the round-4 `runs/probe_albedo` loss: a transient axon
remote-compile HTTP 500 raised inside the first fused step and the run
died with nothing saved. The reference trainer has no equivalent —
`core/lijun_trainer.py:233-341` loses the run on any exception.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.train.resilience import (
    is_transient,
    run_step_guarded,
    state_alive,
)


class FakeInfraError(RuntimeError):
    pass


TRANSIENT_MSG = ("INTERNAL: http://127.0.0.1:8093/remote_compile: "
                 "HTTP 500: tpu_compile_helper subprocess exit signal "
                 "SIGKILL (9)")


def test_is_transient_classification():
    assert is_transient(FakeInfraError(TRANSIENT_MSG))
    assert is_transient(FakeInfraError("UNAVAILABLE: Socket closed"))
    assert not is_transient(ValueError("shapes do not match"))
    assert not is_transient(FakeInfraError("HTTP 404: not found"))


def test_transient_error_retries_then_succeeds(tmp_path):
    state = {"w": jnp.ones((2,))}
    calls = {"n": 0}
    sleeps = []

    def thunk():
        calls["n"] += 1
        if calls["n"] < 3:
            raise FakeInfraError(TRANSIENT_MSG)
        return "ok"

    out = run_step_guarded(thunk, state, str(tmp_path), retries=3,
                           backoff_s=1.0, sleep=sleeps.append)
    assert out == "ok"
    assert calls["n"] == 3
    assert sleeps == [1.0, 2.0]  # exponential backoff
    assert not os.path.exists(tmp_path / "crash")


def test_fatal_error_saves_crash_checkpoint(tmp_path):
    state = {"w": jnp.arange(4.0)}
    saved = {}

    def save_fn(path, st):
        saved["path"] = path
        saved["state"] = jax.device_get(st)

    with pytest.raises(ValueError):
        run_step_guarded(lambda: (_ for _ in ()).throw(ValueError("bug")),
                         state, str(tmp_path), save_fn=save_fn,
                         sleep=lambda s: None)
    assert saved["path"].endswith("/crash")
    np.testing.assert_array_equal(saved["state"]["w"], np.arange(4.0))


def test_transient_error_exhausts_retries_then_saves(tmp_path):
    state = {"w": jnp.ones(())}
    saved = []
    with pytest.raises(FakeInfraError):
        run_step_guarded(
            lambda: (_ for _ in ()).throw(FakeInfraError(TRANSIENT_MSG)),
            state, str(tmp_path), retries=2, backoff_s=0.0,
            save_fn=lambda p, s: saved.append(p), sleep=lambda s: None)
    assert len(saved) == 1


def test_no_checkpoint_when_state_donated(tmp_path):
    x = jnp.ones((2,))
    donated = jax.jit(lambda a: a + 1, donate_argnums=0)(x)
    del donated
    assert not state_alive({"w": x})
    saved = []
    with pytest.raises(ValueError):
        run_step_guarded(lambda: (_ for _ in ()).throw(ValueError("bug")),
                         {"w": x}, str(tmp_path),
                         save_fn=lambda p, s: saved.append(p),
                         sleep=lambda s: None)
    assert saved == []  # donated state: no (corrupt) checkpoint written


def test_crash_checkpoint_real_roundtrip_and_auto_resume(tmp_path):
    """End-to-end: a real orbax crash save that `--resume auto` finds."""
    from renderih_tpu.train.state import latest_checkpoint

    state = {"w": jnp.arange(3.0), "step": jnp.asarray(7, jnp.int32)}
    with pytest.raises(ValueError):
        run_step_guarded(lambda: (_ for _ in ()).throw(ValueError("bug")),
                         state, str(tmp_path), sleep=lambda s: None)
    path = latest_checkpoint(str(tmp_path))
    assert path is not None and path.endswith("/crash")

    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(
        path, target=jax.device_get(state))
    assert int(restored["step"]) == 7
    np.testing.assert_array_equal(restored["w"], np.arange(3.0))
