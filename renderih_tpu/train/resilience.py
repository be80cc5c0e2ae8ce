"""Step-level failure recovery for the training loop.

Round-4 post-mortem (`runs/probe_albedo/train.log`): a transient axon
remote-compile failure (`HTTP 500: tpu_compile_helper ... SIGKILL`)
raised inside the first jitted step and killed an 18-minute setup with
nothing saved. The reference has no story here either — an exception in
`core/lijun_trainer.py:233-341` loses the run.

Two layers of defense:

  * transient infra errors (remote-compile service hiccups, connection
    resets) are retried with exponential backoff — compile-time failures
    happen BEFORE buffer donation, so the input state is intact and the
    retry is safe (guarded by an explicit liveness check anyway);
  * any other exception (or exhausted retries) saves a `crash`
    checkpoint via the same orbax path the SIGTERM handler uses — IF the
    state buffers survived — and re-raises. `--resume auto` picks the
    crash checkpoint up like any other.
"""

from __future__ import annotations

import logging
import os
import time

log = logging.getLogger("renderih_tpu.resilience")

# Substrings that mark an error as a transient infrastructure failure
# (worth retrying) rather than a bug in the program. Sourced from
# observed axon/PJRT failure modes.
TRANSIENT_MARKERS = (
    "remote_compile",        # axon compile-helper proxy
    "tpu_compile_helper",    # its subprocess (SIGKILL under memory pressure)
    "HTTP 500",
    "HTTP 502",
    "HTTP 503",
    "DEADLINE_EXCEEDED",
    "UNAVAILABLE",
    "Connection reset",
    "Socket closed",
)


def is_transient(err: BaseException) -> bool:
    msg = f"{type(err).__name__}: {err}"
    return any(m in msg for m in TRANSIENT_MARKERS)


def state_alive(state) -> bool:
    """True when no device buffer in `state` has been deleted/donated."""
    import jax

    for leaf in jax.tree_util.tree_leaves(state):
        deleted = getattr(leaf, "is_deleted", None)
        if callable(deleted) and deleted():
            return False
    return True


def run_step_guarded(
    step_thunk,
    state,
    checkpoint_dir: str,
    *,
    retries: int = 3,
    backoff_s: float = 10.0,
    save_fn=None,
    sleep=time.sleep,
):
    """Execute `step_thunk()` with transient-failure retry + crash save.

    `step_thunk` is a zero-arg callable running one training step on
    `state` (closed over; passed separately only for liveness checks and
    the crash save). Returns the thunk's result. Raises the original
    error after saving a `crash` checkpoint when recovery is impossible.
    """
    if save_fn is None:
        from renderih_tpu.train.state import save_checkpoint as save_fn

    attempt = 0
    while True:
        try:
            return step_thunk()
        except Exception as err:  # noqa: BLE001 — classified below
            transient = is_transient(err)
            alive = state_alive(state)
            if transient and alive and attempt < retries:
                attempt += 1
                wait = backoff_s * (2 ** (attempt - 1))
                log.warning(
                    "transient step failure (attempt %d/%d, retry in %.0fs):"
                    " %s", attempt, retries, wait, err)
                sleep(wait)
                continue
            if alive:
                path = os.path.abspath(
                    os.path.join(checkpoint_dir, "crash"))
                try:
                    save_fn(path, state)
                    log.error("saved crash checkpoint %s (resume with "
                              "--resume auto)", path)
                except Exception as save_err:  # pragma: no cover
                    log.error("crash checkpoint failed: %s", save_err)
            else:
                log.error("state buffers were donated/deleted by the "
                          "failing step; no crash checkpoint possible")
            raise
