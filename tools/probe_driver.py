#!/usr/bin/env python
"""Run several training probes in ONE process.

On this container every fresh jax client pays a 10-25 min backend-init
tax (ghost-session queueing behind the axon tunnel). The train CLI is a
plain function (`main(argv)`), so sequential probes can share one
initialized backend: each entry runs to completion (exceptions logged,
driver continues), then the next starts — no re-init between them.

  python tools/probe_driver.py run1.json
  # run1.json: [{"args": ["--cfg", "configs/probe_combo.yaml", ...]}, ...]

or edit RUNS below and run with no argument.
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

RUNS = [
    {"args": ["--cfg", "configs/probe_combo.yaml", "--synthetic",
              "--synth_n", "2048", "--synth_eval_n", "256",
              "--synth_render", "--steps", "1500"]},
]


def main():
    runs = RUNS
    if len(sys.argv) > 1:
        runs = json.load(open(sys.argv[1]))

    from renderih_tpu.apps import train

    for i, spec in enumerate(runs):
        args = spec["args"]
        print(f"[probe_driver] run {i + 1}/{len(runs)}: {' '.join(args)}",
              flush=True)
        t0 = time.time()
        try:
            train.main(args)
            print(f"[probe_driver] run {i + 1} OK in {time.time()-t0:.0f}s",
                  flush=True)
        except SystemExit as e:  # argparse
            print(f"[probe_driver] run {i + 1} SystemExit {e}", flush=True)
        except Exception:
            logging.exception(f"[probe_driver] run {i + 1} FAILED "
                              f"after {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
