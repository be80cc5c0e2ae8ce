"""Benchmark: two-hand inference throughput (images/sec/chip).

Runs the flagship model (resnet50 encoder + dual-graph decoder, the
reference `load_graph_model` configuration) at the reference eval batch
size on one chip and prints a single JSON line.

The PyTorch baseline publishes no numbers (BASELINE.md) and this
container has no CUDA GPU, so `vs_baseline` is computed against the
measured torch-CPU proxy of the actual reference model
(tools/measure_baseline.py -> BASELINE_MEASURED.json; override with
BENCH_BASELINE_IPS). Falls back to 1.0 only when neither exists.
"""

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp

# Watchdog: if the axon TPU tunnel is down, the first device contact
# blocks forever in a futex (0 CPU) — fail loudly instead of hanging the
# driver. Disarmed as soon as the warmup forward completes; the limit is
# far above the observed worst-case cold compile (~10 min).
_WATCHDOG_S = int(os.environ.get("BENCH_WATCHDOG_S", "2400"))
_armed = threading.Event()


def _watchdog():
    if not _armed.wait(_WATCHDOG_S):
        print(f"bench.py: no TPU response within {_WATCHDOG_S}s - "
              "axon tunnel down? (probe: timeout 120 python -c "
              "'import jax; jax.devices()')", file=sys.stderr, flush=True)
        os._exit(17)

# Persistent compilation cache: first compile of the flagship graph takes
# minutes through the remote-compile tunnel; subsequent runs are instant.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.config import Config
    from renderih_tpu.models import init_model, model_call_kwargs
    from renderih_tpu.models.attention import set_fused_attention

    cfg = Config()  # flagship: resnet50, bf16 compute
    if os.environ.get("BENCH_DECODER_BF16"):  # A/B: bf16 decoder trunk
        cfg.model.decoder_f32 = False
    # Pallas fused attention: 1.44x over XLA on the isolated attention
    # shapes (tools/bench_attention.py) but SLOWER end-to-end (3755 vs
    # 5054 img/s at bs 256 — it blocks XLA fusion around the attention).
    # Opt-in only.
    if os.environ.get("BENCH_FUSED"):
        set_fused_attention(True)
    # Paired L/R decoder: both hands through one hand-stacked trunk
    # (identical math; see utils/pair_params.py). A/B knob.
    if os.environ.get("BENCH_PAIRED"):
        cfg.model.paired_lr = True
    # Pallas implicit-GEMM 3x3 encoder convs (kernels/conv_pallas.py);
    # BENCH_PALLAS_CONV=1 also works via the kernel module's own env knob.
    if os.environ.get("BENCH_PALLAS_CONV"):
        cfg.model.pallas_conv = True
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    call_kwargs = model_call_kwargs(cfg, assets)

    batch = int(os.environ.get("BENCH_BATCH", "256"))
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 256, 3),
                            jnp.float32)

    @jax.jit
    def forward(variables, img):
        out = model.apply(variables, img, train=False, **call_kwargs)
        return out.verts3d["left"], out.verts3d["right"]

    # warmup + compile; disarm the watchdog once the device answered
    jax.block_until_ready(forward(variables, img))
    _armed.set()

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        res = forward(variables, img)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    baseline = float(os.environ.get("BENCH_BASELINE_IPS", "0") or 0)
    if baseline <= 0:
        measured = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BASELINE_MEASURED.json")
        if os.path.exists(measured):
            with open(measured) as f:
                baseline = float(
                    json.load(f).get("torch_cpu_images_per_sec", 0))
    vs = ips / baseline if baseline > 0 else 1.0
    print(json.dumps({
        "metric": "two_hand_inference_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
