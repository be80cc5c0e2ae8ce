import time

import jax.numpy as jnp

from renderih_tpu.utils.profiling import AverageMeter, Timer, device_timer


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.val == 3.0 and m.count == 2
    m.update(5.0, n=2)
    assert m.count == 4 and m.avg == (1 + 3 + 10) / 4


def test_timer_skips_warmup():
    t = Timer(warm_up=1)
    with t.time():
        time.sleep(0.05)  # warm-up call, excluded from the average
    with t.time():
        time.sleep(0.01)
    assert t.calls == 2
    assert t.average_time < 0.04  # warm-up 50 ms excluded


def test_device_timer_blocks():
    holder = {}
    with device_timer(holder):
        holder["x"] = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    assert holder["seconds"] > 0
    assert float(holder["x"][0, 0]) == 64.0
