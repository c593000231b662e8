"""utils/profiling + eval/device_profile units (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from rdvc_tpu.utils.profiling import (
    compiled_cost,
    device_fence,
    mfu,
    time_device,
    time_transfer_down,
    time_transfer_up,
)


def test_time_device_and_fence():
    @jax.jit
    def f(x):
        return x @ x

    x = jnp.ones((64, 64), jnp.float32)
    t = time_device(lambda: f(x), iters=2)
    assert t >= 0.0
    assert np.isfinite(device_fence(f(x)))


def test_compiled_cost_reports_flops():
    @jax.jit
    def f(a, b):
        return a @ b

    a = jnp.ones((128, 128), jnp.float32)
    c = compiled_cost(f, a, a)
    # 128^3 * 2 = 4.2 MFLOP; cost model should be the right order
    assert c["flops"] > 1e6

    assert abs(mfu(197e12, 1.0) - 1.0) < 1e-9


def test_transfer_timers():
    x = np.ones((256, 256), np.float32)
    up = time_transfer_up(x, iters=1)
    assert up["mb_per_s"] > 0
    d = time_transfer_down(jax.device_put(x), iters=1)
    assert d["mb_per_s"] > 0


def test_wall_accounting_never_negative():
    """Transfers overlap compute, so the serialized estimate can exceed
    wall; the excess must land in overlap_s, never a negative other_s."""
    from rdvc_tpu.eval.device_profile import wall_accounting

    profile = {
        "uplink_mb_per_s": 35.0,
        "downlink_mb_per_s": 11.3,
        "encode_device_ms_per_frame": 70.0,
        "decode_device_ms_per_frame": 70.0,
    }
    # decode wall (16.75 s) < device + download -> overlap case
    acc = wall_accounting(profile, 64, 21.05, 16.75, 1080, 1920)
    for side in ("encode", "decode"):
        a = acc[side]
        assert a["other_s"] >= 0.0 and a["overlap_s"] >= 0.0
        # exactly one of other/overlap is nonzero, and the table adds up
        parts = a["device_compute_s"] + (
            a.get("upload_s", 0.0) + a.get("download_s", 0.0)
        )
        np.testing.assert_allclose(
            a["wall_s"], parts + a["other_s"] - a["overlap_s"], atol=0.05
        )
    assert acc["decode"]["overlap_s"] > 0.0
    assert acc["encode"]["other_s"] > 0.0
