"""Int8-vs-bf16 conv/matmul probe for the attached TPU.

Establishes whether XLA lowers s8xs8->s32 convolutions and matmuls onto
the MXU's 2x int8 rate (v5e: 394 vs 197 TOPS) — the premise of the serving
quantization path (models/quant.py). Chained-token timing with the token
folded INSIDE the jitted program (PERF.md rules 2+8: an eager op per
iteration costs a tunnel round-trip and dominated this probe's first
version — bf16 conv read 4.9 TOP/s; block_until_ready may not wait
through the axon tunnel, so the final sync is a host float()).

Usage: python tools/probe_int8.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def _time_chained(jf, x, n):
    """Run y,tok = jf(x, tok) n times, syncing only at the ends."""
    tok = jnp.zeros((), jnp.float32)
    _, tok = jf(x, tok)
    float(tok)  # compile + settle
    tok = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(n):
        _, tok = jf(x, tok)
    float(tok)
    return (time.perf_counter() - t0) / n


def probe_conv(name, dtype, acc, batch=32, n=30):
    x = jnp.ones((batch, 80, 80, 256), dtype)
    k = jnp.ones((3, 3, 256, 256), dtype)

    def f(x, t):
        # fold the token in via a scalar add on one element — zero-work
        # dependency chain, no eager ops between iterations
        xt = x.at[(0,) * x.ndim].add(t.astype(dtype))
        y = lax.conv_general_dilated(
            xt, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc,
        )
        return y, y.reshape(-1)[0].astype(jnp.float32) * 1e-30

    dt = _time_chained(jax.jit(f), x, n)
    flops = 2 * batch * 80 * 80 * 256 * 256 * 9
    print(f"{name}: {dt * 1000:.2f} ms/conv  {flops / dt / 1e12:.1f} TOP/s",
          flush=True)
    return flops / dt


def probe_matmul(name, dtype, acc, m=8192, n=30):
    a = jnp.ones((m, m), dtype)

    def f(a, t):
        at = a.at[0, 0].add(t.astype(dtype))
        y = jnp.matmul(at, a, preferred_element_type=acc)
        return y, y[0, 0].astype(jnp.float32) * 1e-30

    dt = _time_chained(jax.jit(f), a, n)
    flops = 2 * m * m * m
    print(f"{name}: {dt * 1000:.2f} ms  {flops / dt / 1e12:.1f} TOP/s",
          flush=True)
    return flops / dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print("devices:", jax.devices(), flush=True)
    bf_mm = probe_matmul("bf16 matmul 8192^3", jnp.bfloat16, jnp.float32)
    try:
        i8_mm = probe_matmul("int8 matmul 8192^3", jnp.int8, jnp.int32)
        print(f"int8/bf16 matmul speedup: {i8_mm / bf_mm:.2f}x", flush=True)
    except Exception as e:
        print("int8 matmul FAILED:", str(e)[:400], flush=True)
    bf = probe_conv("bf16 conv", jnp.bfloat16, jnp.float32, batch)
    try:
        i8 = probe_conv("int8 conv", jnp.int8, jnp.int32, batch)
        print(f"int8/bf16 conv speedup: {i8 / bf:.2f}x", flush=True)
    except Exception as e:
        print("int8 conv FAILED:", str(e)[:400], flush=True)


if __name__ == "__main__":
    main()
