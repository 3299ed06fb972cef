"""Int8-vs-bf16 conv/matmul probe for the attached TPU.

Establishes whether XLA lowers s8xs8->s32 convolutions onto the MXU's 2x
int8 rate (v5e: 394 vs 197 TOPS) — the premise of the serving quantization
path (models/quant.py). Chained-token timing (PERF.md rule 8: block_until_
ready may not wait through the axon tunnel).

Usage: python tools/probe_int8.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def probe_conv(name, dtype, acc, batch=32, n=12):
    x = jnp.ones((batch, 80, 80, 256), dtype)
    k = jnp.ones((3, 3, 256, 256), dtype)

    def f(x, t):
        y = lax.conv_general_dilated(
            x + t.astype(dtype), k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc,
        )
        return y, y.reshape(-1)[0].astype(jnp.float32)

    jf = jax.jit(f)
    tok = jnp.zeros((), jnp.float32)
    y, tok = jf(x, tok)
    float(tok)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(n):
        y, tok = jf(x, tok * 0)
    float(tok)
    dt = (time.perf_counter() - t0) / n
    flops = 2 * batch * 80 * 80 * 256 * 256 * 9
    print(f"{name}: {dt * 1000:.2f} ms/conv  {flops / dt / 1e12:.1f} TOP/s",
          flush=True)
    return flops / dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print("devices:", jax.devices(), flush=True)
    bf = probe_conv("bf16 conv", jnp.bfloat16, jnp.float32, batch)
    try:
        i8 = probe_conv("int8 conv", jnp.int8, jnp.int32, batch)
        print(f"int8/bf16 conv speedup: {i8 / bf:.2f}x", flush=True)
    except Exception as e:
        print("int8 conv FAILED:", str(e)[:400], flush=True)


if __name__ == "__main__":
    main()
