"""On-chip microbenchmarks: conv formulations + GroupNorm cost.

Per-call dispatch overhead on this backend is ~28 ms, so each candidate op is
iterated REPS times inside one jitted lax.scan; cost = (t_reps - t_1)/(reps-1).

Run on the real chip: python tools/probe_conv.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

REPS = 32


def scan_timeit(op, args, reps=REPS, n=3):
    """Time op(*args) iterated `reps` times in one program (carry-chained)."""

    def make(r):
        def body(c, _):
            out = op(c, *args[1:])
            # keep carry shape: fold output back to the carry's shape/dtype
            c2 = (c + out.astype(c.dtype)[..., : c.shape[-1]] * 1e-6) if out.shape == c.shape else c * 1.000001
            return c2, None

        def fn(x0):
            c, _ = lax.scan(body, x0, None, length=r)
            return jnp.sum(c)

        return jax.jit(fn)

    f1, fr = make(1), make(reps)
    ts = {}
    for name, f in [("one", f1), ("reps", fr)]:
        float(np.asarray(f(args[0])))
        best = min(
            (lambda t0: (float(np.asarray(f(args[0]))), time.perf_counter() - t0))(
                time.perf_counter()
            )[1]
            for _ in range(n)
        )
        ts[name] = best
    return (ts["reps"] - ts["one"]) / (reps - 1)


def im2col_concat(x, w, b):
    n, h, wdt, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = [
        lax.slice(xp, (0, dy, dx, 0), (n, dy + h, dx + wdt, cin))
        for dy in range(3)
        for dx in range(3)
    ]
    lhs = jnp.concatenate(patches, axis=-1)
    out = jnp.einsum("nhwk,ko->nhwo", lhs, w.reshape(9 * cin, cout).astype(x.dtype))
    return out + b.astype(out.dtype)


def tap_accum(x, w, b):
    n, h, wdt, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = lax.slice(xp, (0, dy, dx, 0), (n, dy + h, dx + wdt, cin))
            part = jnp.einsum("nhwc,co->nhwo", sl, w[dy, dx].astype(x.dtype))
            acc = part if acc is None else acc + part
    return acc + b.astype(acc.dtype)


def group_norm(x, scale, bias, g=32, eps=1e-5):
    n, h, w, c = x.shape
    x32 = x.astype(jnp.float32)
    xg = x32.reshape(n, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    return (xg.reshape(n, h, w, c) * scale + bias).astype(x.dtype)


def group_norm_onepass(x, scale, bias, g=32, eps=1e-5):
    """One-read stats via E[x^2]-E[x]^2 (fp32 accumulate)."""
    n, h, w, c = x.shape
    x32 = x.astype(jnp.float32)
    xg = x32.reshape(n, h, w, g, c // g)
    s1 = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    s2 = jnp.mean(jnp.square(xg), axis=(1, 2, 4), keepdims=True)
    var = s2 - jnp.square(s1)
    xg = (xg - s1) * lax.rsqrt(var + eps)
    return (xg.reshape(n, h, w, c) * scale + bias).astype(x.dtype)


def gn_silu(x, scale, bias):
    y = group_norm(x, scale, bias)
    return y * jax.nn.sigmoid(y)


def main():
    print("device:", jax.devices()[0], "reps:", REPS)
    key = jax.random.PRNGKey(0)
    for (B, S, C) in [(8, 128, 256), (8, 64, 512), (8, 32, 512)]:
        x = jax.random.normal(key, (B, S, S, C), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, C, C), jnp.float32) * 0.02
        b = jnp.zeros((C,), jnp.float32)
        fl = 2 * 9 * C * C * S * S * B
        for name, op, args in [
            ("concat", im2col_concat, (x, w, b)),
            ("tap_accum", tap_accum, (x, w, b)),
        ]:
            t = scan_timeit(op, args)
            print(f"B{B} {S}x{S}x{C} {name:12s}: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TF/s")
        sc = jnp.ones((C,), jnp.float32)
        bi = jnp.zeros((C,), jnp.float32)
        gb = (B * S * S * C * 2 * 2) / 1e9
        for name, op in [
            ("groupnorm", group_norm),
            ("gn_onepass", group_norm_onepass),
            ("gn+silu", gn_silu),
        ]:
            t = scan_timeit(op, (x, sc, bi))
            print(f"B{B} {S}x{S}x{C} {name:12s}: {t*1e3:7.2f} ms  {gb/t:6.1f} GB/s eff")


if __name__ == "__main__":
    main()
