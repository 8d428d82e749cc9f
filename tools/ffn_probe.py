"""Localize the fused-FFN kernel's gap to MXU ideal (real chip).

The kernel measures 0.674 ms at [8192, 768]x3072 (tools/ffn_micro.py) vs a
0.41 ms MXU ideal for its two GEMMs — this probe attributes the ~0.26 ms
by timing ablated variants of the SAME pallas_call:

  gelu(erf)   the shipping kernel (fp32 rational-polynomial erf, one divide)
  gelu(tanh)  tanh-approx gelu (division-free; would change HF parity, so
              measurement-only — never shipped without a numerics decision)
  identity    activation removed — the remaining time is GEMMs + bias +
              LN + residual + dtype casts; (gelu - identity) is the pure
              VPU cost of the activation on the [R, 4D] intermediate
  dots-only   XLA twin of just the two GEMMs (the practical MXU floor at
              these shapes, cf. tools/matmul_sweep.py)

Ablation works by monkeypatching ``fused_ffn._gelu_exact_f32`` (the kernel
body resolves it at trace time); numerics of ablated variants are wrong by
construction — timing only.

Usage: python tools/ffn_probe.py   (env ITERS=, B=)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools._timing import iters_env, make_loop, make_timed

ITERS = iters_env(200)
B = int(os.environ.get("B", "16"))
T = 512
DTYPE = jnp.bfloat16


def main():
    from vibertgrid_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache()
    from vibertgrid_tpu.ops import fused_ffn as ff

    timed = make_timed(ITERS)
    loop = make_loop(ITERS)

    rng = np.random.default_rng(0)
    n, d, f = B * T, 768, 3072
    x = jnp.asarray(rng.standard_normal((n, d)) * 0.5, DTYPE)
    w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(f) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.02, jnp.float32)
    lng = jnp.ones((d,), jnp.float32)
    lnb = jnp.zeros((d,), jnp.float32)
    seed0 = jnp.zeros((), jnp.int32)

    def run_variant(name, act):
        orig = ff._gelu_exact_f32
        ff._gelu_exact_f32 = act
        try:
            def fwd(c, x):
                out = ff.fused_ffn(
                    x + c.astype(DTYPE) * 0, w1, b1, w2, b2, lng, lnb,
                    seed0, 1e-12, 0.0,
                )
                return jnp.mean(out.astype(jnp.float32)) + c * 0.5

            ms = timed(loop(fwd), x)
        finally:
            ff._gelu_exact_f32 = orig
        print(f"fused ffn [{name:10s}] {ms:8.3f} ms")
        return ms

    def gelu_tanh(v):
        c = np.float32(np.sqrt(2.0 / np.pi))
        return 0.5 * v * (1.0 + jnp.tanh(c * (v + 0.044715 * v * v * v)))

    t_gelu = run_variant("gelu(erf)", ff._gelu_exact_f32)
    t_tanh = run_variant("gelu(tanh)", gelu_tanh)
    t_id = run_variant("identity", lambda v: v)

    # XLA dots-only floor (bf16 in, fp32 accum, cast back)
    w1d, w2d = w1.astype(DTYPE), w2.astype(DTYPE)

    def dots(c, x):
        h = jnp.dot(x + c.astype(DTYPE) * 0, w1d,
                    preferred_element_type=jnp.float32).astype(DTYPE)
        o = jnp.dot(h, w2d, preferred_element_type=jnp.float32)
        return jnp.mean(o) + c * 0.5

    t_dots = timed(loop(dots), x)
    print(f"xla dots-only           {t_dots:8.3f} ms")

    gf = 2 * 2 * n * d * f / 1e9
    print(f"\nGEMM GFLOP {gf:.1f}; MXU ideal {gf / 187:.3f} ms "
          f"(187 TF/s measured peak)")
    print(f"activation VPU share: gelu-identity = {t_gelu - t_id:.3f} ms "
          f"({(t_gelu - t_id) / t_gelu * 100:.0f}% of kernel)")
    print(f"tanh would save {t_gelu - t_tanh:.3f} ms")


if __name__ == "__main__":
    main()
