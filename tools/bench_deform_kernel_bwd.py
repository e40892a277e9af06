#!/usr/bin/env python
"""Micro-bench: Pallas deform-attn forward vs backward at encoder train scale
(BT=8, 512x800 pyramid), timed as a fori_loop inside ONE jit (per the repo's
axon rules: per-call dispatch round-trips lie)."""
import json, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import jax, jax.numpy as jnp
    from mdqe_cvpr2023_tpu.utils.compile_cache import enable as enable_cache
    from mdqe_cvpr2023_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas
    enable_cache()
    Hp, Wp = 512, 800
    shapes = tuple((max(Hp >> (3+l), 1), max(Wp >> (3+l), 1)) for l in range(4))
    S = sum(h*w for h, w in shapes)
    B, M, D, P = 8, 8, 32, 4
    Q = S
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0.05, 0.95, (B, Q, M, 4, P, 2)), jnp.float32)
    att = jax.nn.softmax(jnp.asarray(rng.standard_normal((B, Q, M, 4*P)), jnp.float32)
                         ).reshape(B, Q, M, 4, P)
    K = int(os.environ.get("KITER", 8))

    def op(v, l, a):
        return ms_deform_attn_pallas(v, shapes, l, a)

    @jax.jit
    def fwd_loop(value, loc, att):
        def body(i, acc):
            o = op(value + i * 1e-8, loc, att)
            return acc + o[0, 0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    gfn = jax.grad(lambda v, l, a: op(v, l, a).sum(), argnums=(0, 1, 2))

    @jax.jit
    def bwd_loop(value, loc, att):
        def body(i, acc):
            dv, dl, da = gfn(value + i * 1e-8, loc, att)
            return acc + dv[0, 0, 0, 0] + dl[0, 0, 0, 0, 0, 0] + da[0, 0, 0, 0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    def timeit(fn):
        np.asarray(fn(value, loc, att))
        t0 = time.perf_counter()
        np.asarray(fn(value + 1e-8, loc, att))
        return (time.perf_counter() - t0) / K

    tf = timeit(fwd_loop)
    tb = timeit(bwd_loop)
    print(json.dumps({"fwd_s": round(tf, 4), "bwd_s": round(tb, 4),
                      "bwd_minus_fwd": round(tb - tf, 4),
                      "bwd_over_fwd": round(tb / tf, 2),
                      "tokens": S, "B": B, "K": K}))

if __name__ == "__main__":
    main()
