"""Kernel tuning sweep for the hat-matmul deform-attn Pallas kernel (level-0 encoder scale)."""
import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
rng = np.random.default_rng(0)
def sync(x): return np.asarray(x.ravel()[:1])
def make(h, w, D, P, Qt, ew_bf16=True):
    def kernel(g_ref, v_ref, comb_ref, o_ref):
        g = g_ref[0]
        gy = g[:P]; gx = g[P:2*P]; aw = g[2*P:3*P]
        iy = jax.lax.broadcasted_iota(jnp.int32, (P, Qt, h), 2).astype(jnp.float32)
        hat_y = jnp.maximum(0., 1.-jnp.abs(iy-gy[...,None]))*aw[...,None]
        hat_y = hat_y.reshape(P*Qt, h)
        ix = jax.lax.broadcasted_iota(jnp.int32, (P, Qt, w), 2).astype(jnp.float32)
        hat_x = jnp.maximum(0., 1.-jnp.abs(ix-gx[...,None])).reshape(P*Qt, w)
        s = jnp.dot(hat_y.astype(jnp.bfloat16), v_ref[0].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        if ew_bf16:
            t = s.astype(jnp.bfloat16) * pltpu.repeat(hat_x.astype(jnp.bfloat16), D, axis=1)
        else:
            t = (s * pltpu.repeat(hat_x, D, axis=1)).astype(jnp.bfloat16)
        outp = jnp.dot(t, comb_ref[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        o_ref[0] = outp.reshape(P, Qt, D).sum(axis=0)
    return kernel
def run_level(BH, Q, h, w, D, P, Qt, vmem=None, ew_bf16=True, tag=""):
    try:
        comb = (jax.lax.broadcasted_iota(jnp.int32,(D*w,D),0)//w == jax.lax.broadcasted_iota(jnp.int32,(D*w,D),1)).astype(jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((BH,h,D*w)).astype(np.float32))
        g = jnp.asarray(rng.uniform(0,20,(BH,3*P,Q)).astype(np.float32))
        cp = dict(dimension_semantics=("parallel","parallel"))
        if vmem: cp["vmem_limit_bytes"]=vmem
        f = pl.pallas_call(make(h,w,D,P,Qt,ew_bf16),
            out_shape=jax.ShapeDtypeStruct((BH,Q,D), jnp.float32),
            grid=(BH, Q//Qt),
            in_specs=[pl.BlockSpec((1,3*P,Qt), lambda b,q:(b,0,q), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1,h,D*w), lambda b,q:(b,0,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((D*w,D), lambda b,q:(0,0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1,Qt,D), lambda b,q:(b,q,0), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(**cp),
        )
        fj = jax.jit(lambda v,g: f(g,v,comb))
        o = fj(v,g); sync(o)
        t0=time.perf_counter()
        for i in range(3): sync(fj(v+0.001*i, g))
        dt=(time.perf_counter()-t0)/3
        fl = 2*BH*Q*P*(h+D)*w*D
        print(f"{tag} Qt={Qt} ew_bf16={ew_bf16} vmem={vmem}: {dt*1000:.1f}ms  {fl/dt/1e12:.2f} TFLOPs", flush=True)
    except Exception as e:
        print(f"{tag} Qt={Qt} FAIL: {str(e)[:160]}", flush=True)

run_level(80, 5120, 48, 80, 32, 4, 256, ew_bf16=True, tag="L0")
run_level(80, 5120, 48, 80, 32, 4, 512, vmem=100*1024*1024, ew_bf16=True, tag="L0")
run_level(80, 5120, 48, 80, 32, 4, 1024, vmem=120*1024*1024, ew_bf16=True, tag="L0")
run_level(80, 5120, 48, 80, 32, 4, 512, vmem=100*1024*1024, ew_bf16=False, tag="L0f32ew")
# all 4 levels at Qt=512
for (h,w) in [(24,40),(12,20),(6,10)]:
    run_level(80, 5120, h, w, 32, 4, 512, vmem=100*1024*1024, tag=f"L{h}x{w}")
