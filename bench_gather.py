"""Microbenchmark: which static-permutation formulation is fastest on TPU?

Candidates for y[s, j] = x[s, idx[s % 4, j]] with x (68, 6817) complex64,
idx (4, 6048) static — the extract/deinterleave pattern:
  a) take_along_axis on the lane (minor) axis
  b) transpose + row (major-axis) take + transpose
  c) one-hot bf16 matmul (MXU)
  d) flat 1D gather of the fully composed index
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp
import numpy as np

S, K, P = 68, 6817, 6048
rng = np.random.default_rng(0)
idx4 = np.stack([np.sort(rng.choice(K, size=P, replace=False))
                 for _ in range(4)]).astype(np.int32)
# complex64 host->device transfer is UNIMPLEMENTED on the axon tunnel (and
# poisons the stream for later transfers) — combine on device instead
_mk = jax.jit(lambda a, b: (a + 1j * b).astype(jnp.complex64))
x = _mk(jnp.asarray(rng.standard_normal((S, K)), jnp.float32),
        jnp.asarray(rng.standard_normal((S, K)), jnp.float32))

idx68 = np.tile(idx4, (17, 1))  # (68, P)

REPS = 20
_reduce = jax.jit(lambda a: jnp.sum(jnp.abs(a).astype(jnp.float32)))
def _fetch(o): return float(_reduce(o.ravel()[:8]))

trivial = jax.jit(lambda a: a + 1)
z = jnp.zeros((1,), jnp.int32)
_fetch(trivial(z))
t0 = time.time()
for _ in range(REPS): _fetch(trivial(z))
lat = (time.time() - t0) / REPS
print(f"latency {lat*1e3:.2f} ms", flush=True)

def bench(name, fn, *args):
    out = fn(*args); _fetch(out)
    t0 = time.time()
    for _ in range(REPS): out = fn(*args)
    _fetch(out)
    dt = (time.time() - t0 - lat) / REPS
    print(f"{name:24s} {dt*1e3:9.3f} ms", flush=True)
    return out

@jax.jit
def take_lane(x):
    ix = jnp.broadcast_to(jnp.asarray(idx68), (S, P))
    return jnp.take_along_axis(x, ix, axis=-1)

@jax.jit
def take_rows(x):
    xt = x.T  # (K, S)
    out = xt[jnp.asarray(idx68[0])]  # simple row take (per-phase would be 4x)
    return out.T

@jax.jit
def row_take_4phase(x):
    xr = x.reshape(17, 4, K).transpose(1, 2, 0)  # (4, K, 17)
    outs = [xr[p][jnp.asarray(idx4[p])] for p in range(4)]  # (4, P, 17)
    o = jnp.stack(outs).transpose(2, 0, 1).reshape(S, P)
    return o

W = np.zeros((4, K, P), np.float32)
for p in range(4):
    W[p, idx4[p], np.arange(P)] = 1.0
Wb = jnp.asarray(W, jnp.bfloat16)

@jax.jit
def onehot_mm(x):
    xr = x.reshape(17, 4, K)
    re = jnp.einsum("fpk,pkj->fpj", xr.real.astype(jnp.bfloat16), Wb,
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("fpk,pkj->fpj", xr.imag.astype(jnp.bfloat16), Wb,
                    preferred_element_type=jnp.float32)
    return (re + 1j * im).reshape(S, P).astype(jnp.complex64)

flat_idx = (np.arange(S)[:, None] * K + idx68).reshape(-1).astype(np.int32)

@jax.jit
def flat_gather(x):
    return x.reshape(-1)[jnp.asarray(flat_idx)].reshape(S, P)

@jax.jit
def fancy_shared(x):
    return x[:, jnp.asarray(idx4[0])]  # one shared row index (like bit_ilv)

@jax.jit
def fancy_phase(x):
    xr = x.reshape(17, 4, K)
    return jnp.stack([xr[:, p, jnp.asarray(idx4[p])] for p in range(4)],
                     axis=1).reshape(S, P)

cells = jnp.asarray(rng.integers(0, 64, (S, K)), jnp.int8)
Wi = jnp.asarray(W, jnp.int8)

@jax.jit
def onehot_mm_int8(c):
    cr = c.reshape(17, 4, K)
    return jnp.einsum("fpk,pkj->fpj", cr, Wi,
                      preferred_element_type=jnp.int32).reshape(S, P)

bench("fancy shared idx", fancy_shared, x)
bench("fancy per-phase idx", fancy_phase, x)
bench("onehot int8 (cells)", onehot_mm_int8, cells)
bench("take_along lane", take_lane, x)
bench("row take (1 phase)", take_rows, x)
bench("row take (4 phase)", row_take_4phase, x)
bench("one-hot bf16 matmul", onehot_mm, x)
bench("flat 1d gather", flat_gather, x)

# also: scatter variant used by TX frame adapt
@jax.jit
def scatter_set(d):
    out = jnp.zeros((S, K), jnp.complex64)
    rows = jnp.arange(S)[:, None]
    return out.at[rows, jnp.asarray(idx68)].set(d)

d = take_lane(x)
bench("scatter .at[].set", scatter_set, d)
print("done", flush=True)
