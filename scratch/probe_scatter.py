import time, jax, jax.numpy as jnp, numpy as np

def chain(f, x0, n=6, label=""):
    x = x0
    for _ in range(2): x, out = f(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): x, out = f(x)
    jax.block_until_ready(out)
    print(f"{label}: {(time.perf_counter()-t0)/n*1e3:8.1f} ms", flush=True)

T = 6_800_000
N = 16_800_000 // 4  # per-op rows when split 4 ways... use 4.2M here
vals = jax.random.normal(jax.random.PRNGKey(0), (N, 4))

@jax.jit
def scat(idx):
    tab = jnp.zeros((T, 4)).at[idx].add(vals)
    return (idx * 7 + 1) % T, jnp.sum(tab) 
idx0 = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)
chain(scat, idx0, label=f"scatter-add {N/1e6:.1f}M into [6.8M,4]")

@jax.jit
def srt(idx):
    sk, sv = jax.lax.sort_key_val(idx, vals[:, 0])
    return (idx * 7 + 1) % T, jnp.sum(sv) + sk[0]
chain(srt, idx0, label=f"sort_key_val {N/1e6:.1f}M")

@jax.jit
def scat_sorted(idx):
    sidx = jnp.sort(idx)
    tab = jnp.zeros((T, 4)).at[sidx].add(vals, indices_are_sorted=True)
    return (idx * 7 + 1) % T, jnp.sum(tab)
chain(scat_sorted, idx0, label=f"sort+sorted-scatter {N/1e6:.1f}M")

# segment-sum formulation: sort, then diff-based dedup + unique scatter
@jax.jit
def seg(idx):
    sk, sv = jax.lax.sort_key_val(idx, vals[:, 0])
    csum = jnp.cumsum(sv)
    is_last = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
    seg_tot = jnp.where(is_last, csum, 0.0)
    # subtract previous segment's cumsum: gather of shifted positions
    tab = jnp.zeros((T,)).at[jnp.where(is_last, sk, T)].add(seg_tot, mode="drop",
                                                            indices_are_sorted=True)
    return (idx * 7 + 1) % T, jnp.sum(tab)
chain(seg, idx0, label=f"sort+cumsum+unique-scatter {N/1e6:.1f}M (1ch)")
