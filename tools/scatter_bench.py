"""Micro-bench: dense BEV grid construction variants on the real TPU.

The r2 profile showed the VFE's sorted scatter-add into bf16[4147200,32]
costing 39.5 ms/step at ~0.25 GB/s — XLA assigns the 2D scatter result a
dim0-minor layout {0,1}, so each 32-wide row update strides across
4.1M-element channel planes. Variants:

  flat2d   current: sorted scatter-add into (H*W, C)
  grid3d   sorted scatter-add into (H, W, C) via 2D coords
  invgath  scalar s32 scatter of compact-row ids + wide row gather
           (scatter bytes shrink 16x; the wide write becomes a gather)

Each variant runs inside a BENCH_SCAN-style in-device loop with the input
perturbed by the carry so XLA cannot hoist it (CLAUDE.md trap (a)), and is
hard-synced by host readback.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_tpu_cache python tools/scatter_bench.py [n_points] [grid]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 320_000
G = int(sys.argv[2]) if len(sys.argv) > 2 else 1440
C = 32
CAP = N  # compact table capacity for invgath
SCAN = 8


def make_inputs(key):
    ky, kf = jax.random.split(key)
    ids = jax.random.randint(ky, (N,), 0, G * G, jnp.int32)
    feats = jax.random.normal(kf, (N, C), jnp.bfloat16)
    return ids, feats


def flat2d(ids, feats):
    order = jnp.argsort(ids)
    out = jnp.zeros((G * G, C), feats.dtype).at[ids[order]].add(
        feats[order], mode="drop", indices_are_sorted=True)
    return out.reshape(G, G, C)


def grid3d(ids, feats):
    order = jnp.argsort(ids)
    ids_s = ids[order]
    y, x = ids_s // G, ids_s % G
    out = jnp.zeros((G, G, C), feats.dtype).at[y, x].add(
        feats[order], mode="drop", indices_are_sorted=True)
    return out


def invgath(ids, feats):
    # compact reduce: points sorted by id; row r of the table accumulates
    # the r-th point's feature under segment-id = rank of first point with
    # this id — approximated here by scattering into CAP rows keyed by the
    # point's sorted position of its segment start.
    order = jnp.argsort(ids)
    ids_s = ids[order]
    feats_s = feats[order]
    starts = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
    seg = jnp.cumsum(starts) - 1  # compact segment index per point (sorted)
    table = jnp.zeros((CAP, C), feats.dtype).at[seg].add(
        feats_s, mode="drop", indices_are_sorted=True)
    # inverse index: dense cell -> compact row (or CAP = zero row)
    inv = jnp.full((G * G + 1,), CAP, jnp.int32).at[ids_s].set(
        seg.astype(jnp.int32), mode="drop", indices_are_sorted=True)
    table_z = jnp.concatenate([table, jnp.zeros((1, C), feats.dtype)], 0)
    out = table_z.at[inv[:-1]].get(mode="clip")
    return out.reshape(G, G, C)


def bench(name, fn):
    ids, feats = make_inputs(jax.random.PRNGKey(0))

    def multi(ids, feats):
        def body(carry, _):
            out = fn(ids + carry, feats)
            s = out.sum(dtype=jnp.float32)
            return (s.astype(jnp.int32) & 0), s
        _, sums = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=SCAN)
        return sums

    j = jax.jit(multi)
    _ = float(np.asarray(j(ids, feats)).sum())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(np.asarray(j(ids, feats)).sum())
        ts.append(time.perf_counter() - t0)
    ms = np.median(ts) * 1e3 / SCAN
    print(f"{name:8s} {ms:8.2f} ms/iter")


def main1():
    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
    for name, fn in [("flat2d", flat2d), ("grid3d", grid3d), ("invgath", invgath)]:
        bench(name, fn)


# ---- appended variants (r2: in-model densify gather ran at 8 GB/s while
# isolated invgath hit 100+; hypothesis: the consumer's space-to-depth
# transpose fuses into the gather. Also width-3 f32 cluster-mean scatters.)

def _invgath_core(ids, feats):
    order = jnp.argsort(ids)
    ids_s = ids[order]
    feats_s = feats[order]
    starts = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
    seg = jnp.cumsum(starts) - 1
    table = jnp.zeros((CAP, C), feats.dtype).at[seg].add(
        feats_s, mode="drop", indices_are_sorted=True)
    inv = jnp.full((G * G,), CAP, jnp.int32).at[ids_s].set(
        seg.astype(jnp.int32), mode="drop", indices_are_sorted=True)
    table_z = jnp.concatenate([table, jnp.zeros((1, C), feats.dtype)], 0)
    return table_z, inv


def invgath_s2d(ids, feats):
    """invgath + the S2D backbone's space-to-depth consumer."""
    table_z, inv = _invgath_core(ids, feats)
    out = table_z.at[inv].get(mode="clip").reshape(1, G, G, C)
    b, h, w, c = out.shape
    out = out.reshape(b, h // 2, 2, w // 2, 2, c)
    out = out.transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(b, h // 2, w // 2, 4 * c)


def invgath_packed(ids, feats):
    """gather directly in packed S2D order (inv permuted, output contiguous)."""
    table_z, inv = _invgath_core(ids, feats)
    inv_p = inv.reshape(G // 2, 2, G // 2, 2).transpose(0, 2, 1, 3).reshape(
        G // 2, G // 2, 4)
    rows = table_z.at[inv_p].get(mode="clip")  # (G/2, G/2, 4, C)
    return rows.reshape(1, G // 2, G // 2, 4 * C)


def mean3(ids, feats):
    """current _slot_mean shape: width-3 f32 scatter + count + gather-back."""
    order = jnp.argsort(ids)
    ids_s = ids[order]
    xyz = feats[order][:, :3].astype(jnp.float32)
    starts = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
    seg = jnp.cumsum(starts) - 1
    s = jnp.zeros((CAP, 3), jnp.float32).at[seg].add(
        xyz, mode="drop", indices_are_sorted=True)
    n = jnp.zeros((CAP,), jnp.float32).at[seg].add(
        1.0, mode="drop", indices_are_sorted=True)
    m = s / jnp.clip(n, 1.0)[..., None]
    return m.at[seg].get(mode="fill", fill_value=0, indices_are_sorted=True)


def mean4(ids, feats):
    """single fused width-4 scatter [x,y,z,1]."""
    order = jnp.argsort(ids)
    ids_s = ids[order]
    xyz1 = jnp.concatenate(
        [feats[order][:, :3].astype(jnp.float32),
         jnp.ones((N, 1), jnp.float32)], -1)
    starts = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
    seg = jnp.cumsum(starts) - 1
    s = jnp.zeros((CAP, 4), jnp.float32).at[seg].add(
        xyz1, mode="drop", indices_are_sorted=True)
    m = s[:, :3] / jnp.clip(s[:, 3:], 1.0)
    return m.at[seg].get(mode="fill", fill_value=0, indices_are_sorted=True)


def meanscan(ids, feats):
    """segment mean via prefix sums over the sorted stream (scatter-free
    except two scalar index scatters)."""
    order = jnp.argsort(ids)
    ids_s = ids[order]
    xyz = feats[order][:, :3].astype(jnp.float32)
    starts = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
    seg = (jnp.cumsum(starts) - 1).astype(jnp.int32)
    pref = jnp.cumsum(
        jnp.concatenate([jnp.zeros((1, 3), jnp.float32), xyz]), axis=0)  # (N+1,3)
    pos = jnp.arange(N, dtype=jnp.int32)
    seg_start = jnp.full((CAP,), N, jnp.int32).at[seg].min(
        pos, mode="drop", indices_are_sorted=True)
    seg_end = jnp.zeros((CAP,), jnp.int32).at[seg].max(
        pos + 1, mode="drop", indices_are_sorted=True)
    ssum = pref[seg_end] - pref[seg_start]
    cnt = (seg_end - seg_start).astype(jnp.float32)
    m = ssum / jnp.clip(cnt, 1.0)[:, None]
    return m.at[seg].get(mode="fill", fill_value=0, indices_are_sorted=True)


def main2():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
    for name, fn in [("invg_s2d", invgath_s2d), ("invg_pack", invgath_packed),
                     ("mean3", mean3), ("mean4", mean4), ("meanscan", meanscan)]:
        bench(name, fn)




# ---- in-model replica variants: the in-model stride-1 gather runs at
# 8 GB/s (140 ms/step) while the isolated invgath hit ~60 GB/s. Replicate
# the exact in-model conditions: B=4 flat table, ~6% occupancy, long
# sentinel runs; try the sorted-hint + cummax variant.

B4 = 4


def _flat_tables(ids, feats):
    """Build the flat (B*(cap+1), C) table + per-sample inv as in-model."""
    cap = N
    tabs, invs = [], []
    for b in range(B4):
        idb = jnp.sort((ids + b * 7919) % (G * G))  # distinct per sample
        seg = jnp.arange(N, dtype=jnp.int32)
        tab = feats + b  # (N, C) arbitrary
        inv = jnp.full((G * G,), cap, jnp.int32).at[idb].set(
            seg, mode="drop", indices_are_sorted=True)
        tabs.append(jnp.concatenate([tab, jnp.zeros((1, C), feats.dtype)]))
        invs.append(inv)
    return jnp.concatenate(tabs), jnp.stack(invs)  # (B*(N+1), C), (B, G*G)


def flat6(ids, feats):
    """exact in-model formulation (unsorted gather, sentinel holes)."""
    table, inv = _flat_tables(ids, feats)
    flat = inv + (jnp.arange(B4, dtype=jnp.int32)[:, None] * (N + 1))
    return table.at[flat.reshape(-1)].get(mode="clip").reshape(B4, G * G, C)


def flat6_sorted(ids, feats):
    """cummax hole-fill -> globally monotone indices + sorted-gather hint."""
    table, inv = _flat_tables(ids, feats)
    active = inv < N
    inv_ff = jnp.clip(jax.lax.cummax(jnp.where(active, inv, -1), axis=1), 0, N - 1)
    flat = inv_ff + (jnp.arange(B4, dtype=jnp.int32)[:, None] * (N + 1))
    rows = table.at[flat.reshape(-1)].get(
        mode="clip", indices_are_sorted=True).reshape(B4, G * G, C)
    return rows * active.reshape(B4, G * G, 1).astype(rows.dtype)


def main3():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
    for name, fn in [("flat6", flat6), ("flat6_sort", flat6_sorted)]:
        bench(name, fn)


if __name__ == "__main__":
    import os
    which = os.environ.get("SCATTER_BENCH", "2")
    if which in ("1", "all"):
        main1()
    if which in ("2", "all"):
        main2()
    if which in ("3", "all"):
        main3()
