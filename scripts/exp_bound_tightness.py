"""Offline tightness A/B: support-mask ms bound vs sqrt (AM-GM) bound.

Replicates the oracle V construction on clustered synthetic features and
counts, per row, how many pairs survive fd_lb <= thresh under each bound
vs the true count. Decides whether swapping the screen GEMM operands
(mask -> sqrt) is worth chip time.
"""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
from ssg_tpu.oracle.distance import pairwise_distance_np
from ssg_tpu.oracle.rerank import _k_reciprocal_neigh

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
rho = 1.6e-3
k1, k2, lam = 20, 6, 0.1
rng = np.random.default_rng(0)
ids = max(n // 12, 2)
centers = rng.normal(size=(ids, 256)).astype(np.float32)
assign = rng.integers(0, ids, size=n)
f = centers[assign] + 0.3 * rng.normal(size=(n, 256)).astype(np.float32)
f /= np.linalg.norm(f, axis=1, keepdims=True)

od = pairwise_distance_np(f, squared=True)
col_max = np.maximum(od.max(axis=0), 1e-12)
od = (od / col_max).T.astype(np.float32)
rank = np.argsort(od, kind="stable").astype(np.int32)

half = int(np.around(k1 / 2.0))
recip = [_k_reciprocal_neigh(rank, i, k1) for i in range(n)]
rhalf = [_k_reciprocal_neigh(rank, i, half) for i in range(n)]
V = np.zeros((n, n), dtype=np.float32)
for i in range(n):
    exp_ = recip[i]
    for cand in recip[i]:
        cs = rhalf[cand]
        if len(np.intersect1d(cs, recip[i])) > (2.0 / 3.0) * len(cs):
            exp_ = np.append(exp_, cs)
    exp_ = np.unique(exp_)
    w = np.exp(-od[i, exp_])
    V[i, exp_] = w / w.sum()
Vq = np.zeros_like(V)
for i in range(n):
    Vq[i] = V[rank[i, :k2]].mean(axis=0)
V = Vq

# true ms / fd (blocked to bound memory)
B = 512
ms = np.zeros((n, n), dtype=np.float32)
for r0 in range(0, n, B):
    ms[r0:r0 + B] = np.minimum(V[r0:r0 + B, None, :], V[None, :, :]).sum(-1)
jac = 1.0 - ms / (2.0 - ms)
fd = np.maximum(jac * (1 - lam) + od * lam, 0.0)

iu = np.triu_indices(n, 1)
tri = np.sort(fd[iu])
target = int(rho * len(tri))
eps = tri[target]
print(f"N={n} eps={eps:.4f} true pairs<=eps: {target} ({target/n:.1f}/row)")

mask = (V > 0).astype(np.float32)
sq = np.sqrt(V)
g_mask = mask @ V.T          # ms_ub mask bound (row i support . V_j)
g_sqrt = sq @ sq.T           # ms_ub AM-GM bound

for tag, g in [("mask", g_mask), ("sqrt", g_sqrt),
               ("min ", np.minimum(g_mask, g_sqrt)),
               ("symm", np.minimum(g_mask, g_mask.T))]:
    gc = np.minimum(g * (1 + 2.0**-8) + 1e-6, 1.8)
    jl = 1.0 - gc / (2.0 - gc)
    fl = np.maximum(jl * (1 - lam) + od * lam, 0.0)
    assert (fl <= fd + 1e-6).all(), tag  # soundness sanity
    for thr_tag, thr in [("eps", eps), ("eps*1.05", eps * 1.05)]:
        cand = (fl[iu] <= thr).sum()
        print(f"  {tag} bound @ {thr_tag:8s}: {cand:9d} pairs "
              f"({cand * 2 / n:7.1f}/row, {cand / max(target,1):5.2f}x true)")
