"""Layered-BP sweep-count vs layer-count L on real codes (NumPy oracle).

The round-2 review asked for a measured answer to "would a layered
schedule pay on the fused generic kernel?" (its 10k alist number was
25k frames/s; the hypothesis was up to 2x from halved sweeps). This
probe measures the actual sweep-count reduction as a function of layer
count L on the reference's own code family — L=1 is flooding; layers are
contiguous chunks of the check array (the generic kernel's natural
layers are its degree groups, so its realizable L is the number of check
degree classes: **2** for the 10k alist code).

Measured (NMSA alpha=0.70, QBER 0.03, exact-count channel, 256 frames,
cap 100, reference-shape alist 10k R=0.72 CW=4):

    L=1 (flooding): 14.52 mean sweeps
    L=2:            11.91  (1.22x)
    L=4:            10.63  (1.37x)
    L=8:             9.83  (1.48x)
    L=32:            9.39  (1.55x)

Conclusion (docs/KERNEL.md #layered-for-arbitrary-codes): the 2x the QC
kernel gets from its mb-row layering does NOT transfer to the generic
kernel — at its realizable L=2 the sweep saving is 1.22x, and even
unbounded L saturates near 1.55x at this operating point. Each layer
needs its own check<->bit regroup, and a sub-permutation of the
degree-grouped edge space still factors over the full [R,128] grid (the
destination set is scattered), so per-sweep permute cost is >= flooding's
— the expected net is <= 1.2x against a >= 1.6x bar. Measured negative;
the engine keeps the flooding schedule.
"""
import numpy as np, sys, time
from qkd_ldpc_v_tpu.models.hmatrix import read_sparse_matrix_alist

def run(matrix, qber, alpha, L, frames=256, cap=100, seed=0):
    n = matrix.num_bit_nodes
    rng = np.random.default_rng(seed)
    ne = int(n * qber)
    alice = rng.integers(0, 2, (frames, n), dtype=np.int8)
    bob = alice.copy()
    for f in range(frames):
        bob[f, rng.choice(n, ne, replace=False)] ^= 1
    log_p = np.log((1 - qber) / qber)
    llr = np.where(bob == 1, -log_p, log_p).astype(np.float32).T  # [n, F]

    checks = matrix.check_nodes  # list of arrays of bit idx
    M = len(checks)
    syn = np.zeros((M, frames), dtype=np.int8)
    for c, bits in enumerate(checks):
        syn[c] = alice[:, bits].sum(axis=1) % 2
    syn_sign = np.where(syn == 1, -1.0, 1.0).astype(np.float32)

    # group checks by degree within each layer chunk for vectorization
    bounds = np.linspace(0, M, L + 1).astype(int)
    layers = []
    for li in range(L):
        idx = np.arange(bounds[li], bounds[li + 1])
        by_deg = {}
        for c in idx:
            by_deg.setdefault(len(checks[c]), []).append(c)
        groups = []
        for d, cs in sorted(by_deg.items()):
            cs = np.array(cs)
            bits = np.stack([checks[c] for c in cs])  # [count, d]
            groups.append((cs, bits))
        layers.append(groups)

    T = llr.copy()  # [n, F]
    E = {}  # (layer, gi) -> [count, d, F]
    for li, groups in enumerate(layers):
        for gi, (cs, bits) in enumerate(groups):
            E[(li, gi)] = np.zeros((len(cs), bits.shape[1], frames), np.float32)

    conv = np.zeros(frames, bool)
    iters = np.full(frames, cap, np.int32)
    for it in range(cap):
        for li, groups in enumerate(layers):
            for gi, (cs, bits) in enumerate(groups):
                Eold = E[(li, gi)]
                msgs = T[bits] - Eold  # [count, d, F]
                a = np.abs(msgs)
                part = np.partition(a, 1, axis=1)
                min1 = part[:, 0:1]
                min2 = part[:, 1:2]
                eabs = np.where(a == min1, min2, min1)
                neg = (msgs < 0).sum(axis=1) % 2
                row_sign = syn_sign[cs] * np.where(neg == 0, 1.0, -1.0)
                excl = np.where(msgs > 0, 1.0, -1.0)
                val = alpha * row_sign[:, None, :] * excl * eabs
                delta = (val - Eold) * (~conv)[None, None, :]
                np.add.at(T, bits.ravel(),
                          delta.reshape(-1, frames))
                E[(li, gi)] = np.where(conv[None, None, :], Eold, val)
        dec = (T <= 0)
        bad = np.zeros(frames, bool)
        for li, groups in enumerate(layers):
            for gi, (cs, bits) in enumerate(groups):
                par = dec[bits].sum(axis=1) % 2
                bad |= (par != (syn[cs] == 1)).any(axis=0)
        ok = ~bad
        newly = ok & ~conv
        iters[newly] = it + 1
        conv |= ok
        if conv.all():
            break
    fer = 1 - conv.mean()
    return iters[conv].mean() if conv.any() else float('nan'), fer, conv.mean()

if __name__ == '__main__':
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "sparse_matrices/matrices_alist/(N=10240,M=2841,R=0.72,CW=4,SEED=66).mtrx"
    m = read_sparse_matrix_alist(path)
    for L in (1, 2, 3, 4, 8, 32):
        t0 = time.time()
        mean_it, fer, cr = run(m, 0.03, 0.70, L)
        print(f"L={L:3d}: mean sweeps {mean_it:6.2f}  FER {fer:.4f}  "
              f"({time.time()-t0:.0f}s)", flush=True)
