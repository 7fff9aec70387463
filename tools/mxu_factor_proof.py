"""Numpy proof of the 4-step matmul factorization of the engine NTT.

Claim: with coefficient j at (row r = j // 128, lane l = j % 128) and the
golden transform out = ntt_np.ntt (natural in, bitrev-13 out, twiddles
psi^bitrev), the map factors as

    Y[kr, l]  = sum_r x[128 r + l] * eta^(r * (2 kr + 1))        (rows)
    W[kr, l]  = D[kr, l] * Y[kr, l],  D[kr, l] = psi^((2 kr + 1) l)
    Z[kr, kl] = sum_l W[kr, l] * eta^(l * kl)                    (lanes)
    out[128 ir + il] = Z[rev6(ir), rev7(il)]

with eta = psi^128 (a primitive 128th root; negacyclic root for length 64
AND cyclic root for length 128).  Equivalently, baking the bitrevs into
the constant tables:

    out[p, ir, il] = sum_l T[il, l] * D'[ir, l] * (M @ x[p, :, l])[ir]

    M[ir, r] = eta^(r * (2 rev6(ir) + 1))
    D'[ir, l] = psi^((2 rev6(ir) + 1) * l)
    T[il, l] = eta^(l * rev7(il))

The inverse map factors the same way mirrored (lanes first), derived here
as well.  All mod q, exact.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

from aloha_tpu import ntt_np
from aloha_tpu.config import DEFAULT_CONFIG as CFG

n = CFG.n
R, L = n // 128, 128


def rev(x, bits):
    return ntt_np.bit_reverse(x, bits)


def tables(q, psi):
    eta = pow(psi, L, q)
    lr = R.bit_length() - 1
    ll = L.bit_length() - 1
    M = np.array(
        [[pow(eta, r * (2 * rev(ir, lr) + 1), q) for r in range(R)]
         for ir in range(R)], dtype=object)
    D = np.array(
        [[pow(psi, (2 * rev(ir, lr) + 1) * l, q) for l in range(L)]
         for ir in range(R)], dtype=object)
    T = np.array(
        [[pow(eta, l * rev(il, ll), q) for l in range(L)]
         for il in range(L)], dtype=object)
    return M, D, T


def fwd_factored(x, q, psi):
    M, D, T = tables(q, psi)
    X = x.reshape(R, L).astype(object)
    Y = (M @ X) % q
    W = (D * Y) % q
    Z = (W @ T.T) % q
    return Z.reshape(n).astype(np.uint64)


def inv_tables(q, psi):
    """Inverse: out = A^{-1} v.  A = P (I(x)T) D (M(x)I) with P the
    (ir,il) relabeling; A^{-1} = (M^{-1}(x)I) D^{-1} (I(x)T^{-1}) P^{-1}.
    M^{-1} = inverse negacyclic NTT64 (eta^{-1}, /64);
    T^{-1} = inverse cyclic DFT128 (eta^{-1}, /128).
    The reference INTT additionally folds in nothing else: ntt_np.intt is
    the exact inverse of ntt_np.ntt (tests pin roundtrip)."""
    eta = pow(psi, L, q)
    ieta = pow(eta, q - 2, q)
    ipsi = pow(psi, q - 2, q)
    iR = pow(R, q - 2, q)
    iL = pow(L, q - 2, q)
    lr = R.bit_length() - 1
    ll = L.bit_length() - 1
    # Minv[r, ir] = eta^{-r(2 rev6(ir)+1)} / R ; Dinv = psi^{-(2 rev6(ir)+1) l}
    Minv = np.array(
        [[pow(ieta, r * (2 * rev(ir, lr) + 1), q) * iR % q
          for ir in range(R)] for r in range(R)], dtype=object)
    Dinv = np.array(
        [[pow(ipsi, (2 * rev(ir, lr) + 1) * l, q) for l in range(L)]
         for ir in range(R)], dtype=object)
    Tinv = np.array(
        [[pow(ieta, rev(il, ll) * l, q) * iL % q for il in range(L)]
         for l in range(L)], dtype=object)
    return Minv, Dinv, Tinv


def inv_factored(v, q, psi):
    Minv, Dinv, Tinv = inv_tables(q, psi)
    Z = v.reshape(R, L).astype(object)   # Z[ir, il]
    W = (Z @ Tinv.T) % q                 # W[ir, l] = sum_il Z[ir,il] Tinv[l, il]
    Y = (Dinv * W) % q
    X = (Minv @ Y) % q
    return X.reshape(n).astype(np.uint64)


def main():
    rng = np.random.default_rng(0)
    for q, psi in zip(CFG.moduli, CFG.psi):
        x = rng.integers(0, q, size=n, dtype=np.uint64)
        want = ntt_np.ntt(x, q, psi)
        got = fwd_factored(x, q, psi)
        ok_f = np.array_equal(want, got)
        back = inv_factored(want, q, psi)
        ok_i = np.array_equal(back, x)
        print(f"q={q}: forward {'OK' if ok_f else 'MISMATCH'}, "
              f"inverse {'OK' if ok_i else 'MISMATCH'}")
        if not ok_f:
            bad = np.nonzero(want != got)[0][:8]
            print("  first diffs at", bad, want[bad], got[bad])
            return 1
        if not ok_i:
            return 1
    print("factorization proven for all moduli")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
