"""Reed-Solomon RS(204,188,T=8) encode/decode (T2 / R9 in SURVEY.md §2).

Reference behavior: `lib/reed_solomon_enc_impl.cc`, `lib/reed_solomon_dec_impl.cc`,
shared GF core `lib/reed_solomon.cc` [unverified — mount empty]; spec:
EN300744 §4.3.2 (shortened RS(255,239), p(x)=0x11D, g(x)=prod(x+a^i), i<16).

TPU-native design (NOT a translation of the byte-serial LFSR/BM C++):

* Encode: RS parity is GF(2)-linear in the message bits, so the whole encoder
  is one binary matmul on the MXU: ``parity = (msg_bits @ M) mod 2`` with the
  (1504, 128) matrix precomputed in tables.rs_encode_bitmatrix().  Batch of
  packets = batch dim of the matmul.
* Syndromes: same trick with a (1632, 128) matrix.
* Berlekamp-Massey: fixed 16-iteration masked form (data-dependent branches
  become jnp.where lane masks), batched over codewords — SURVEY.md §7 hard
  part 3.
* Chien + Forney: dense evaluation over all 204 positions via precomputed
  power tables and log/exp gathers.

GF(2^8) arithmetic on device uses int32 log/exp table gathers; the exp table
is doubled (512) so products of logs never need mod 255.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..utils import bits as bitutils

RS_N, RS_K, RS_T = tables.RS_N, tables.RS_K, tables.RS_T


def _mod2_matmul(x_bits: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """(..., n) {0,1} @ (n, k) {0,1} -> (..., k) {0,1} via MXU f32 matmul."""
    acc = jnp.dot(
        x_bits.astype(jnp.bfloat16),
        m,
        preferred_element_type=jnp.float32,
    )
    return (acc.astype(jnp.int32) & 1).astype(jnp.uint8)


def _device_tables():
    # numpy constants; converted per use site so no tracer is ever cached
    # (jnp constants are deduplicated by XLA during lowering anyway)
    exp_np, log_np = tables.gf_tables()
    return jnp.asarray(exp_np), jnp.asarray(log_np)  # created at trace time


def _gmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    exp, log = _device_tables()
    out = exp[log[a] + log[b]]
    return jnp.where((a == 0) | (b == 0), 0, out)


def _ginv(a: jnp.ndarray) -> jnp.ndarray:
    exp, log = _device_tables()
    return exp[(255 - log[a]) % 255]


def make_rs_encoder():
    """Returns encode(msg) : uint8 (..., P, 188) -> (..., P, 204)."""
    M = tables.rs_encode_bitmatrix()  # numpy

    def encode(msg: jnp.ndarray) -> jnp.ndarray:
        msg_bits = bitutils.bytes_to_bits(msg)
        parity = bitutils.bits_to_bytes(
            _mod2_matmul(msg_bits, jnp.asarray(M, jnp.bfloat16)))
        return jnp.concatenate([msg, parity], axis=-1)

    return jax.jit(encode)


# --- decoder ---------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _chien_power_tables():
    """Numpy power tables for dense Chien/Forney evaluation.

    Position i in the 204-byte packet corresponds to locator X_i = alpha^{203-i}.
      lam_pows[i, k]   = X_i^{-k}            (204, 9)   for Lambda(X^-1)
      omg_pows[i, k]   = X_i^{-k}            (204, 8)   for Omega(X^-1)
      dlam_pows[i, k]  = X_i^{-2k}           (204, 4)   for Lambda'(X^-1)
                         (odd-coeff formal derivative over GF(2))
      xk[i]            = X_i                  (204,)
    """
    exp, _ = tables.gf_tables()
    deg = 203 - np.arange(RS_N)
    lam = np.zeros((RS_N, RS_T + 1), dtype=np.int32)
    omg = np.zeros((RS_N, RS_T), dtype=np.int32)
    dlam = np.zeros((RS_N, 4), dtype=np.int32)
    for i in range(RS_N):
        d = int(deg[i])
        for k in range(RS_T + 1):
            lam[i, k] = exp[(-d * k) % 255]
        for k in range(RS_T):
            omg[i, k] = exp[(-d * k) % 255]
        for k in range(4):
            dlam[i, k] = exp[(-d * 2 * k) % 255]
    xk = np.array([exp[int(d) % 255] for d in deg], dtype=np.int32)
    return lam, omg, dlam, xk


def _berlekamp_massey(S: jnp.ndarray):
    """Batched fixed-iteration BM.  S: (..., 16) int32 -> Lambda (..., 9).

    Masked form of the textbook algorithm (16 iterations, no data-dependent
    control flow) so it jits to straight-line code.
    """
    batch = S.shape[:-1]
    C = jnp.zeros(batch + (RS_T + 1,), jnp.int32).at[..., 0].set(1)
    B = C
    L = jnp.zeros(batch, jnp.int32)
    m = jnp.ones(batch, jnp.int32)
    b = jnp.ones(batch, jnp.int32)

    ks = jnp.arange(RS_T + 1)

    def step(carry, n):
        C, B, L, m, b = carry
        # discrepancy d = xor_k C[k] * S[n-k]   (S index < 0 -> 0)
        sidx = n - ks
        svals = jnp.where(sidx >= 0, S[..., jnp.clip(sidx, 0)], 0)
        terms = _gmul(C, svals)
        d = terms[..., 0]
        for k in range(1, RS_T + 1):
            d = d ^ terms[..., k]
        # shifted scaled copy: (d/b) * x^m * B
        coef = _gmul(d, _ginv(b))
        bidx = jnp.broadcast_to(ks, B.shape) - m[..., None]
        Bs = jnp.where(
            bidx >= 0,
            jnp.take_along_axis(B, jnp.clip(bidx, 0), axis=-1),
            0,
        )
        adj = _gmul(coef[..., None], Bs)
        Cn = C ^ adj
        d_zero = d == 0
        grow = (~d_zero) & (2 * L <= n)
        C_out = jnp.where(d_zero[..., None], C, Cn)
        B_out = jnp.where(grow[..., None], C, B)
        L_out = jnp.where(grow, n + 1 - L, L)
        b_out = jnp.where(grow, d, b)
        m_out = jnp.where(grow, 1, m + 1)
        return (C_out, B_out, L_out, m_out, b_out), None

    (C, B, L, m, b), _ = jax.lax.scan(
        step, (C, B, L, m, b), jnp.arange(2 * RS_T)
    )
    return C, L


def make_rs_decoder():
    """Returns decode(cw) for uint8 (..., P, 204):

    -> (msg (..., P, 188) uint8,
        n_corrected (..., P) int32,
        uncorrectable (..., P) bool)

    Observability outputs mirror SURVEY.md §5.5 (per-block counters).
    """
    Msyn_np = tables.rs_syndrome_bitmatrix()
    lam_np, omg_np, dlam_np, xk_np = _chien_power_tables()

    def decode(cw: jnp.ndarray):
        Msyn = jnp.asarray(Msyn_np, jnp.bfloat16)
        lam_p, omg_p = jnp.asarray(lam_np), jnp.asarray(omg_np)
        dlam_p, xk = jnp.asarray(dlam_np), jnp.asarray(xk_np)
        cw_bits = bitutils.bytes_to_bits(cw)
        syn_bytes = bitutils.bits_to_bytes(_mod2_matmul(cw_bits, Msyn))
        S = syn_bytes.astype(jnp.int32)  # (..., 16), S[0]=r(alpha^0)
        no_err = jnp.all(S == 0, axis=-1)

        Lam, L = _berlekamp_massey(S)  # (..., 9), (...,)

        # Omega = S(x) * Lambda(x) mod x^8  (deg Omega < L <= 8)
        def omega_coef(j):
            acc = jnp.zeros_like(L)
            for i in range(min(j, RS_T) + 1):
                acc = acc ^ _gmul(Lam[..., i], S[..., j - i])
            return acc

        Om = jnp.stack([omega_coef(j) for j in range(RS_T)], axis=-1)

        # Chien: Lambda(X_i^{-1}) over all 204 positions
        lam_eval = _gmul(Lam[..., None, :], lam_p)  # (..., 204, 9)
        lam_at = lam_eval[..., 0]
        for k in range(1, RS_T + 1):
            lam_at = lam_at ^ lam_eval[..., k]
        err_mask = lam_at == 0  # (..., 204)

        # Forney: e_i = X_i * Omega(X_i^{-1}) / Lambda'(X_i^{-1})
        om_eval = _gmul(Om[..., None, :], omg_p)
        om_at = om_eval[..., 0]
        for k in range(1, RS_T):
            om_at = om_at ^ om_eval[..., k]
        dcoef = Lam[..., 1::2]  # Lambda_1, Lambda_3, Lambda_5, Lambda_7
        dl_eval = _gmul(dcoef[..., None, :], dlam_p)
        dl_at = dl_eval[..., 0]
        for k in range(1, 4):
            dl_at = dl_at ^ dl_eval[..., k]

        ev = _gmul(xk, _gmul(om_at, _ginv(jnp.where(dl_at == 0, 1, dl_at))))
        ev = jnp.where(err_mask & (dl_at != 0), ev, 0)

        corrected = cw.astype(jnp.int32) ^ ev
        corrected = jnp.where(no_err[..., None], cw.astype(jnp.int32), corrected)

        n_roots = jnp.sum(err_mask.astype(jnp.int32), axis=-1)
        n_corr = jnp.where(no_err, 0, n_roots)
        uncorrectable = (~no_err) & ((n_roots != L) | (L > RS_T))
        return corrected[..., :RS_K].astype(jnp.uint8), n_corr, uncorrectable

    return jax.jit(decode)
