"""Golden-vector interop tests (VERDICT round-1 item 2).

Every loopback test shares tables between TX and RX, so a flipped convention
(demux direction, TPS field layout, sync-word polarity, constellation
labeling) is invisible there.  This module pins the externally-visible
conventions two independent ways:

1. Spec fixtures re-derived IN THIS FILE from the EN 300 744 clause text with
   deliberately different code (list/loop style, own BCH division, own LFSRs)
   and, where published, literal expected values — no constants imported from
   ``dvbt_tpu.tables``.
2. Frozen TX output snapshots (``tests/golden/*.npz``, generated once by
   ``tools/make_golden_snapshots.py`` and committed): the exact cell stream,
   carrier plane and baseband of a fixed seeded TS block per mode.  Any
   convention change — intended or not — fails these until the snapshot is
   regenerated on purpose.
"""

import os

import numpy as np
import pytest

from dvbt_tpu import tables
from dvbt_tpu.mode import DvbtMode, MODE_2K_QPSK, MODE_8K_UK

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


# --- 1. energy-dispersal PRBS [EN300744 §4.3.1, Fig 2] ----------------------

def _prbs_independent(n_bytes: int) -> np.ndarray:
    """Literal Fig-2 shift register: 15 cells, output = D14 xor D15,
    feedback into D1, seed 100101010000000 (D1..D15 left to right)."""
    reg = [1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0]
    out = []
    for _ in range(n_bytes * 8):
        b = reg[13] ^ reg[14]
        out.append(b)
        reg = [b] + reg[:-1]
    return np.packbits(np.array(out, np.uint8))


def test_prbs_matches_independent_lfsr():
    got = np.packbits(tables.dispersal_prbs_bits(64 * 8))
    assert np.array_equal(got, _prbs_independent(64))


def test_prbs_known_first_bytes():
    # 0x03 is the published first byte (EN300744 §4.3.1 note); the next bytes
    # follow from the Fig-2 register by hand.
    assert _prbs_independent(2)[0] == 0x03
    assert np.packbits(tables.dispersal_prbs_bits(8))[0] == 0x03


# --- 2. TPS frame [EN300744 §4.6] -------------------------------------------

_SYNC_EVEN = [0, 0, 1, 1, 0, 1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 0]


def _bch_parity_independent(bits53):
    """Shortened BCH(67,53): divide message*x^14 by
    x^14+x^9+x^8+x^6+x^5+x^4+x^2+x+1 with an explicit coefficient list."""
    g = [1, 0, 0, 0, 0, 1, 1, 0, 1, 1, 1, 0, 1, 1, 1]  # degree 14..0
    r = list(bits53) + [0] * 14
    for i in range(len(bits53)):
        if r[i]:
            for j, c in enumerate(g):
                r[i + j] ^= c
    return r[-14:]


def _tps_independent(frame, constellation, alpha, rate_hp, rate_lp, guard,
                     mode, cell_id=0, cell_id_on=False):
    s = [0] * 68
    sync = _SYNC_EVEN if frame % 2 == 0 else [1 - b for b in _SYNC_EVEN]
    s[1:17] = sync
    s[17:23] = [0, 1, 1, 1, 1, 1] if cell_id_on else [0, 1, 0, 1, 1, 1]
    s[23], s[24] = (frame >> 1) & 1, frame & 1
    s[25:27] = {"qpsk": [0, 0], "16qam": [0, 1], "64qam": [1, 0]}[constellation]
    s[27:30] = {0: [0, 0, 0], 1: [0, 0, 1], 2: [0, 1, 0], 4: [0, 1, 1]}[alpha]
    rate_bits = {"1/2": [0, 0, 0], "2/3": [0, 0, 1], "3/4": [0, 1, 0],
                 "5/6": [0, 1, 1], "7/8": [1, 0, 0]}
    s[30:33] = rate_bits[rate_hp]
    s[33:36] = rate_bits[rate_lp]
    s[36:38] = {"1/4": [1, 1], "1/8": [1, 0], "1/16": [0, 1], "1/32": [0, 0]}[guard]
    s[38:40] = {"2k": [0, 0], "8k": [0, 1]}[mode]
    if cell_id_on:
        for i in range(14):
            s[40 + i] = (cell_id >> (13 - i)) & 1
    s[54:68] = _bch_parity_independent(s[1:54])
    return np.array(s, np.uint8)


@pytest.mark.parametrize("frame", [0, 1, 2, 3])
def test_tps_bits_all_frames_8k_uk(frame):
    m = MODE_8K_UK
    want = _tps_independent(frame, "64qam", 0, "2/3", "2/3", "1/32", "8k")
    assert np.array_equal(m.tps_bits(frame), want)


@pytest.mark.parametrize("con,alpha,rhp,rlp,g,tx", [
    ("qpsk", 0, "1/2", "1/2", "1/32", "2k"),
    ("16qam", 2, "3/4", "1/2", "1/8", "2k"),
    ("64qam", 1, "2/3", "7/8", "1/4", "8k"),
])
def test_tps_bits_modes(con, alpha, rhp, rlp, g, tx):
    m = DvbtMode(tx, con, rhp, g, alpha, rlp)
    want = _tps_independent(1, con, alpha, rhp,
                            rlp if alpha else rhp, g, tx)
    assert np.array_equal(m.tps_bits(1), want)


def test_tps_length_indicator_cell_id():
    # EN300744 §4.6.2.1: 010111 (23 bits) normally, 011111 (31) with cell id
    off = DvbtMode("2k", "qpsk", "1/2", "1/32").tps_bits(0)
    on = DvbtMode("2k", "qpsk", "1/2", "1/32",
                  cell_id=0x1234, cell_id_on=True).tps_bits(0)
    assert off[17:23].tolist() == [0, 1, 0, 1, 1, 1]
    assert on[17:23].tolist() == [0, 1, 1, 1, 1, 1]
    assert off[40:54].tolist() == [0] * 14
    got_id = int("".join(map(str, on[40:54])), 2)
    assert got_id == 0x1234
    want = _tps_independent(0, "qpsk", 0, "1/2", "1/2", "1/32", "2k",
                            cell_id=0x1234, cell_id_on=True)
    assert np.array_equal(on, want)


# --- 3. bit-interleaver demux + He(w) [EN300744 §4.3.4.1] -------------------

# The published demux tables, written input->substream exactly as the spec
# lists them ("x0 maps to b0,0", ...).
_DEMUX_SPEC = {
    (2, False): [0, 1],
    (4, False): [0, 2, 1, 3],
    (6, False): [0, 2, 4, 1, 3, 5],
    (4, True): [0, 1, 2, 3],
    (6, True): [0, 1, 2, 4, 3, 5],
}
_HE = [0, 63, 105, 42, 21, 84]


def _bit_ilv_independent(v, hier):
    """(126, v) source-bit index table rebuilt with explicit loops."""
    demux = _DEMUX_SPEC[(v, hier)]
    idx = np.zeros((126, v), np.int64)
    for w in range(126):
        for e in range(v):
            src_slot = (w + _HE[e]) % 126
            # substream e took the input bit whose group position k has
            # demux[k] == e
            k = demux.index(e)
            idx[w, e] = src_slot * v + k
    return idx


@pytest.mark.parametrize("v,hier", [(2, False), (4, False), (6, False),
                                    (4, True), (6, True)])
def test_bit_interleaver_demux_direction(v, hier):
    got = tables.bit_interleaver_indices(v, hier)
    assert np.array_equal(got, _bit_ilv_independent(v, hier))


def test_demux_64qam_is_spec_direction_not_inverse():
    # regression for the round-2 fix: x1 feeds b2 (NOT b3) in 64-QAM
    idx = tables.bit_interleaver_indices(6, False)
    # output bit e=2 of cell w reads slot (w+105)%126, group position 1 (=x1)
    assert idx[0, 2] == (105 % 126) * 6 + 1


# --- 4. constellation labeling [EN300744 §4.3.5, Fig 9] ---------------------

# Axis level for bit triple (sign, m1, m2): sign bit flips polarity, the
# magnitude bits Gray-map 00,01,11,10 -> 7,5,3,1 (outermost first).
_AXIS64 = {(0, 0, 0): 7, (0, 0, 1): 5, (0, 1, 1): 3, (0, 1, 0): 1,
           (1, 0, 0): -7, (1, 0, 1): -5, (1, 1, 1): -3, (1, 1, 0): -1}
_AXIS16 = {(0, 0): 3, (0, 1): 1, (1, 0): -3, (1, 1): -1}


def test_constellation_64qam_levels():
    c = tables.constellation(6, 1, normalized=False)
    for val in range(64):
        y = [(val >> (5 - i)) & 1 for i in range(6)]
        want = _AXIS64[(y[0], y[2], y[4])] + 1j * _AXIS64[(y[1], y[3], y[5])]
        assert c[val] == want, (val, c[val], want)


def test_constellation_16qam_levels():
    c = tables.constellation(4, 1, normalized=False)
    for val in range(16):
        y = [(val >> (3 - i)) & 1 for i in range(4)]
        want = _AXIS16[(y[0], y[2])] + 1j * _AXIS16[(y[1], y[3])]
        assert c[val] == want


def test_constellation_hierarchical_offsets():
    # alpha shifts every point outward by (alpha-1) per axis [§4.3.5]
    for v, alpha in [(4, 2), (4, 4), (6, 2), (6, 4)]:
        c = tables.constellation(v, alpha, normalized=False)
        c1 = tables.constellation(v, 1, normalized=False)
        d = alpha - 1
        want = (np.real(c1) + np.sign(np.real(c1)) * d) + \
            1j * (np.imag(c1) + np.sign(np.imag(c1)) * d)
        assert np.array_equal(c, want)


def test_normalization_factors():
    # EN300744 Table 7 note: published 1/sqrt(E) constants
    want = {(2, 1): 2, (4, 1): 10, (4, 2): 20, (4, 4): 52,
            (6, 1): 42, (6, 2): 60, (6, 4): 108}
    for (v, a), e in want.items():
        assert tables.NORMALIZATION[(v, a)] == pytest.approx(1 / np.sqrt(e))


# --- 5. pilot PRBS w_k [EN300744 §4.5.2, Fig 11] ----------------------------

def test_wk_independent_recurrence():
    # Fig 11 as realized by fielded implementations (output = register LSB,
    # feedback = bit0 ^ bit2) is equivalent to the pure sequence recurrence
    # w[n] = w[n-11] ^ w[n-9] with eleven leading ones.  Recompute the
    # sequence that way — no register at all — and compare.
    want = [1] * 11
    for n in range(11, 200):
        want.append(want[n - 11] ^ want[n - 9])
    got = tables.wk_sequence(200)
    assert np.array_equal(got, np.array(want, np.uint8))
    # m-sequence sanity: period 2047, balanced (1024 ones per period)
    full = tables.wk_sequence(2 * 2047)
    assert np.array_equal(full[:2047], full[2047:])
    assert int(full[:2047].sum()) == 1024


# --- 6. symbol interleaver H(q) [EN300744 §4.3.4.2] -------------------------

def _hq_independent(mode):
    if mode == "2k":
        nr, mmax, nmax = 11, 2048, 1512
        perm = [4, 3, 9, 6, 2, 8, 1, 5, 7, 0]
        taps = [0, 3]
    else:
        nr, mmax, nmax = 13, 8192, 6048
        perm = [7, 1, 4, 2, 9, 6, 8, 10, 0, 3, 11, 5]
        taps = [0, 1, 4, 6]
    out = []
    reg = [0] * (nr - 1)
    for i in range(mmax):
        if i in (0, 1):
            reg = [0] * (nr - 1)
        elif i == 2:
            reg = [1] + [0] * (nr - 2)
        else:
            fb = 0
            for t in taps:
                fb ^= reg[t]
            reg = reg[1:] + [fb]
        r = 0
        for k in range(nr - 1):
            r |= reg[k] << perm[k]
        hq = (i % 2) * (1 << (nr - 1)) + r
        if hq < nmax:
            out.append(hq)
    return np.array(out, np.int32)


@pytest.mark.parametrize("mode", ["2k", "8k"])
def test_symbol_interleaver_independent(mode):
    assert np.array_equal(tables.symbol_interleaver_perm(mode),
                          _hq_independent(mode))


# --- 7. frozen TX snapshots --------------------------------------------------

_SNAP_MODES = {
    "2k_qpsk_12": MODE_2K_QPSK,
    "8k_64qam_23": MODE_8K_UK,
    "2k_16qam_a2_34": DvbtMode("2k", "16qam", "3/4", "1/8", alpha=2,
                               code_rate_lp="1/2"),
}


def _tx_artifacts(mode):
    """Recompute the snapshot artifacts (see tools/make_golden_snapshots.py)."""
    import jax.numpy as jnp
    from dvbt_tpu.io import ts as tsio
    from dvbt_tpu.models import tx as txm

    tx, n_pk, _ = txm.make_transmitter(mode)
    if mode.hierarchical:
        pk = (jnp.asarray(tsio.make_ts_packets(n_pk[0], seed=7)),
              jnp.asarray(tsio.make_ts_packets(n_pk[1], seed=8)))
    else:
        pk = jnp.asarray(tsio.make_ts_packets(n_pk, seed=7))
    state = txm.init_tx_state(mode)
    state, iq = tx(state, pk)
    _, iq2 = tx(state, pk)  # second block: carried state (outer tail, PRBS)
    iq, iq2 = np.asarray(iq), np.asarray(iq2)
    L = mode.symbol_len
    return {
        "iq_head": iq[: 4 * L],
        "iq2_head": iq2[: 2 * L],
        "power": np.float32(np.mean(np.abs(iq) ** 2)),
    }


@pytest.mark.parametrize("name", sorted(_SNAP_MODES))
def test_frozen_tx_snapshot(name):
    path = os.path.join(GOLDEN_DIR, f"tx_{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"snapshot {path} not generated yet")
    want = np.load(path)
    got = _tx_artifacts(_SNAP_MODES[name])
    for key in ("iq_head", "iq2_head"):
        assert np.allclose(got[key], want[key], atol=2e-5), (name, key)
    assert got["power"] == pytest.approx(float(want["power"]), rel=1e-3)
