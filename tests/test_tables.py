"""Unit fixtures for every EN 300 744 table (SURVEY.md §4 implication 1)."""

import numpy as np
import pytest

from dvbt_tpu import tables
from dvbt_tpu.mode import DvbtMode, MODE_2K_QPSK, MODE_8K_UK


# --- energy dispersal PRBS -------------------------------------------------

def test_dispersal_prbs_first_byte_is_0x03():
    # EN300744 §4.3.1: the PRBS output sequence begins 0000 0011 ...
    bits = tables.dispersal_prbs_bits(16)
    assert np.packbits(bits)[0] == 0x03


def test_dispersal_prbs_period():
    # maximal-length 15-bit LFSR -> period 2^15 - 1
    bits = tables.dispersal_prbs_bits(2 * (2**15 - 1))
    assert np.array_equal(bits[: 2**15 - 1], bits[2**15 - 1 :])


def test_dispersal_pattern_shape_and_syncs():
    pat = tables.dispersal_pattern()
    assert pat.shape == (8, 188)
    assert pat[0, 0] == 0xFF            # 0x47 ^ 0xFF == 0xB8 inversion
    assert (pat[1:, 0] == 0).all()      # other sync bytes untouched
    assert pat[0, 1] == 0x03            # PRBS starts after inverted sync


# --- Reed-Solomon ----------------------------------------------------------

def test_gf_tables_consistency():
    exp, log = tables.gf_tables()
    for v in range(1, 256):
        assert exp[log[v]] == v
    assert tables.gf_mul(0x53, 1) == 0x53
    assert tables.gf_mul(2, 2) == 4
    # alpha^255 == 1
    assert exp[255] == 1


def test_rs_generator_poly():
    g = tables.rs_generator_poly()
    assert len(g) == 17 and g[0] == 1
    # every alpha^i (i<16) is a root of g
    exp, _ = tables.gf_tables()
    for i in range(16):
        root = exp[i]
        acc = 0
        for c in g:
            acc = int(tables.gf_mul(acc, root)) ^ int(c)
        assert acc == 0, i


def test_rs_encode_bitmatrix_matches_reference_encoder():
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 256, size=(4, 188), dtype=np.uint8)
    ref = tables.rs_encode_ref(msg)
    M = tables.rs_encode_bitmatrix()
    msg_bits = np.unpackbits(msg, axis=-1)
    parity_bits = (msg_bits.astype(np.int64) @ M.astype(np.int64)) % 2
    parity = np.packbits(parity_bits.astype(np.uint8), axis=-1)
    assert np.array_equal(parity, ref[:, 188:])


def test_rs_syndromes_of_codeword_are_zero():
    rng = np.random.default_rng(1)
    msg = rng.integers(0, 256, size=(2, 188), dtype=np.uint8)
    cw = tables.rs_encode_ref(msg)
    S = tables.rs_syndrome_bitmatrix()
    cw_bits = np.unpackbits(cw, axis=-1)
    syn = (cw_bits.astype(np.int64) @ S.astype(np.int64)) % 2
    assert not syn.any()
    # corrupt one byte -> nonzero syndrome
    cw[0, 77] ^= 0x5A
    syn = (np.unpackbits(cw, axis=-1).astype(np.int64) @ S.astype(np.int64)) % 2
    assert syn[0].any() and not syn[1].any()


# --- inner code / puncturing ----------------------------------------------

def test_puncture_patterns():
    # EN300744 Table 3 transmitted sequences
    assert tables.puncture_serial_order("1/2").tolist() == [0, 1]
    assert tables.puncture_serial_order("2/3").tolist() == [0, 1, 3]
    assert tables.puncture_serial_order("3/4").tolist() == [0, 1, 3, 4]
    assert tables.puncture_serial_order("5/6").tolist() == [0, 1, 3, 4, 7, 8]
    assert tables.puncture_serial_order("7/8").tolist() == [0, 1, 3, 5, 7, 8, 11, 12]


def test_viterbi_tables_consistency():
    t = tables.viterbi_tables()
    # predecessor/next-state tables must be mutually consistent
    for s in range(64):
        for b in range(2):
            ns = t["next_state"][s, b]
            assert s in t["pred"][ns]
            assert t["pred_bit"][ns] == b
    # known encoder impulse response: input 1,0,0,0,0,0,0 from zero state
    s, xs, ys = 0, [], []
    for bit in [1, 0, 0, 0, 0, 0, 0]:
        xs.append(int(t["out_x"][s, bit]))
        ys.append(int(t["out_y"][s, bit]))
        s = int(t["next_state"][s, bit])
    # G1=171o=1111001b, G2=133o=1011011b (MSB = current bit)
    assert xs == [1, 1, 1, 1, 0, 0, 1]
    assert ys == [1, 0, 1, 1, 0, 1, 1]


# --- bit interleaver -------------------------------------------------------

@pytest.mark.parametrize("v", [2, 4, 6])
def test_bit_interleaver_is_permutation(v):
    idx = tables.bit_interleaver_indices(v)
    assert idx.shape == (126, v)
    flat = idx.flatten()
    assert sorted(flat.tolist()) == list(range(126 * v))


def test_bit_interleaver_he_offsets():
    # e=0 substream is uninterleaved: output cell w, bit 0 reads slot w
    idx = tables.bit_interleaver_indices(2)
    assert idx[5, 0] == 5 * 2 + 0
    # e=1 offset 63: output w reads slot (w+63)%126
    assert idx[5, 1] == ((5 + 63) % 126) * 2 + 1


# --- symbol interleaver ----------------------------------------------------

@pytest.mark.parametrize("mode,n", [("2k", 1512), ("8k", 6048)])
def test_symbol_interleaver_is_permutation(mode, n):
    h = tables.symbol_interleaver_perm(mode)
    assert h.shape == (n,)
    assert sorted(h.tolist()) == list(range(n))


def test_symbol_interleaver_2k_first_values():
    # derived by hand from EN300744 §4.3.4.2 (R'2=1, bit-perm 0->4):
    # i=0 -> 0 ; i=1 -> 1024 ; i=2 -> 16 ; i=3 -> 1025
    h = tables.symbol_interleaver_perm("2k")
    assert h[0] == 0 and h[1] == 1024 and h[2] == 16 and h[3] == 1025


# --- constellations --------------------------------------------------------

@pytest.mark.parametrize("v,alpha", [(2, 1), (4, 1), (4, 2), (4, 4),
                                     (6, 1), (6, 2), (6, 4)])
def test_constellation_unit_power(v, alpha):
    c = tables.constellation(v, alpha)
    assert len(c) == 1 << v
    assert np.mean(np.abs(c) ** 2) == pytest.approx(1.0)
    assert len(np.unique(c)) == 1 << v


def test_constellation_qpsk_quadrants():
    c = tables.constellation(2)  # y0 -> I sign, y1 -> Q sign (0 = positive)
    s = 1 / np.sqrt(2)
    assert c[0b00] == pytest.approx(s + 1j * s)
    assert c[0b01] == pytest.approx(s - 1j * s)
    assert c[0b10] == pytest.approx(-s + 1j * s)
    assert c[0b11] == pytest.approx(-s - 1j * s)


def test_constellation_16qam_gray_axis():
    c = tables.constellation(4, 1, normalized=False)
    # EN300744 Fig 9a: I from (y0,y2), Q from (y1,y3);
    # axis map (sign,inner): 00->3, 01->1, 11->-1, 10->-3
    assert c[0b0000] == 3 + 3j       # outermost corner of ++ quadrant
    assert c[0b1111] == -1 - 1j      # innermost corner of -- quadrant
    assert c[0b1100] == -3 - 3j
    assert c[0b0001] == 3 + 1j
    assert c[0b0010] == 1 + 3j       # y2=1 halves |I|
    assert c[0b0100] == 3 - 3j       # y1=1 flips Q sign
    assert c[0b1010] == -1 + 3j


# --- pilots / TPS ----------------------------------------------------------

def test_continual_pilot_counts():
    assert len(tables.continual_pilots("2k")) == 45
    assert len(tables.continual_pilots("8k")) == 177
    assert tables.continual_pilots("8k")[-1] == 6816


def test_tps_carrier_counts():
    assert len(tables.tps_carriers("2k")) == 17
    assert len(tables.tps_carriers("8k")) == 68


def test_wk_sequence():
    w = tables.wk_sequence(32)
    assert (w[:11] == 1).all()      # all-ones init shifts straight out
    assert w[11] == 0               # first feedback bit


def test_scattered_pilots():
    sp = tables.scattered_pilot_carriers(0, 1704)
    assert sp[0] == 0 and sp[-1] == 1704 and len(sp) == 143
    sp1 = tables.scattered_pilot_carriers(1, 1704)
    assert sp1[0] == 3 and (np.diff(sp1) == 12).all()


def test_payload_cell_count_consistency():
    # data cells per symbol must be exactly n_payload for every l mod 4
    for mode, kmax, npay in [("2k", 1704, 1512), ("8k", 6816, 6048)]:
        cp = set(tables.continual_pilots(mode).tolist())
        tp = set(tables.tps_carriers(mode).tolist())
        for l in range(4):
            sp = set(tables.scattered_pilot_carriers(l, kmax).tolist())
            data = (kmax + 1) - len(sp | cp | tp)
            assert data == npay, (mode, l, data)


def test_tps_frame_bits():
    s = tables.tps_frame_bits(0, 6, 0, "2/3", "2/3", "1/32", "8k")
    assert s.shape == (68,)
    assert s[1:17].tolist() == list(tables.TPS_SYNC)
    s1 = tables.tps_frame_bits(1, 6, 0, "2/3", "2/3", "1/32", "8k")
    assert s1[1:17].tolist() == [1 - b for b in tables.TPS_SYNC]
    assert s[23] == 0 and s[24] == 0 and s1[24] == 1
    # constellation 64QAM -> 10 ; mode 8k -> 01
    assert s[25] == 1 and s[26] == 0
    assert s[38] == 0 and s[39] == 1
    # BCH parity must differ between frames (sync inverted)
    assert not np.array_equal(s[54:], s1[54:])


# --- mode ------------------------------------------------------------------

def test_mode_derived_constants():
    m = MODE_8K_UK
    assert m.fft_len == 8192 and m.n_carriers == 6817 and m.n_payload == 6048
    assert m.v == 6 and m.guard_len == 256 and m.symbol_len == 8448
    assert m.frames_per_block == 1 and m.packets_per_block == 1008
    assert m.useful_bitrate == pytest.approx(24.128e6, rel=1e-3)

    m2 = MODE_2K_QPSK
    assert m2.fft_len == 2048 and m2.n_payload == 1512
    assert m2.frames_per_block == 1 and m2.packets_per_block == 63


def test_mode_block_alignment_all_rates():
    for tx in ("2k", "8k"):
        for con in ("qpsk", "16qam", "64qam"):
            for r in ("1/2", "2/3", "3/4", "5/6", "7/8"):
                m = DvbtMode(tx, con, r)
                assert m.packets_per_block > 0  # asserts integrality inside
