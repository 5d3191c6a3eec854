"""The complete DVB-T transmit chain as ONE pure jitted function.

Reference: the TX flowgraph of SURVEY.md §3.1 (energy_dispersal →
reed_solomon_enc → convolutional_interleaver → inner_coder →
bit_inner_interleaver → symbol_inner_interleaver → dvbt_map →
reference_signals → IFFT+CP).  Where GNU Radio pipelines 10 blocks across
threads with circular buffers, XLA fuses the same dataflow into one compiled
program over a frame-aligned super-block; all streaming state is an explicit
carried pytree (SURVEY.md §7 design stance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..mode import RS_PACKET, SYMBOLS_PER_FRAME, DvbtMode
from ..ops import (
    bit_interleaver,
    energy,
    inner_coder,
    mapper,
    ofdm,
    outer_interleaver,
    reed_solomon,
    reference_signals,
    symbol_interleaver,
)
from ..utils import bits as bitutils


def init_tx_state(mode: DvbtMode) -> dict:
    """Carried TX state pytree (SURVEY.md §5.4)."""
    return {
        "dispersal_phase": jnp.int32(0),
        "outer_tail": outer_interleaver.init_state(),
        "coder_state": inner_coder.init_state(),
        "frame_idx": jnp.int32(0),
    }


def make_transmitter(mode: DvbtMode, n_frames: int | None = None):
    """Returns (tx, n_packets, n_samples).

    tx(state, packets): uint8 (n_packets, 188) MPEG-TS -> (state',
    iq complex64 (n_samples,)).  ``n_frames`` must be a multiple of
    mode.frames_per_block so the block carries an integer packet count.
    """
    if n_frames is None:
        n_frames = mode.frames_per_block
    assert n_frames % mode.frames_per_block == 0
    n_packets = mode.packets_per_block * (n_frames // mode.frames_per_block)
    n_bytes = n_packets * RS_PACKET
    n_info_bits = n_bytes * 8
    n_sym = n_frames * SYMBOLS_PER_FRAME

    disperse = energy.make_energy_dispersal(n_packets)
    rs_enc = reed_solomon.make_rs_encoder()
    out_ilv = outer_interleaver.make_outer_interleaver(n_bytes)
    coder = inner_coder.make_inner_coder(n_info_bits, mode.code_rate)
    bit_ilv = bit_interleaver.make_bit_interleaver(mode)
    qmap = mapper.make_mapper(mode)
    builder = reference_signals.make_frame_builder(mode)  # sym_ilv + T8 fused
    modulator = ofdm.make_ofdm_modulator(mode)
    n_samples = n_sym * mode.symbol_len

    def tx(state: dict, packets: jnp.ndarray):
        phase, randomized = disperse(state["dispersal_phase"], packets)
        coded204 = rs_enc(randomized)
        tail, interleaved = out_ilv(state["outer_tail"],
                                    coded204.reshape(-1))
        bits = bitutils.bytes_to_bits(interleaved)
        cstate, coded_bits = coder(state["coder_state"], bits)
        per_sym = coded_bits.reshape(n_frames, SYMBOLS_PER_FRAME,
                                     mode.n_payload * mode.v)
        cells = bit_ilv(per_sym)                      # (F, 68, C)
        points = qmap(cells)                          # (F, 68, C) complex
        fidx = state["frame_idx"] + jnp.arange(n_frames, dtype=jnp.int32)
        carriers = jax.vmap(builder)(fidx, points)    # (F, 68, K)
        iq = modulator(carriers).reshape(-1)
        new_state = {
            "dispersal_phase": phase,
            "outer_tail": tail,
            "coder_state": cstate,
            "frame_idx": (state["frame_idx"] + n_frames) % 4,
        }
        return new_state, iq

    return jax.jit(tx), n_packets, n_samples
