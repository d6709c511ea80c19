"""Multi-channel WBFM bank, sharded over a (channel x time) device mesh.

This is the TPU-native generalization of the reference's two concurrency
mechanisms (SURVEY.md §2.4):

* ``multi_channel_decoder`` — the same receive chain over N frequencies
  (/root/reference/python/multi_channel_decoder.py:29-126) -> the
  **'chan' mesh axis**: embarrassingly parallel, zero communication.
* windowed/overlapped stream processing with ``set_history()`` -> the
  **'time' mesh axis**: each device holds a contiguous time slice and
  receives the filter-tail *halo* from its left neighbor via
  ``lax.ppermute`` (ICI neighbor exchange), making block boundaries
  bit-consistent with a serial run — the overlap-save discipline of
  BASELINE.md's north star.

Carried state that must be globally consistent (the *last* shard's
filter tail, the LO phase) is reduced with masked ``psum`` so every
shard holds the true value for the next step.

The LO needs no halo at all: phase is an exact affine function of the
global sample index (uint32 modular arithmetic, ``ops.exact``), so each
time shard computes its slice of the oscillator independently — a
communication-free formulation impossible with the reference's
sequential NCO loops.

The fractional resampler is *also* fully time-sharded (the hard part —
SURVEY.md §7 hard part 3): because output positions are affine in the
output index (p_k = mu + k*ratio, exact 32.32 integers), every shard
recomputes the identical global position ramp (cheap, replicated),
selects the outputs whose source index falls in its own time slice,
and gathers their 8-tap windows from its local samples + a 7-sample
left halo. No sequential carry pass between shards; block boundaries
stay bit-identical to the serial chain. Per-shard output counts are
ragged (masked); the host compacts.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from grbaz_tpu.ops import exact
from grbaz_tpu.ops.fir import (fir_decimate_tail_block, low_pass_taps,
                               prepare_taps)
from grbaz_tpu.ops.resampler import HIST as RS_HIST
from grbaz_tpu.ops.resampler import resample_block
from grbaz_tpu.ops.mmse import TAPS_TABLE


@dataclasses.dataclass
class BankConfig:
    channels: int                 # total channels (multiple of chan-mesh size)
    block_size: int               # input samples per channel per step
    sample_rate: float = 3.2e6
    decim: int = 8
    audio_rate: float = 48e3
    max_deviation: float = 75e3
    channel_width: float = 150e3
    transition: float = 75e3

    @property
    def quad_rate(self):
        return self.sample_rate / self.decim

    @property
    def ratio(self):
        return self.quad_rate / self.audio_rate


class ShardedWBFMBank:
    """N-channel WBFM receiver over a ('chan', 'time') mesh.

    One step consumes ``x[C, N]`` complex64 (C channels of N samples)
    and produces ``audio[C, cap] float32`` with per-channel valid counts.
    All front-end compute (LO, channel FIR, FM discriminator) runs fully
    sharded on both axes; the audio resampler runs channel-sharded on
    time-gathered quad-rate data (a reshard, like an ML pipeline's
    activation re-layout between differently-sharded stages).
    """

    def __init__(self, cfg: BankConfig, mesh: Mesh):
        self.cfg = cfg
        self.mesh = mesh
        self.pc = mesh.shape["chan"]
        self.pt = mesh.shape["time"]
        if cfg.channels % self.pc:
            raise ValueError("channels must divide over the chan mesh axis")
        if cfg.block_size % (self.pt * cfg.decim):
            raise ValueError("block_size must divide over time shards * decim")
        taps = low_pass_taps(1.0, cfg.sample_rate,
                             cfg.channel_width / 2 + cfg.transition / 2,
                             cfg.transition)
        self.h_rev_pad = prepare_taps(taps, cfg.decim)
        # the halo carries TPAD samples (one more than the filter
        # history) so each shard's FIR runs the zero-copy tail/body
        # formulation (ops.fir.fir_decimate_tail_block) with no
        # 2x-slice concat per step
        self.hist = len(self.h_rev_pad)
        if cfg.block_size // self.pt <= self.hist:
            raise ValueError("time shards too small for filter history")
        self.demod_gain = np.float32(
            cfg.quad_rate / (2 * np.pi * cfg.max_deviation))
        nq = cfg.block_size // cfg.decim
        self.nq = nq
        self.ntq = nq // self.pt  # quad samples per time shard
        if self.ntq <= RS_HIST:
            raise ValueError("time shards too small for resampler history")
        # global ramp capacity (+1 for the next-mu lookup)
        self.rs_cap_global = int(np.ceil(nq / (cfg.ratio * 0.5))) + 1
        # per-shard output capacity (ragged, masked)
        self.audio_capacity = int(np.ceil(self.ntq / (cfg.ratio * 0.5))) + 2

        self._step = jax.jit(
            functools.partial(self._step_impl),
            donate_argnums=(0,))

    # -- state -------------------------------------------------------------
    def init_state(self):
        C = self.cfg.channels
        return dict(
            lo_phase=np.zeros((C,), np.uint32),
            fir_tail=np.zeros((C, self.hist), np.complex64),
            demod_prev=np.ones((C,), np.complex64),
            rs_tail=np.zeros((C, RS_HIST), np.float32),
            rs_mu_int=np.full((C,), RS_HIST, np.int32),
            rs_mu_frac=np.zeros((C,), np.uint32),
        )

    def init_params(self, center_freqs):
        """center_freqs: [C] station offsets in Hz."""
        cfg = self.cfg
        lo_inc = np.array(
            [exact.freq_to_turns_u32(-f, cfg.sample_rate) for f in center_freqs],
            np.uint32)
        ip, fr = exact.ratio_to_fixed(cfg.ratio)
        return dict(lo_inc=lo_inc, rs_inc_int=np.int32(ip),
                    rs_inc_frac=np.uint32(fr))

    def state_shardings(self):
        m = self.mesh
        return dict(
            lo_phase=NamedSharding(m, P("chan")),
            fir_tail=NamedSharding(m, P("chan", None)),
            demod_prev=NamedSharding(m, P("chan")),
            rs_tail=NamedSharding(m, P("chan", None)),
            rs_mu_int=NamedSharding(m, P("chan")),
            rs_mu_frac=NamedSharding(m, P("chan")),
        )

    # -- the sharded front end (inside shard_map) ---------------------------
    def _front_local(self, lo_phase, fir_tail, demod_prev, rs_tail,
                     rs_mu_int, rs_mu_frac, rs_inc_int, rs_inc_frac,
                     lo_inc, x_local):
        """Per-(chan,time)-shard: LO rotate + channel FIR + FM demod +
        time-sharded audio resampler.

        x_local: [Cl, Nt] complex64. Returns (quad [Cl, Nt/decim],
        audio [Cl, cap_local], counts [Cl, 1], carries...).
        """
        cfg = self.cfg
        pt = self.pt
        Cl, Nt = x_local.shape
        t_idx = lax.axis_index("time")

        # --- exact LO slice: phase = phase0 + (t_idx*Nt + j)*inc ---
        j = lax.broadcasted_iota(jnp.uint32, (Cl, Nt), 1)
        base = lo_phase[:, None] + (jnp.uint32(t_idx) * jnp.uint32(Nt)) * lo_inc[:, None]
        ph = base + j * lo_inc[:, None]
        ang = exact.turns_u32_to_radians(ph)
        lo = lax.complex(jnp.cos(ang), jnp.sin(ang))
        xr = x_local * lo

        # --- halo: left neighbor's last `hist` (= tpad) rotated samples ---
        perm = [(i, (i + 1) % pt) for i in range(pt)]
        from_left = lax.ppermute(xr[:, -self.hist:], "time", perm)
        carry_tail = jnp.where(t_idx == 0, fir_tail, from_left)

        # --- channel FIR + decimate (zero-copy body, vmapped rows) ---
        y = jax.vmap(lambda tl, xi: fir_decimate_tail_block(
            tl, xi, self.h_rev_pad, cfg.decim))(carry_tail, xr)

        # --- FM discriminator with 1-sample halo ---
        prev_from_left = lax.ppermute(y[:, -1], "time", perm)
        prev = jnp.where(t_idx == 0, demod_prev, prev_from_left)
        shifted = jnp.concatenate([prev[:, None], y[:, :-1]], axis=1)
        prod = y * jnp.conj(shifted)
        quad = jnp.arctan2(prod.imag, prod.real).astype(jnp.float32) \
            * self.demod_gain

        # --- fully time-sharded fractional resampler ---
        audio, counts, rs_mu_int2, rs_mu_frac2 = self._resample_local(
            quad, rs_tail, rs_mu_int, rs_mu_frac, rs_inc_int, rs_inc_frac,
            t_idx, perm)

        # --- new carries, made replicated across 'time' via masked psum ---
        is_last = (t_idx == pt - 1).astype(jnp.float32)
        new_fir_tail_r = lax.psum(xr[:, -self.hist:].real * is_last, "time")
        new_fir_tail_i = lax.psum(xr[:, -self.hist:].imag * is_last, "time")
        new_fir_tail = lax.complex(new_fir_tail_r, new_fir_tail_i)
        new_prev_r = lax.psum(y[:, -1].real * is_last, "time")
        new_prev_i = lax.psum(y[:, -1].imag * is_last, "time")
        new_prev = lax.complex(new_prev_r, new_prev_i)
        new_rs_tail = lax.psum(quad[:, -RS_HIST:] * is_last, "time")
        # LO phase advance is identical on every shard (exact, affine)
        new_lo_phase = lo_phase + jnp.uint32(cfg.block_size) * lo_inc
        return (quad, audio, counts[:, None], new_lo_phase, new_fir_tail,
                new_prev, new_rs_tail, rs_mu_int2, rs_mu_frac2)

    def _resample_local(self, quad, rs_tail, mu_int, mu_frac,
                        inc_int, inc_frac, t_idx, perm):
        """Per-(chan,time)-shard affine-partitioned resampler.

        quad: [Cl, Ntq] local quad samples. Every shard computes the
        identical global position ramp (replicated over 'time'), keeps
        the outputs whose source index lands in its slice, and gathers
        windows from (left halo + local samples). Returns
        (audio [Cl, cap_local], counts [Cl], new_mu_int [Cl],
        new_mu_frac [Cl]) — the mu update is replicated-exact.
        """
        from grbaz_tpu.ops import exact
        from grbaz_tpu.ops.mmse import NSTEPS_LOG2, NTAPS
        ntq, nq = self.ntq, self.nq
        cap_g, cap_l = self.rs_cap_global, self.audio_capacity

        halo = lax.ppermute(quad[:, -RS_HIST:], "time", perm)
        left = jnp.where(t_idx == 0, rs_tail, halo)
        local_frame = jnp.concatenate([left, quad], axis=1)  # [Cl, ntq+7]
        base = t_idx * jnp.int32(ntq)
        taps_table = jnp.asarray(TAPS_TABLE)

        def per_channel(frame_c, mu_i, mu_f):
            idx, frac = exact.fixed_positions(cap_g + 1, mu_f, inc_int,
                                              inc_frac)
            idx = idx + mu_i
            valid_g = idx[:cap_g] <= jnp.int32(nq - 1)
            own = valid_g & (idx[:cap_g] >= base) \
                & (idx[:cap_g] < base + ntq)
            bins = exact.frac_to_phase_bin(frac[:cap_g], NSTEPS_LOG2)
            taps = taps_table[bins]
            off = jnp.clip(idx[:cap_g] - base, 0, ntq - 1)
            win = frame_c[off[:, None]
                          + jnp.arange(NTAPS, dtype=jnp.int32)[None, :]]
            yv = jnp.sum(win * taps, axis=1)
            yv = jnp.where(own, yv, 0.0)
            # compact owned outputs to the front of the local buffer
            pos = jnp.cumsum(own.astype(jnp.int32)) - 1
            slot = jnp.where(own, jnp.clip(pos, 0, cap_l - 1), cap_l - 1)
            out = jnp.zeros((cap_l,), yv.dtype).at[slot].add(
                jnp.where(own, yv, 0.0))
            count = jnp.minimum(jnp.sum(own.astype(jnp.int32)), cap_l)
            # replicated-exact mu advance (identical on every shard)
            n_out_g = jnp.sum(valid_g.astype(jnp.int32))
            new_mu_i = idx[n_out_g] - jnp.int32(nq)
            new_mu_f = frac[n_out_g]
            return out, count, new_mu_i, new_mu_f

        return jax.vmap(per_channel)(local_frame, mu_int, mu_frac)

    # -- full step ----------------------------------------------------------
    def _step_impl(self, state, params, x):
        front = jax.shard_map(
            self._front_local,
            mesh=self.mesh,
            in_specs=(P("chan"), P("chan", None), P("chan"),
                      P("chan", None), P("chan"), P("chan"), P(), P(),
                      P("chan"), P("chan", "time")),
            out_specs=(P("chan", "time"), P("chan", "time"),
                       P("chan", "time"), P("chan"), P("chan", None),
                       P("chan"), P("chan", None), P("chan"), P("chan")),
        )
        (quad, audio, counts, lo_phase, fir_tail, demod_prev, rs_tail,
         rs_mu_int, rs_mu_frac) = front(
            state["lo_phase"], state["fir_tail"], state["demod_prev"],
            state["rs_tail"], state["rs_mu_int"], state["rs_mu_frac"],
            params["rs_inc_int"], params["rs_inc_frac"],
            params["lo_inc"], x)
        new_state = dict(
            lo_phase=lo_phase, fir_tail=fir_tail, demod_prev=demod_prev,
            rs_tail=rs_tail, rs_mu_int=rs_mu_int, rs_mu_frac=rs_mu_frac)
        return new_state, (audio, counts)

    def step(self, state, params, x):
        """x: [C, block_size] complex64 ->
        (state', (audio [C, pt*cap_local], counts [C, pt])).

        Per-time-shard outputs are ragged; use :meth:`compact_audio`.
        """
        return self._step(state, params, x)

    def compact_audio(self, audio, counts):
        """Host-side: [C, pt*cap] + [C, pt] -> list of [n_c] arrays."""
        audio = np.asarray(audio).reshape(self.cfg.channels, self.pt,
                                          self.audio_capacity)
        counts = np.asarray(counts).reshape(self.cfg.channels, self.pt)
        return [np.concatenate([audio[c, s, :counts[c, s]]
                                for s in range(self.pt)])
                for c in range(self.cfg.channels)]

    def input_sharding(self):
        return NamedSharding(self.mesh, P("chan", "time"))
