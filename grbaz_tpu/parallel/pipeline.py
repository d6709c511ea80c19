"""Pipeline parallelism: a flowgraph chain split into stages over a
'stage' mesh axis.

The reference's host runtime gets pipeline parallelism for free — every
block's ``work()`` runs on its own thread, with GNU Radio's circular
buffers as the inter-stage queues (SURVEY.md §2.4 row 1). On a TPU mesh
the equivalent is *spatial* pipelining: each device on the 'stage' axis
owns one segment of the chain, microbatches of samples flow left to
right over ICI (``lax.ppermute``), and after the S-1-tick fill latency
every device computes every tick (the GPipe schedule, no bubbles in
steady state for M >> S).

This matters when one chip cannot hold a whole chain — e.g. a channel
FIR bank plus a large correlator bank plus decoder FSM tables — or when
stage state (tap banks, LUTs) is too big to replicate. The schedule is
deterministic, built from ``lax.scan`` + ``ppermute``; no host round
trips between stages.

Contracts:

* every stage is ``fn(state_s, buf) -> (state_s', buf')`` over a common
  fixed-shape f32 buffer (``buf_shape``); stages encode/decode their real
  dtypes into it (complex -> two planes, counts -> a lane). A uniform
  buffer is what makes the inter-stage transfer a single static
  ``ppermute``;
* stage states are carried *replicated* (every device holds a copy of
  every stage's state tuple), but only the owner device's copy evolves;
  after the scan the owner's copy is broadcast back with a masked
  ``psum`` so the returned states are globally consistent;
* microbatches are consecutive time blocks: each stage sees them in
  order, so carried DSP state (filter tails, phase, mu) chains exactly
  as in the serial graph — outputs are bit-identical to running the
  stages back-to-back on one device.

An optional leading 'data' mesh axis runs B independent streams through
the same pipeline (dp x pp): all buffers/states gain a leading batch
dim sharded over 'data', and stage fns are vmapped over it.
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _masked_replicate(tree, owner: jax.Array, axis: str):
    """Broadcast the owner device's copy of ``tree`` along ``axis``.

    Each device holds some copy; only the owner's is current. Returns the
    owner's copy on every device (masked psum — exact, not an average,
    because exactly one device contributes).
    """
    def one(leaf):
        if jnp.iscomplexobj(leaf):
            r = lax.psum(jnp.where(owner, leaf.real, 0), axis)
            i = lax.psum(jnp.where(owner, leaf.imag, 0), axis)
            return lax.complex(r, i).astype(leaf.dtype)
        if leaf.dtype == jnp.bool_:
            return lax.psum(jnp.where(owner, leaf, False).astype(jnp.int32),
                            axis).astype(jnp.bool_)
        return lax.psum(jnp.where(owner, leaf, jnp.zeros((), leaf.dtype)),
                        axis)
    return jax.tree_util.tree_map(one, tree)


class StagePipeline:
    """Run S stage functions as a device pipeline over mesh axis 'stage'.

    Args:
      stage_fns: S callables ``(state, buf[ *buf_shape ]) -> (state', buf')``.
      init_states: S pytrees (numpy leaves) — each stage's initial state.
      buf_shape: common inter-stage buffer shape (float32).
      mesh: mesh containing a 'stage' axis of size S (and optionally a
        'data' axis for batch sharding).
      data_axis: name of the batch mesh axis, or None. When set, ``run``
        takes microbatches ``[B, M, *buf_shape]`` and states with a
        leading ``[B, ...]`` dim; each of the B streams is independent.
    """

    def __init__(self, stage_fns: Sequence[Callable], init_states: Sequence[Any],
                 buf_shape: Tuple[int, ...], mesh: Mesh,
                 stage_axis: str = "stage", data_axis: str | None = None):
        self.stage_fns = list(stage_fns)
        self.S = len(self.stage_fns)
        if mesh.shape[stage_axis] != self.S:
            raise ValueError(
                f"mesh axis '{stage_axis}' has {mesh.shape[stage_axis]} "
                f"devices but {self.S} stages were given")
        self.init_states_np = tuple(init_states)
        self.buf_shape = tuple(buf_shape)
        self.mesh = mesh
        self.stage_axis = stage_axis
        self.data_axis = data_axis
        self._jit_run = None

    # -- state -------------------------------------------------------------
    def init_states(self, batch: int | None = None):
        """Initial state tuple; with ``batch`` adds a leading [B] dim."""
        if batch is None:
            return jax.tree_util.tree_map(np.asarray, self.init_states_np)
        return jax.tree_util.tree_map(
            lambda a: np.broadcast_to(np.asarray(a)[None],
                                      (batch,) + np.asarray(a).shape).copy(),
            self.init_states_np)

    # -- the local (per-device) schedule ------------------------------------
    def _local_schedule(self, states, mb_local):
        """states: stage-state tuple (each leaf maybe [Bl, ...]);
        mb_local: [M, *buf_shape] or [Bl, M, *buf_shape]."""
        S, axis = self.S, self.stage_axis
        batched = self.data_axis is not None
        M = mb_local.shape[1] if batched else mb_local.shape[0]
        s_idx = lax.axis_index(axis)
        fill = S - 1
        perm = [(i, i + 1) for i in range(S - 1)]

        def apply_stage(i, st, buf):
            fn = self.stage_fns[i]
            if batched:
                return jax.vmap(fn)(st, buf)
            return fn(st, buf)

        branches = []
        for i in range(S):
            def br(states, buf, active, _i=i):
                st2, out = apply_stage(_i, states[_i], buf)
                # Bubble ticks (pipeline fill/drain) run the stage on a
                # zero buffer; the state must NOT evolve on those.
                st2 = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(active, a, b), st2, states[_i])
                return tuple(st2 if j == _i else states[j]
                             for j in range(S)), out
            branches.append(br)

        bshape = ((mb_local.shape[0],) if batched else ()) + self.buf_shape

        def tick(carry, t):
            states, cur = carry
            feed = (mb_local[:, jnp.minimum(t, M - 1)] if batched
                    else mb_local[jnp.minimum(t, M - 1)])
            cur = jnp.where(s_idx == 0, feed, cur)
            # device s processes microbatch (t - s); outside [0, M) it is
            # a fill/drain bubble
            item = t - s_idx
            active = (item >= 0) & (item < M)
            states, out = lax.switch(s_idx, branches, states, cur, active)
            # shift right over ICI; device 0 receives zeros (overwritten
            # by the next feed)
            cur = lax.ppermute(out, axis, perm)
            # the per-tick stage output is a stacked scan OUTPUT (written
            # in place into the preallocated ys buffer) — NOT a carried
            # accumulator, which would round-trip the whole [M, ...]
            # buffer every tick. The drain below slices the last stage's
            # ticks [fill, fill+M) out of ys.
            return (states, cur), out

        cur0 = jnp.zeros(bshape, jnp.float32)
        (states, _), ys = lax.scan(
            tick, (states, cur0), jnp.arange(M + fill, dtype=jnp.int32))

        # replicate each stage's state from its owner; the drained output
        # from the last stage's device (its tick-t output is microbatch
        # t-fill)
        states = tuple(
            _masked_replicate(states[i], s_idx == i, axis)
            for i in range(S))
        out_acc = ys[fill: fill + M]
        if batched:
            out_acc = jnp.moveaxis(out_acc, 0, 1)  # [Bl, M, *buf]
        out_acc = _masked_replicate(out_acc, s_idx == S - 1, axis)
        return states, out_acc

    # -- public ------------------------------------------------------------
    def run(self, states, microbatches):
        """states: stage tuple; microbatches [M, *buf_shape] f32 (or
        [B, M, *buf_shape] with a data axis). Returns (states', outputs)
        of the same shape, where outputs[m] = chain(microbatches[m])."""
        if self._jit_run is None:
            da = self.data_axis
            state_specs = jax.tree_util.tree_map(
                lambda _: P(da) if da else P(), self.init_states_np)
            mb_spec = P(da) if da else P()
            sharded = jax.shard_map(
                self._local_schedule, mesh=self.mesh,
                in_specs=(state_specs, mb_spec),
                out_specs=(state_specs, mb_spec),
                check_vma=False)
            self._jit_run = jax.jit(sharded)
        return self._jit_run(states, microbatches)


# ---------------------------------------------------------------------------
# the flagship demo: the WBFM chain as a 4-stage pipeline
# ---------------------------------------------------------------------------

def build_wbfm_pipeline(cfg, mesh: Mesh, stage_axis: str = "stage",
                        data_axis: str | None = None):
    """The WBFM receive chain (models/wbfm.py) split into 4 pipeline
    stages: channelize | FM demod | fractional resample | deemphasis.

    Returns ``(pipeline, encode, decode)`` where ``encode(iq[N]) ->
    buf`` packs an input microbatch and ``decode(buf) -> (audio, count)``
    unpacks the final stage's output. cfg is a models.wbfm.WBFMConfig.
    """
    import math

    from grbaz_tpu.ops import exact
    from grbaz_tpu.ops.demod import FMDeemphasis
    from grbaz_tpu.ops.fir import (FreqXlatingFIRDecimator, low_pass_taps,
                                   fir_decimate_frame,
                                   fir_decimate_tail_block, prepare_taps)
    from grbaz_tpu.ops.mmse import TAPS_TABLE
    from grbaz_tpu.ops.resampler import HIST as RS_HIST
    from grbaz_tpu.ops.resampler import resample_block

    N = cfg.block_size
    decim = cfg.decim
    nq = N // decim
    fs = cfg.sample_rate
    quad_rate = fs / decim
    ratio = quad_rate / cfg.audio_rate
    cap = int(math.ceil(nq / (ratio * 0.5))) + 1
    if cap + 1 > N:
        raise ValueError("block too small for the audio capacity lane")

    taps = low_pass_taps(1.0, fs, cfg.channel_width / 2 + cfg.transition / 2,
                         cfg.transition)
    h_rev_pad = prepare_taps(taps, decim)
    hist = len(h_rev_pad) - 1
    demod_gain = np.float32(quad_rate / (2 * np.pi * cfg.max_deviation))
    lo_inc = exact.freq_to_turns_u32(-cfg.center_freq, fs)
    rs_ip, rs_fr = exact.ratio_to_fixed(ratio)
    deemph = FMDeemphasis(cfg.audio_rate, cfg.deemph_tau)
    de_b0, de_b1 = np.float32(deemph.b[0]), np.float32(deemph.b[1])
    de_a = np.float32(deemph.a)

    # Common buffer: f32 [2, N]. plane0/plane1 = re/im (complex stages)
    # or data/aux (real stages); audio count rides in buf[1, N-1].
    buf_shape = (2, N)

    def stage_channel(state, buf):
        x = lax.complex(buf[0], buf[1])
        lo, phase2 = exact.oscillator(N, state["phase"], jnp.uint32(lo_inc))
        xr = x * lo
        # zero-copy tail/body FIR — no 2x-block frame concat per
        # microbatch (the tail carries TPAD samples, ops/fir.py)
        y = fir_decimate_tail_block(state["tail"], xr,
                                    jnp.asarray(h_rev_pad), decim)
        out = jnp.zeros(buf_shape, jnp.float32)
        out = out.at[0, :nq].set(y.real).at[1, :nq].set(y.imag)
        return dict(tail=xr[-(hist + 1):], phase=phase2), out

    squelch_thr = None
    if cfg.squelch_db is not None:
        squelch_thr = np.float32(10.0 ** (float(cfg.squelch_db) / 10.0))
        squelch_alpha = np.float32(1e-4)

    def stage_demod(state, buf):
        y = lax.complex(buf[0, :nq], buf[1, :nq])
        if squelch_thr is not None:
            # power squelch before the discriminator (serial chain
            # order: channel -> squelch -> demod, models/wbfm.py); same
            # triangular-matmul recurrence as ops.demod.PowerSquelch so
            # pipeline output bit-matches the serial chain
            from grbaz_tpu.ops.iir import onepole_scan
            p = (y.real * y.real + y.imag * y.imag).astype(jnp.float32)
            avg = onepole_scan(p * squelch_alpha, 1.0 - squelch_alpha,
                               state["sq_avg"])
            y = jnp.where(avg >= squelch_thr, y, jnp.zeros((), y.dtype))
            new_sq = avg[-1]
        shifted = jnp.concatenate([state["prev"][None], y[:-1]])
        prod = y * jnp.conj(shifted)
        quad = jnp.arctan2(prod.imag, prod.real).astype(jnp.float32) \
            * demod_gain
        out = jnp.zeros(buf_shape, jnp.float32).at[0, :nq].set(quad)
        st = dict(prev=y[-1])
        if squelch_thr is not None:
            st["sq_avg"] = new_sq
        return st, out

    def stage_resample(state, buf):
        quad = buf[0, :nq]
        frame = jnp.concatenate([state["tail"], quad])
        y, n_out, mu_i, mu_f = resample_block(
            frame, state["mu_int"], state["mu_frac"],
            jnp.int32(rs_ip), jnp.uint32(rs_fr), cap,
            jnp.asarray(TAPS_TABLE))
        out = jnp.zeros(buf_shape, jnp.float32)
        out = out.at[0, :cap].set(y)
        out = out.at[1, N - 1].set(n_out.astype(jnp.float32))
        return dict(tail=frame[-RS_HIST:], mu_int=mu_i, mu_frac=mu_f), out

    def stage_deemph(state, buf):
        xd = buf[0, :cap]
        n_out = buf[1, N - 1].astype(jnp.int32)
        valid = jnp.arange(cap, dtype=jnp.int32) < n_out
        x_sh = jnp.concatenate([state["x_prev"][None], xd[:-1]])
        ff = de_b0 * xd + de_b1 * x_sh
        # same triangular-matmul recurrence as ops.demod.FMDeemphasis
        # (bit-match with the serial chain); causality keeps the valid
        # prefix exact despite the unmasked garbage drive
        from grbaz_tpu.ops.iir import onepole_scan, state_at_count
        yv = onepole_scan(ff, de_a, state["y_prev"])
        st = dict(
            y_prev=state_at_count(yv, n_out, state["y_prev"]),
            x_prev=state_at_count(xd, n_out, state["x_prev"]))
        out = jnp.zeros(buf_shape, jnp.float32)
        out = out.at[0, :cap].set(jnp.where(valid, yv, 0.0))
        out = out.at[1, N - 1].set(n_out.astype(jnp.float32))
        return st, out

    demod_state = dict(prev=np.complex64(1.0 + 0.0j))
    if squelch_thr is not None:
        demod_state["sq_avg"] = np.float32(0.0)
    init_states = (
        dict(tail=np.zeros(hist + 1, np.complex64), phase=np.uint32(0)),
        demod_state,
        dict(tail=np.zeros(RS_HIST, np.float32),
             mu_int=np.int32(RS_HIST), mu_frac=np.uint32(0)),
        dict(y_prev=np.float32(0.0), x_prev=np.float32(0.0)),
    )

    pipe = StagePipeline(
        [stage_channel, stage_demod, stage_resample, stage_deemph],
        init_states, buf_shape, mesh, stage_axis=stage_axis,
        data_axis=data_axis)

    def encode(iq: np.ndarray) -> np.ndarray:
        buf = np.zeros(buf_shape, np.float32)
        buf[0] = iq.real
        buf[1] = iq.imag
        return buf

    def decode(buf: np.ndarray):
        n = int(buf[1, N - 1])
        return np.asarray(buf[0, :n]), n

    return pipe, encode, decode
