"""Benchmark suite: the five BASELINE.json configs, one per process.

``python benchmarks.py <config>`` runs ONE config device-resident and
prints a JSON line (the attachment degrades the second compiled program
in a process — see .claude/skills/verify/SKILL.md). ``python
benchmarks.py all`` supervises one child per config and prints the
collected table.

Configs (BASELINE.json):
  1 resampler_agc — fractional_resampler + agc on a synthetic tone
  2 wbfm          — the RTL-FM chain (same as bench.py's metric)
  3 spectral      — windowed FFT power spectrum + FAC + peak detector
  4 music         — MUSIC covariance + subspace + pseudospectrum scan
  5 bank          — 16-channel WBFM decoder bank, single chip

Additional modes:
  roofline — FIR + FFT kernel GFLOP/s vs MXU peak and the HBM-bandwidth
             bound (the BASELINE "speed-of-light measured vs roofline"
             row); run on the real chip.
  scaling  — sharded WBFM bank samples/s at mesh sizes 1/2/4/8 with
             parallel efficiency (CPU virtual devices now, TPU pod when
             available): ``python benchmarks.py scaling``.
  ingest   — sustained host path: BorIP UDP wire -> native receiver ->
             StreamPump -> compiled chain, measured Msamp/s.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BLOCK = 1 << 20


def _setup_jax():
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


def _state_probe(jax, jnp, states):
    """f32 scalar depending on every state leaf — the forcing fence."""
    acc = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(states):
        acc = acc + jnp.sum(jnp.abs(leaf).astype(jnp.float32))
    return acc


def _fetch_rtt(probe, states, n=3):
    """Median RTT of the forcing fence itself (the probe fetch on an
    already-complete state) — subtracted from each trial so the ~25 ms
    relay round-trip does not inflate fast kernels (advisor r3)."""
    rtts = []
    for _ in range(n):
        t0 = time.time()
        _ = float(np.asarray(probe(states)))
        rtts.append(time.time() - t0)
    return sorted(rtts)[len(rtts) // 2]


def _time_steps(jax, step, states, params, ins, reps=256, trials=3):
    """Honest through-the-relay timing (r3 methodology).

    The remote relay's block_until_ready can ack before device
    completion, so (1) `reps` chained steps run ON DEVICE in one
    lax.scan launch (state threads through, so nothing can be elided or
    reordered), and (2) each trial ends with an f32 scalar fetch that
    depends on the final state — a real fence. The fence's own RTT is
    measured and subtracted. `step` must be the UNjitted
    (states, params, ins) -> (states, outs) function.
    """
    import jax.numpy as jnp

    def _outs_sum(outs):
        # every output's full data feeds the carried checksum — with a
        # state-only carry XLA dead-code-eliminates real work (measured
        # r4: the channelizer dropped to 7% of its true time)
        acc = jnp.float32(0)
        for o in jax.tree_util.tree_leaves(outs):
            if hasattr(o, "dtype"):
                if jnp.iscomplexobj(o):
                    acc = acc + jnp.sum(o.real) + jnp.sum(o.imag)
                else:
                    acc = acc + jnp.sum(o.astype(jnp.float32))
        return acc

    import dataclasses as _dc

    def _poison(a, z):
        # a + 0*z: bit-identical but formally iteration-dependent, so
        # XLA can neither hoist input-dependent work out of the loop
        # (LICM) nor fold it away (float NaN semantics forbid 0*x -> 0)
        if hasattr(a, "dtype") and (jnp.iscomplexobj(a)
                                    or jnp.issubdtype(a.dtype,
                                                      jnp.floating)):
            return a + z.astype(a.dtype)
        return a

    def scan_fn(s):
        def body(c, _):
            st, xd, acc = c
            cur = ins if xd is None else \
                {k: _dc.replace(v, data=xd[k]) for k, v in ins.items()}
            st2, outs = step(st, params, cur)
            osum = _outs_sum(outs)
            xd2 = None if xd is None else \
                {k: _poison(v, osum) for k, v in xd.items()}
            return (st2, xd2, acc + osum), ()
        xd0 = None if ins is None else {k: v.data for k, v in ins.items()}
        out = jax.lax.scan(body, (s, xd0, jnp.float32(0)), None,
                           length=reps)[0]
        return (out[0], out[2])

    js = jax.jit(scan_fn, donate_argnums=(0,))
    probe = jax.jit(lambda sa: sa[1] + _state_probe(jax, jnp, sa[0]))
    sa = js(states)
    _ = float(np.asarray(probe(sa)))
    rtt = _fetch_rtt(probe, sa)
    best = 1e9
    for _ in range(trials):
        t0 = time.time()
        sa = js(sa[0])
        _ = float(np.asarray(probe(sa)))
        best = min(best, (time.time() - t0 - rtt) / reps)
    return best


def _mk_stream(jnp, x, rate):
    """HOST-side Stream: data/count/meta stay numpy so jit embeds them
    as literals. Closing over DEVICE arrays makes tracing read them
    back through the relay (mlir.ir_constant) -> UNIMPLEMENTED."""
    from grbaz_tpu.core.stream import Stream, StreamMeta
    return Stream(data=x, count=np.int32(x.shape[0]),
                  meta=StreamMeta.start(rate))


def bench_resampler_agc():
    jax = _setup_jax()
    import jax.numpy as jnp
    from grbaz_tpu.core.graph import Flowgraph
    from grbaz_tpu.ops.agc import AGC
    from grbaz_tpu.ops.resampler import FractionalResampler

    fg = Flowgraph("cfg1")
    rs = FractionalResampler(BLOCK, 250e3 / 48e3, name="rs")
    agc = AGC(1e-4, 1.0, name="agc")
    fg.input("iq", rs)
    fg.chain(rs, agc)
    fg.output("out", agc)
    step = fg.build_step()
    params = fg.init_params()

    @jax.jit
    def init():
        return jax.tree_util.tree_map(jnp.asarray, fg.init_states())

    t = np.arange(BLOCK, dtype=np.float32)
    x = np.exp(1j * 0.01 * t).astype(np.complex64)
    ins = {"iq": _mk_stream(jnp, x, 250e3)}
    states = init()
    dt = _time_steps(jax, step, states, params, ins)
    return dict(metric="resampler_agc_throughput", value=BLOCK / dt / 1e6,
                unit="Msamp/s")


def bench_wbfm():
    jax = _setup_jax()
    import jax.numpy as jnp
    from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm

    cfg = WBFMConfig(block_size=BLOCK, audio_chain="cascade")
    fg, _ = build_wbfm(cfg)
    step = fg.build_step()
    params = fg.init_params()

    @jax.jit
    def init():
        return jax.tree_util.tree_map(jnp.asarray, fg.init_states())

    t = np.arange(BLOCK, dtype=np.float32)
    x = np.exp(1j * (2 * np.pi * 10e3 / cfg.sample_rate) * t) \
        .astype(np.complex64)
    ins = {"iq": _mk_stream(jnp, x, cfg.sample_rate)}
    states = init()
    dt = _time_steps(jax, step, states, params, ins, reps=256)
    return dict(metric="wbfm_chain_throughput", value=BLOCK / dt / 1e6,
                unit="Msamp/s")


def bench_spectral():
    jax = _setup_jax()
    import jax.numpy as jnp
    from grbaz_tpu.models.spectral import SpectralConfig, build_spectrum

    cfg = SpectralConfig(fft_size=4096, block_size=BLOCK, waterfall=False)
    fg, handles = build_spectrum(cfg)
    step = fg.build_step()
    params = fg.init_params()

    @jax.jit
    def init():
        return jax.tree_util.tree_map(jnp.asarray, fg.init_states())

    t = np.arange(BLOCK, dtype=np.float32)
    x = (np.exp(1j * 0.1 * t) + 0.1).astype(np.complex64)
    ins = {"iq": _mk_stream(jnp, x, 250e3)}
    states = init()
    dt = _time_steps(jax, step, states, params, ins)
    return dict(metric="spectral_throughput", value=BLOCK / dt / 1e6,
                unit="Msamp/s")


def bench_music():
    jax = _setup_jax()
    import jax.numpy as jnp
    from grbaz_tpu.ops.doa import music_spectrum, ula_steering_vectors

    n_ant, navg, n_angles = 8, 512, 360
    steering = np.asarray(ula_steering_vectors(n_ant, n_angles=n_angles))

    @jax.jit
    def init():
        a = jnp.exp(1j * jnp.pi * jnp.arange(n_ant) * 0.5)
        s = jnp.exp(1j * 0.3 * jnp.arange(navg))
        x = a[None, :] * s[:, None]
        n = 0.1 * (jnp.sin(jnp.arange(navg * n_ant) * 12.9898)
                   ).reshape(navg, n_ant).astype(jnp.complex64)
        return (x + n).astype(jnp.complex64)

    snaps = init()

    # honest timing: scans chained through the snapshot carry (adding a
    # spectrum-dependent zero term — 0*s keeps the data dependence under
    # float semantics, so nothing can be hoisted or elided), one launch
    # per trial, f32 fetch as the fence with its RTT subtracted (r3
    # methodology + advisor r3; see _time_steps).
    REPS = 256

    def scan_fn(x):
        def body(c, _):
            spec, _doa = music_spectrum(c, jnp.asarray(steering),
                                        n_signals=1)
            c2 = c + (0.0 * jnp.sum(spec)).astype(c.dtype)
            return c2, ()
        return jax.lax.scan(body, x, None, length=REPS)[0]

    js = jax.jit(scan_fn)
    probe = jax.jit(lambda x: jnp.sum(jnp.abs(x)).astype(jnp.float32))
    snaps = js(snaps)
    _ = float(np.asarray(probe(snaps)))
    rtt = _fetch_rtt(probe, snaps)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        snaps = js(snaps)
        _ = float(np.asarray(probe(snaps)))
        best = min(best, (time.time() - t0 - rtt) / REPS)
    return dict(metric="music_doa_scans", value=1.0 / best, unit="scans/s")


def bench_bank():
    jax = _setup_jax()
    import jax.numpy as jnp
    from grbaz_tpu.core.stream import Stream, StreamMeta
    from grbaz_tpu.parallel.channel_bank import DynamicChannelBank

    C, block = 16, 1 << 17
    bank = DynamicChannelBank(capacity=C, sample_rate=3.2e6, decim=8,
                              channel_width=150e3, transition=75e3)
    params = bank.init_params()
    for i, f in enumerate(np.linspace(-1.2e6, 1.2e6, C)):
        bank.add_channel(params, f)
    @jax.jit
    def init():
        return jax.tree_util.tree_map(jnp.asarray, bank.init_state())

    t = np.arange(block, dtype=np.float32)
    x = np.exp(1j * 0.001 * t).astype(np.complex64)
    s = Stream(data=x, count=np.int32(block),
               meta=StreamMeta.start(3.2e6))
    state = init()
    # honest scan + fence timing with RTT subtraction (r3 methodology +
    # advisor r3, see _time_steps)
    REPS = 128

    def _outs_sum(outs):
        acc = jnp.float32(0)
        for o in jax.tree_util.tree_leaves(outs):
            if hasattr(o, "dtype"):
                if jnp.iscomplexobj(o):
                    acc = acc + jnp.sum(o.real) + jnp.sum(o.imag)
                else:
                    acc = acc + jnp.sum(o.astype(jnp.float32))
        return acc

    def scan_fn(st):
        # output checksum rides the carry (DCE-proof fence, see
        # _time_steps)
        def body(c, _):
            cs, acc = c
            c2, outs = bank.apply(cs, params, s)
            return (c2, acc + _outs_sum(outs)), ()
        return jax.lax.scan(body, (st, jnp.float32(0)), None,
                            length=REPS)[0]

    js = jax.jit(scan_fn, donate_argnums=(0,))
    probe = jax.jit(lambda sa: sa[1] + _state_probe(jax, jnp, sa[0]))
    sa = js(state)
    _ = float(np.asarray(probe(sa)))
    rtt = _fetch_rtt(probe, sa)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        sa = js(sa[0])
        _ = float(np.asarray(probe(sa)))
        best = min(best, (time.time() - t0 - rtt) / REPS)
    # per-chip decode rate: C channels x block input samples each step
    return dict(metric="bank16_aggregate", value=C * block / best / 1e6,
                unit="Mchansamp/s")


def bench_decoders():
    """Throughput of the per-sample lax.scan decoder FSMs.

    SURVEY §7 "Hard parts #1": sequential scans are the known TPU
    throughput risk. This measures each decoder honestly (scan of
    `reps` blocks with the output checksum riding the carry + forced
    fetch) and reports Msamp/s of decoder input — compare against the
    rates these blocks actually face (bit/pulse rates: ACARS 2.4 kbit/s
    air interface, FasTrak ~500 kbit/s, radar pulse video ~Msamp/s).
    """
    jax = _setup_jax()
    import jax.numpy as jnp
    from grbaz_tpu.core.stream import Stream, StreamMeta
    from grbaz_tpu.ops.burst import Gate
    from grbaz_tpu.ops.decode import (ACARSDecoder, DPLLBitSync,
                                      ManchesterDecode)
    from grbaz_tpu.ops.detect import PeakDetector, RadarDetector

    n = 1 << 14
    nb = 1 << 20   # block-parallel detectors: full-IQ-rate block shape
    rng = np.random.default_rng(0)
    bits = (rng.random(n) < 0.5).astype(np.uint8)
    pulses = (np.arange(n) % 16 == 0).astype(np.uint8)
    metrics = np.where(bits > 0, -1.0, 1.0).astype(np.float32)
    power_b = (0.1 + (np.arange(nb) % 100 == 0) * 2.0).astype(np.float32)
    sig_b = (rng.standard_normal(nb) + 1j * rng.standard_normal(nb)
             ).astype(np.complex64)

    # (name, block, inputs, block_size, bench_bank): the per-sample scan
    # FSMs (symbol-rate decoders) keep the 16k block + x64 vmapped-bank
    # row; the r5 block-parallel detectors (full-IQ-rate paths: gate in
    # burst extraction, peak/radar in spectral/pulse video) run
    # single-stream at 1M blocks — their deployment shape.
    cases = [
        ("manchester", ManchesterDecode(), [bits], n, True),
        ("dpll", DPLLBitSync(16.0), [pulses], n, True),
        ("acars", ACARSDecoder(), [metrics], n, True),
        ("peak_detector", PeakDetector(min_diff=0.1, look_ahead=0),
         [power_b], nb, False),
        ("radar_detector", RadarDetector(base_level=0.1, threshold_db=10.0),
         [power_b], nb, False),
        ("gate", Gate(threshold=0.5, trigger_length=32), [sig_b, power_b],
         nb, False),
    ]
    which = os.environ.get("GRBAZ_DECODER", "")
    batch = int(os.environ.get("GRBAZ_DECODER_BATCH", "64"))
    results = []
    for name, blk, inputs, bn, bench_bank in cases:
        if which and name != which:
            continue
        meta = StreamMeta.start(1e6)
        # numpy Streams: device-array closures are a readback trap
        ins = [Stream(a, np.int32(bn), meta) for a in inputs]
        params = blk.init_params()

        def step(states, _params, _ins, blk=blk, ins=ins):
            st, outs = blk.apply(states, _params, *ins)
            return st, {str(i): o for i, o in enumerate(outs)}

        states = jax.tree_util.tree_map(jnp.asarray, blk.init_state())
        dt = _time_steps(jax, step, states, params, None, reps=16)
        results.append(dict(metric=f"decoder_{name}",
                            value=round(bn / dt / 1e6, 3), unit="Msamp/s",
                            us_per_block=round(dt * 1e6, 1), block=bn))

        if not bench_bank:
            continue
        # The TPU-native scaling story for per-sample FSMs: the scan's
        # per-step latency amortizes across a CHANNEL axis — one vmapped
        # scan decodes `batch` independent streams in near-constant
        # time (the multi_channel_decoder deployment shape, SURVEY
        # §2.4). Reported value is aggregate samples/s over the bank.
        def bstep(states, _params, _ins, blk=blk, ins=ins):
            def one(st, *xs):
                st2, outs = blk.apply(st, params, *xs)
                return st2, {str(i): o for i, o in enumerate(outs)}
            bins = [jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, (batch,) + a.shape), s)
                for s in ins]
            return jax.vmap(one)(states, *bins)

        bstates = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(jnp.asarray(a),
                                       (batch,) + np.shape(a)).copy(),
            blk.init_state())
        dtb = _time_steps(jax, bstep, bstates, params, None, reps=16)
        results.append(dict(metric=f"decoder_{name}_x{batch}",
                            value=round(batch * bn / dtb / 1e6, 3),
                            unit="Msamp/s",
                            us_per_block=round(dtb * 1e6, 1), block=bn,
                            channels=batch))
    return results


# v5e single-chip peaks for the roofline report (public spec: 197
# TFLOP/s bf16 MXU peak, 819 GB/s HBM BW; f32-accurate 3-pass matmuls
# run at ~1/3 of the bf16 peak)
PEAK_BF16_GFLOPS = 197_000.0
PEAK_HBM_GBS = 819.0


def _scan_time(jax, jnp, fn, x0, reps=256, trials=3):
    """Honest kernel timing: `reps` applications chained through the
    carry (a spectrum-dependent zero term keeps the data dependence —
    float semantics forbid folding 0*f(x)), one launch per trial, f32
    scalar fetch as the fence with its RTT subtracted (r3 methodology +
    advisor r3)."""
    def scan_fn(x):
        def body(c, _):
            y = fn(c)
            c2 = c + (0.0 * jnp.sum(jnp.real(y))).astype(c.dtype)
            return c2, ()
        return jax.lax.scan(body, x, None, length=reps)[0]

    js = jax.jit(scan_fn)
    probe = jax.jit(lambda x: jnp.sum(jnp.abs(x)).astype(jnp.float32))
    x0 = js(x0)
    _ = float(np.asarray(probe(x0)))
    rtt = _fetch_rtt(probe, x0)
    best = 1e9
    for _ in range(trials):
        t0 = time.time()
        x0 = js(x0)
        _ = float(np.asarray(probe(x0)))
        best = min(best, (time.time() - t0 - rtt) / reps)
    return best


def bench_roofline():
    """Measured GFLOP/s + bound utilization for the two hot kernels.

    Measures the PRODUCTION channelizer path the WBFM chain runs at
    HEAD — on TPU, the x-aligned rotate-then-filter Pallas kernel
    (chan_backend='auto'; the chain's bf16 'default' precision); on
    CPU, the XLA fallback (oscillator + fir_decimate_tail_block) —
    and the spectral path's batched FFT.
    """
    jax = _setup_jax()
    import jax.numpy as jnp
    from grbaz_tpu.ops import exact
    from grbaz_tpu.ops.fir import (fir_decimate_tail_block, low_pass_taps,
                                   prepare_taps)

    results = []
    # -- production channelizer: rotate-then-filter polyphase FIR ---------
    decim = 8
    taps = low_pass_taps(1.0, 3.2e6, 112.5e3, 75e3)
    h = prepare_taps(taps, decim)
    tpad = int(h.shape[0])
    n_new = BLOCK
    lo_inc = np.uint32(123456789)

    @jax.jit
    def mk_x():
        t = jnp.arange(n_new, dtype=jnp.float32)
        return jnp.exp(1j * 0.001 * t).astype(jnp.complex64)

    x0 = mk_x()
    tail0 = np.zeros((tpad,), np.complex64)

    if jax.default_backend() in ("tpu", "axon"):
        # the production channelizer on TPU: the x-aligned Pallas kernel
        from grbaz_tpu.ops.pallas.wbfm_frontend import \
            xlating_fir_block_pallas_xal

        def run(x):
            return xlating_fir_block_pallas_xal(
                x, jnp.asarray(tail0), h, decim, jnp.uint32(0),
                jnp.uint32(lo_inc), precision="default")
    else:
        def run(x):
            lo, _ph = exact.oscillator(n_new, jnp.uint32(0),
                                       jnp.uint32(lo_inc))
            xr = x * lo
            return fir_decimate_tail_block(
                jnp.asarray(tail0), xr, jnp.asarray(h), decim,
                precision=jax.lax.Precision.DEFAULT)

    best = _scan_time(jax, jnp, run, x0, reps=256)
    n_out = n_new // decim
    # useful work: n_out*tpad complex MACs (8 real flops) + the
    # full-rate rotate (6 flops/sample, transcendentals uncounted)
    flops_useful = n_out * tpad * 8 + n_new * 6
    bytes_min = n_new * 8 + n_out * 8  # c64 in, c64 out
    gflops = flops_useful / best / 1e9
    results.append(dict(
        metric="roofline_fir", value=round(gflops, 1), unit="GFLOP/s",
        mxu_pct_bf16_peak=round(100 * gflops / PEAK_BF16_GFLOPS, 2),
        hbm_pct=round(100 * (bytes_min / best / 1e9) / PEAK_HBM_GBS, 1),
        us_per_block=round(best * 1e6, 1)))

    # -- batched FFT (spectral path) --------------------------------------
    B, F = 256, 4096

    @jax.jit
    def mk_x():
        t = jnp.arange(B * F, dtype=jnp.float32).reshape(B, F)
        return jnp.exp(1j * 0.001 * t).astype(jnp.complex64)

    x = mk_x()
    best = _scan_time(jax, jnp, lambda a: jnp.fft.fft(a, axis=1), x, reps=256)
    flops = 5.0 * B * F * np.log2(F)
    bytes_min = B * F * 8 * 2
    results.append(dict(
        metric="roofline_fft", value=round(flops / best / 1e9, 1),
        unit="GFLOP/s",
        hbm_pct=round(100 * (bytes_min / best / 1e9) / PEAK_HBM_GBS, 1),
        us_per_batch=round(best * 1e6, 1)))
    return results


def bench_scaling_one(n_dev: int):
    """Sharded WBFM bank throughput on an n_dev mesh (set
    xla_force_host_platform_device_count before calling)."""
    jax = _setup_jax()
    # the image's sitecustomize force-selects the axon backend; honor
    # the platform the scaling supervisor chose (config wins over env)
    jax.config.update("jax_platforms",
                      os.environ.get("JAX_PLATFORMS", "cpu").split(",")[0])
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from grbaz_tpu.core.stream import Stream, StreamMeta
    from grbaz_tpu.parallel.wbfm_bank import BankConfig, ShardedWBFMBank

    C, block = 8, 1 << 16
    pc = min(n_dev, C)
    pt = n_dev // pc
    mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(pc, pt),
                ("chan", "time"))
    cfg = BankConfig(channels=C, block_size=block)
    bank = ShardedWBFMBank(cfg, mesh)
    params = bank.init_params(np.linspace(-1.2e6, 1.2e6, C))
    state = jax.device_put(bank.init_state(), bank.state_shardings())

    rng = np.random.default_rng(0)
    x = jax.device_put(
        (rng.standard_normal((C, block)) + 1j * rng.standard_normal(
            (C, block))).astype(np.complex64), bank.input_sharding())
    state, outs = bank.step(state, params, x)
    jax.block_until_ready(state)
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        s = state
        for _ in range(10):
            s, outs = bank.step(s, params, x)
        jax.block_until_ready(s)
        best = min(best, (time.time() - t0) / 10)
        state = s
    return dict(metric=f"bank_scaling_{n_dev}dev",
                value=C * block / best / 1e6, unit="Mchansamp/s",
                devices=n_dev)


def bench_scaling():
    """Supervise one child per mesh size; print the efficiency table.

    Metric caveat (important on the default CPU backend): the N
    "devices" of a forced-host-platform mesh SHARE one set of CPU
    cores, so aggregate throughput cannot grow with N — the honest
    scaling proxy there is ``retention`` = aggregate(N) / aggregate(1),
    which measures the overhead the sharding/collective machinery adds
    at N-way partition (1.0 = the mesh schedule is free). Per-device
    ``efficiency`` = value/(base*N) is only meaningful on real chips
    (set GRBAZ_SCALING_PLATFORM to run there).
    """
    results = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ,
                   JAX_PLATFORMS=os.environ.get("GRBAZ_SCALING_PLATFORM",
                                                "cpu"),
                   XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                              + f" --xla_force_host_platform_device_count={n}"
                              ).strip())
        out = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__),
             f"scaling_{n}"], timeout=540, stdout=subprocess.PIPE, env=env)
        line = next((l for l in
                     out.stdout.decode(errors="replace").splitlines()[::-1]
                     if l.startswith("{")), None)
        if line:
            results.append(json.loads(line))
    if results:
        base = results[0]["value"]
        shared = os.environ.get("GRBAZ_SCALING_PLATFORM", "cpu") == "cpu"
        for r in results:
            n = r["devices"]
            r["retention"] = round(r["value"] / base, 3)
            r["efficiency"] = round(r["value"] / (base * n), 3)
            if shared:
                r["note"] = ("shared-core CPU mesh: retention is the "
                             "schedule-overhead proxy; efficiency needs "
                             "real chips")
    return results


def bench_ingest():
    """Sustained host-ingest path: UDP wire -> pump -> compiled chain."""
    jax = _setup_jax()
    import threading
    from grbaz_tpu.core.executor import InputSpec, StreamExecutor
    from grbaz_tpu.core.pump import StreamPump
    from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
    from grbaz_tpu.net.udp import UDPSampleReceiver, UDPSampleSender

    fs = 3.2e6
    # 1M blocks amortize the remote relay's per-step round trip (~130 ms
    # regardless of queue depth — measured: dispatch returns in 1 ms,
    # but queued steps EXECUTE serially through the tunnel, so the
    # pump's inflight pipeline cannot overlap them; on local PCIe it
    # does). 1M @ 130 ms clears the 3.2 Msamp/s RTL real-time bar
    # through the tunnel with margin.
    block = 1 << int(os.environ.get("GRBAZ_INGEST_BLOCK_LOG2", "20"))
    cfg = WBFMConfig(sample_rate=fs, center_freq=0.0, block_size=block)
    fg, _ = build_wbfm(cfg)
    ex = StreamExecutor(fg, {"iq": InputSpec((block,), "complex64", fs)})

    # ring must hold a couple of blocks (default 8192 packets ~ 1.5M
    # samples starves block sizes >= 2M)
    rx = UDPSampleReceiver(port=0, bor=True,
                           ring_packets=max(8192, (block * 8 * 3) // 1472))
    tx = UDPSampleSender("127.0.0.1", rx.port, bor=True)
    rng = np.random.default_rng(0)
    chunk = (0.3 * (rng.standard_normal(1 << 15)
                    + 1j * rng.standard_normal(1 << 15))
             ).astype(np.complex64)

    stop = threading.Event()
    sent = [0]

    def blast():
        while not stop.is_set():
            tx.send_complex(chunk)
            sent[0] += len(chunk)

    consumed = [0]

    def source():
        data, _flags = rx.read_complex(block)
        if len(data) < block:
            return None
        consumed[0] += block
        return {"iq": data[:block].astype(np.complex64)}

    def sink(data, count):
        pass

    pump = StreamPump(ex, source, {"audio": sink})
    pump.start()
    th = threading.Thread(target=blast, daemon=True)
    th.start()
    # warmup: the first chain compile through the remote relay takes
    # minutes — wait until the pump has actually pushed blocks through
    # before opening the measurement window
    deadline = time.time() + float(os.environ.get("GRBAZ_INGEST_WARMUP",
                                                  "900"))
    while time.time() < deadline:
        st = pump.stats() if hasattr(pump, "stats") else {}
        if st.get("blocks_out", 0) >= 3:
            break
        time.sleep(1.0)
    # measure COMPLETED steps (blocks_out), not source pulls — with the
    # pipelined runner the source runs ahead of completion by the
    # pipeline depth, which would bias a consumed-samples count
    st0 = pump.stats()
    t0 = time.time()
    time.sleep(float(os.environ.get("GRBAZ_INGEST_SECONDS", "10")))
    dc = (pump.stats()["blocks_out"] - st0["blocks_out"]) * block
    dt = time.time() - t0
    stop.set()
    pump.stop()
    rx.close()
    tx.close()
    st = pump.stats() if hasattr(pump, "stats") else {}
    # attribute the attachment: one laundered block transfer + step +
    # fetch round trip through the remote PJRT tunnel bounds the
    # host-fed rate at block/rtt — on a local-PCIe TPU host this
    # transfer is tens of microseconds, not tens of milliseconds
    import numpy as _np
    probe = _np.zeros(block, _np.complex64)
    t0 = time.time()
    for _ in range(3):
        ex.step({"iq": probe})
    step_rtt = (time.time() - t0) / 3
    return dict(metric="host_ingest", value=dc / dt / 1e6, unit="Msamp/s",
                pump=st, step_rtt_ms=round(step_rtt * 1e3, 1),
                attachment_ceiling_msps=round(block / step_rtt / 1e6, 2),
                note=("serialized per-step RTT through the remote PJRT "
                      "tunnel sets the quoted ceiling; the pipelined "
                      "pump (inflight dispatches) overlaps transfers "
                      "with compute, so sustained can approach or "
                      "exceed it. On a local-PCIe TPU host the "
                      "transfer is microseconds and the device-"
                      "resident chain rate is the bound that matters"))


CONFIGS = dict(resampler_agc=bench_resampler_agc, wbfm=bench_wbfm,
               spectral=bench_spectral, music=bench_music, bank=bench_bank)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "roofline":
        for r in bench_roofline():
            print(json.dumps(r), flush=True)
        return 0
    if which == "scaling":
        for r in bench_scaling():
            print(json.dumps(r), flush=True)
        return 0
    if which.startswith("scaling_"):
        r = bench_scaling_one(int(which.split("_")[1]))
        r["value"] = round(float(r["value"]), 2)
        print(json.dumps(r), flush=True)
        return 0
    if which == "ingest":
        r = bench_ingest()
        r["value"] = round(float(r["value"]), 2)
        print(json.dumps(r), flush=True)
        return 0
    if which == "decoders":
        for r in bench_decoders():
            print(json.dumps(r), flush=True)
        return 0
    if which != "all":
        r = CONFIGS[which]()
        r["value"] = round(float(r["value"]), 2)
        print(json.dumps(r), flush=True)
        return 0
    results = []
    for name in CONFIGS:
        try:
            out = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__), name],
                timeout=540, stdout=subprocess.PIPE)
            line = next((l for l in
                         out.stdout.decode(errors="replace").splitlines()[::-1]
                         if l.startswith("{")), None)
            results.append(json.loads(line) if line
                           else dict(metric=name, error="no output"))
        except subprocess.TimeoutExpired:
            results.append(dict(metric=name, error="timeout"))
        if name != list(CONFIGS)[-1]:
            time.sleep(20)  # attachment cooldown between processes
    for r in results:
        print(json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
