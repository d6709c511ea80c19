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


def _time_steps(jax, step, states, params, ins, reps=30, trials=3):
    states, outs = step(states, params, ins)
    jax.block_until_ready(states)
    best = 1e9
    for _ in range(trials):
        t0 = time.time()
        s = states
        for _ in range(reps):
            s, outs = step(s, params, ins)
        jax.block_until_ready(s)
        best = min(best, (time.time() - t0) / reps)
        states = s
    return best


def _mk_stream(jnp, x, rate):
    from grbaz_tpu.core.stream import Stream, StreamMeta
    return Stream(data=x, count=jnp.int32(x.shape[0]),
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
    step = jax.jit(fg.build_step(), donate_argnums=(0,))
    params = fg.init_params()

    @jax.jit
    def init():
        states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
        t = jnp.arange(BLOCK, dtype=jnp.float32)
        x = jnp.exp(1j * 0.01 * t).astype(jnp.complex64)
        return states, {"iq": _mk_stream(jnp, x, 250e3)}

    states, ins = init()
    dt = _time_steps(jax, step, states, params, ins)
    return dict(metric="resampler_agc_throughput", value=BLOCK / dt / 1e6,
                unit="Msamp/s")


def bench_wbfm():
    jax = _setup_jax()
    import jax.numpy as jnp
    from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm

    cfg = WBFMConfig(block_size=BLOCK)
    fg, _ = build_wbfm(cfg)
    step = jax.jit(fg.build_step(), donate_argnums=(0,))
    params = fg.init_params()

    @jax.jit
    def init():
        states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
        t = jnp.arange(BLOCK, dtype=jnp.float32)
        x = jnp.exp(1j * (2 * jnp.pi * 10e3 / cfg.sample_rate) * t) \
            .astype(jnp.complex64)
        return states, {"iq": _mk_stream(jnp, x, cfg.sample_rate)}

    states, ins = init()
    dt = _time_steps(jax, step, states, params, ins, reps=50)
    return dict(metric="wbfm_chain_throughput", value=BLOCK / dt / 1e6,
                unit="Msamp/s")


def bench_spectral():
    jax = _setup_jax()
    import jax.numpy as jnp
    from grbaz_tpu.models.spectral import SpectralConfig, build_spectrum

    cfg = SpectralConfig(fft_size=4096, block_size=BLOCK, waterfall=False)
    fg, handles = build_spectrum(cfg)
    step = jax.jit(fg.build_step(), donate_argnums=(0,))
    params = fg.init_params()

    @jax.jit
    def init():
        states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
        t = jnp.arange(BLOCK, dtype=jnp.float32)
        x = (jnp.exp(1j * 0.1 * t) + 0.1).astype(jnp.complex64)
        return states, {"iq": _mk_stream(jnp, x, 250e3)}

    states, ins = init()
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

    @jax.jit
    def run(x):
        return music_spectrum(x, jnp.asarray(steering), n_signals=1)

    out = run(snaps)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(50):
            out = run(snaps)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / 50)
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
    step = jax.jit(bank.apply, donate_argnums=(0,))

    @jax.jit
    def init():
        state = jax.tree_util.tree_map(jnp.asarray, bank.init_state())
        t = jnp.arange(block, dtype=jnp.float32)
        x = jnp.exp(1j * 0.001 * t).astype(jnp.complex64)
        return state, Stream(data=x, count=jnp.int32(block),
                             meta=StreamMeta.start(3.2e6))

    state, s = init()
    state, outs = step(state, params, s)
    jax.block_until_ready(state)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(30):
            state, outs = step(state, params, s)
        jax.block_until_ready(state)
        best = min(best, (time.time() - t0) / 30)
    # per-chip decode rate: C channels x block input samples each step
    return dict(metric="bank16_aggregate", value=C * block / best / 1e6,
                unit="Mchansamp/s")


CONFIGS = dict(resampler_agc=bench_resampler_agc, wbfm=bench_wbfm,
               spectral=bench_spectral, music=bench_music, bank=bench_bank)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
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
