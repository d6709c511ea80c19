"""Benchmark: WBFM receive chain throughput per chip (BASELINE config 2).

Device-resident methodology: the input block lives on device, the whole
chain (channelize -> FM demod -> resample -> deemphasis) is one jitted
program, and `reps` consecutive blocks run per launch via lax.scan with
the carried stream state threaded through (the production streaming
shape). Each timed trial ends with a forced f32 scalar fetch that
depends on the final state — through this environment's remote relay,
block_until_ready alone can ack before device completion, so only a
value fetch is a trustworthy fence. Host<->device traffic is excluded
from the steady-state measurement (the remote PJRT tunnel adds ~25 ms
RTT per transfer, an attachment artifact, not framework throughput;
production ingest is the double-buffered host pipeline).

Prints one JSON line:
  {"metric": "wbfm_chain_throughput", "value": <Msamp/s/chip>,
   "unit": "Msamp/s", "vs_baseline": value/100}
(baseline: the 100 Msamp/s/chip north-star in BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def supervise():
    """Run the measurement in a child process with timeout + retries.

    The remote TPU attachment occasionally wedges at backend init
    (observed: >25 min hangs that a fresh process after a cooldown
    clears). The child does the real work; the parent enforces a
    deadline and retries, forwarding the child's JSON line.
    """
    attempts = int(os.environ.get("GRBAZ_BENCH_ATTEMPTS", "3"))
    timeout = float(os.environ.get("GRBAZ_BENCH_TIMEOUT", "540"))
    env = dict(os.environ, GRBAZ_BENCH_CHILD="1")
    for attempt in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-u", os.path.abspath(__file__)],
                               env=env, timeout=timeout,
                               stdout=subprocess.PIPE)
            out = r.stdout.decode(errors="replace").strip().splitlines()
            line = next((l for l in reversed(out) if l.startswith("{")), None)
            if r.returncode == 0 and line:
                print(line, flush=True)
                return 0
            log(f"bench: child attempt {attempt + 1} failed "
                f"(rc={r.returncode})")
        except subprocess.TimeoutExpired:
            log(f"bench: child attempt {attempt + 1} timed out after "
                f"{timeout:.0f}s (wedged attachment?)")
        if attempt + 1 < attempts:
            time.sleep(60)  # tunnel cooldown before a fresh process
    log("bench: all attempts failed")
    return 1


def main():
    # Persistent compilation cache: first run through the remote tunnel
    # compiles in O(minutes); later runs (the driver's scoring run) hit
    # the cache and start in seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)

    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from grbaz_tpu.models.wbfm import WBFMConfig, build_wbfm
    from grbaz_tpu.core.stream import Stream, StreamMeta

    block = 1 << 20
    # cascade audio chain: anti-alias decimate-by-8 + 25/24 fractional
    # residual — better filtering than the single 8-tap MMSE stage AND
    # ~5x less resampler work (see WBFMConfig.audio_chain)
    cfg = WBFMConfig(block_size=block, audio_chain="cascade")
    fg, _ = build_wbfm(cfg)
    step = fg.build_step()

    # Everything (input synthesis included) inside jit: nothing crosses
    # the host boundary except the final scalar checksum.
    def make_ins():
        n = cfg.block_size
        t = jnp.arange(n, dtype=jnp.float32)
        x = jnp.exp(1j * (2 * jnp.pi * (cfg.center_freq + 10e3)
                          / cfg.sample_rate) * t).astype(jnp.complex64)
        meta = StreamMeta.start(cfg.sample_rate)
        return {"iq": Stream(data=x, count=jnp.int32(n), meta=meta)}

    @jax.jit
    def init_all():
        states = jax.tree_util.tree_map(jnp.asarray, fg.init_states())
        return states, make_ins()

    # Honest-through-the-tunnel methodology (r3): the remote relay's
    # block_until_ready can ack BEFORE device completion (measured
    # "16.7 TB/s HBM" / "35 PFLOP/s matmul" artifacts, physically
    # impossible on v5e), and per-launch RTT varies 17 us - 17 ms with
    # relay state. Two fixes: (1) the rep loop runs ON DEVICE via
    # lax.scan over the chain step — one launch covers `reps` blocks
    # (also the production-shaped streaming loop); (2) every trial ends
    # with a forced f32 scalar fetch that depends on the final carried
    # state, which the relay can only satisfy by executing everything.
    reps, trials = 512, 5

    # The AUDIO OUTPUT checksum rides the scan carry and feeds the
    # fence: with a state-only carry, XLA can dead-code-eliminate real
    # work (the channelizer's carried tail is an input slice; scalar
    # IIR states can be sliced through the recurrence) — measured r4:
    # a state-only fence let the channelizer drop from 818 us to 57 us
    # of elided work. Summing every block's audio into the carried
    # scalar forces the full chain.
    def scan_chain(states, params, ins):
        def body(c, _):
            st, acc = c
            st2, outs = step(st, params, ins)
            a = outs["audio"].data
            return (st2, acc + jnp.sum(a.astype(jnp.float32))), ()
        (states, acc), _ = jax.lax.scan(body, (states, jnp.float32(0)),
                                        None, length=reps)
        return states, acc

    jit_scan = jax.jit(scan_chain, donate_argnums=(0,))
    probe = jax.jit(lambda s, acc: (acc
                                    + jnp.sum(jnp.abs(s["resampler"]["tail"]))
                                    ).astype(jnp.float32))

    params = fg.init_params()
    log(f"bench: backend={jax.default_backend()}, compiling init ...")
    states, ins = init_all()
    jax.block_until_ready(states)
    log("bench: init done, compiling device-loop chain ...")
    t0 = time.time()
    states, acc = jit_scan(states, params, ins)
    chk = float(np.asarray(probe(states, acc)))
    assert np.isfinite(chk), "bench produced non-finite state"
    log(f"bench: chain compiled+warm in {time.time() - t0:.1f}s, timing ...")

    # fetch RTT (reported; at reps=512 it is <10% of a trial)
    t0 = time.time()
    _ = float(np.asarray(probe(states, acc)))
    rtt = time.time() - t0

    samples = []
    for _ in range(trials):
        t0 = time.time()
        states, acc = jit_scan(states, params, ins)
        chk = float(np.asarray(probe(states, acc)))
        dt = time.time() - t0
        samples.append(reps * block / dt / 1e6)
    assert np.isfinite(chk), "bench produced non-finite state"
    samples.sort()
    msps = samples[len(samples) // 2]

    print(json.dumps({
        "metric": "wbfm_chain_throughput",
        "value": round(msps, 2),
        "unit": "Msamp/s",
        "vs_baseline": round(msps / 100.0, 4),
        "median_of": trials,
        "min": round(samples[0], 2),
        "max": round(samples[-1], 2),
        "blocks_per_launch": reps,
        "fetch_rtt_ms": round(rtt * 1e3, 1),
        "forced_fetch": True,
    }))


if __name__ == "__main__":
    if os.environ.get("GRBAZ_BENCH_CHILD"):
        main()
    else:
        sys.exit(supervise())
